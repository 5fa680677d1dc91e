package graft.operators

import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** §2.9 [EXT] Text analysis over `documents` — the operators a large-scale
  * training-data pipeline runs before anything else: token counting, term
  * frequency, language ID, quality scoring, order-sensitive fingerprinting.
  *
  * Scale notes: everything tokenizes via `split` + `explode`/higher-order
  * functions (codegen'd, no UDFs). The explode-heavy queries (`text_tf`) are
  * linear in corpus token count and aggregate with map-side partials; at
  * 100 TB documents would be partitioned by (source, lang) so per-group
  * aggregates stay co-located.
  */
object TextOps {

  private def tokens: Column = split(col("text"), " ")

  /** Training-sequence window geometry shared by `text_chunk` and the
    * `pipeline_curate` composition (and their oracles), and the text_bpe
    * merge-table size — centralized in [[graft.GraftConfig]] so a tuning
    * change moves every dependent plan AND oracle together. */
  private val ChunkLen = graft.GraftConfig.ChunkLen
  private val ChunkStride = graft.GraftConfig.ChunkStride
  private val BpeMerges = graft.GraftConfig.BpeMerges

  /** Count-min hash family (d=2 × w=256) shared by the sketch update, the
    * cell join-back, and the oracle SQL of `text_heavyhitters`: the bucket
    * expressions are generated from these strings everywhere, so the three
    * copies cannot drift apart. */
  private val CmBucketSql =
    Seq("tok_id * 2654435761 % 256", "(tok_id * 40503 + 17) % 256")
  private def cmBucket(h: Int): Column = expr(CmBucketSql(h))

  /** Long-form (doc_id, pos BIGINT 1-based, tok) — positions are needed by
    * the order-sensitive fingerprint; DuckDB mirrors with generate_subscripts. */
  private def tokenized(s: SparkSession, dir: String): DataFrame =
    T.documents(s, dir)
      .select(col("doc_id"), posexplode(tokens).as(Seq("pos0", "tok")))
      .select(col("doc_id"), (col("pos0") + 1L).cast("long").as("pos"), col("tok"))

  val defs: Seq[QDef] = Seq(

    // Corpus statistics per language.
    QDef(
      "text_stats",
      (s, dir) =>
        T.documents(s, dir)
          .withColumn("n_tok", size(tokens).cast("long"))
          .groupBy("lang")
          .agg(
            count(lit(1)).as("n_docs"),
            rnd(avg(col("n_tok")), 4).as("avg_tokens"),
            sum(col("n_chars")).as("total_chars"),
            rnd(avg(length(col("text"))), 4).as("avg_len"))
          .orderBy("lang"),
      Some("""SELECT lang, count(*) AS n_docs,
             |  floor((avg(len(string_split(text, ' ')))) * 1e4 + 0.5) / 1e4 AS avg_tokens,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
             |  floor((avg(length(text))) * 1e4 + 0.5) / 1e4 AS avg_len
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)),

    // Term frequency: top-20 tokens over the corpus.
    QDef(
      "text_tf",
      (s, dir) =>
        T.documents(s, dir)
          .select(explode(tokens).as("tok"))
          .groupBy("tok")
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("tok").asc)
          .limit(20),
      Some("""SELECT tok, count(*) AS cnt
             |FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
             |GROUP BY tok ORDER BY cnt DESC, tok ASC LIMIT 20""".stripMargin)),

    // Token counting: whitespace split vs a BPE-ish regex segmentation
    // ([a-z]+ runs | digit runs | single other chars).
    QDef(
      "text_tokens",
      (s, dir) =>
        T.documents(s, dir)
          .select(
            col("doc_id"),
            size(tokens).cast("long").as("ws_tokens"),
            size(expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).cast("long")
              .as("re_tokens"),
            length(col("text")).cast("long").as("n_char"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS ws_tokens,
             |  len(regexp_extract_all(text, '[a-z]+|[0-9]+')) AS re_tokens,
             |  length(text) AS n_char
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // Language-ID heuristic: stopword-marker ratio over the token stream
    // (n-gram-dictionary language ID reduced to its deterministic core).
    QDef(
      "text_langid",
      (s, dir) =>
        T.documents(s, dir)
          .withColumn("toks", tokens)
          .select(
            col("doc_id"), col("lang"),
            size(col("toks")).cast("long").as("n_tok"),
            size(filter(col("toks"), t => t === "the" || t === "a"))
              .cast("long").as("n_stop"))
          .withColumn("stop_ratio",
            rnd(col("n_stop").cast("double") / col("n_tok"), 6))
          .withColumn("pred_lang",
            when(col("stop_ratio") >= 0.08, "en").otherwise("other"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_tok, n_stop,
             |  floor((CAST(n_stop AS DOUBLE) / n_tok) * 1e6 + 0.5) / 1e6 AS stop_ratio,
             |  CASE WHEN floor((CAST(n_stop AS DOUBLE) / n_tok) * 1e6 + 0.5) / 1e6 >= 0.08
             |       THEN 'en' ELSE 'other' END AS pred_lang
             |FROM (
             |  SELECT doc_id, lang,
             |    len(string_split(text, ' ')) AS n_tok,
             |    len(list_filter(string_split(text, ' '),
             |        t -> t = 'the' OR t = 'a')) AS n_stop
             |  FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Quality scoring: length / mean-token-length / stopword-share features
    // combined into a bounded score.
    QDef(
      "text_quality",
      (s, dir) =>
        T.documents(s, dir)
          .withColumn("toks", tokens)
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .select(
            col("doc_id"),
            col("n_tok"),
            rnd((length(col("text")).cast("double") - (col("n_tok") - 1L)) /
              col("n_tok"), 6).as("mean_tok_len"),
            (col("n_chars") >= 100L).as("long_enough"),
            rnd(least(col("n_tok").cast("double") / 50.0, lit(1.0)) * 0.5 +
              least((length(col("text")).cast("double") - (col("n_tok") - 1L)) /
                (col("n_tok") * 8.0), lit(1.0)) * 0.5, 6).as("quality"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_tok,
             |  floor(((CAST(length(text) AS DOUBLE) - (n_tok - 1)) / n_tok) * 1e6 + 0.5) / 1e6 AS mean_tok_len,
             |  n_chars >= 100 AS long_enough,
             |  round(least(CAST(n_tok AS DOUBLE) / 50.0, 1.0) * 0.5 +
             |        least((CAST(length(text) AS DOUBLE) - (n_tok - 1)) / (n_tok * 8.0), 1.0) * 0.5,
             |        6) AS quality
             |FROM (SELECT *, len(string_split(text, ' ')) AS n_tok FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // TF-IDF scoring: tf(d,t) · ln(N/df(t)), the canonical relevance weight
    // a training-data pipeline uses for keyword extraction / quality
    // filtering. Three partial-agg passes (tf, df, N) and one broadcast join
    // — the document-frequency table is vocabulary-sized (≪ corpus; at a
    // scale where the vocab outgrows broadcast, the same join shuffles on
    // `tok` and nothing else changes). Top-100 rows by rounded score with
    // full-key tiebreak so the LIMIT boundary is deterministic cross-engine.
    QDef(
      "text_tfidf",
      (s, dir) => {
        val tf = tokenized(s, dir)
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val n = T.documents(s, dir).agg(count(lit(1)).as("n_docs"))
        tf.join(broadcast(df), "tok")
          .crossJoin(broadcast(n))
          .select(col("doc_id"), col("tok"), col("tf"),
            rnd(col("tf") *
              log(col("n_docs").cast("double") / col("df")), 6).as("tfidf"))
          .orderBy(col("tfidf").desc, col("doc_id").asc, col("tok").asc)
          .limit(100)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |tf AS (
             |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             |  FROM tok GROUP BY doc_id, tok),
             |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
             |n AS (SELECT count(*) AS n_docs FROM documents)
             |SELECT doc_id, tok, tf,
             |  floor((tf * ln(CAST(n_docs AS DOUBLE) / df)) * 1e6 + 0.5) / 1e6 AS tfidf
             |FROM tf JOIN df USING (tok) CROSS JOIN n
             |ORDER BY tfidf DESC, doc_id ASC, tok ASC LIMIT 100""".stripMargin)),

    // Text normalization — the canonical first pass of a training-data
    // pipeline: lowercase, strip non-alphanumerics, collapse whitespace
    // runs, trim. Emitted as (length, md5) so the oracle compares the full
    // normalized string without shipping it. Narrow per-row work, no shuffle
    // before the final presentation sort. NOTE: DuckDB regexp_replace
    // replaces the FIRST match unless given the 'g' flag; Spark always
    // replaces all — the oracle must say 'g' or the hashes diverge.
    QDef(
      "text_normalize",
      (s, dir) =>
        T.documents(s, dir)
          .withColumn("norm",
            trim(regexp_replace(
              regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " ")))
          .select(
            col("doc_id"),
            length(col("norm")).cast("long").as("norm_len"),
            md5(col("norm")).as("norm_hash"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, length(norm) AS norm_len, md5(norm) AS norm_hash
             |FROM (SELECT doc_id,
             |        trim(regexp_replace(regexp_replace(lower(text),
             |          '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g')) AS norm
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Stopword removal with multiplicity preserved: higher-order `filter`
    // over the token array (codegen'd; `array_except` would wrongly dedupe
    // repeated content words). Output = counts + md5 of the kept stream.
    QDef(
      "text_stopwords",
      (s, dir) =>
        T.documents(s, dir)
          .withColumn("toks", tokens)
          .withColumn("kept",
            filter(col("toks"), t => !t.isin("the", "a", "of", "and", "to", "in")))
          .select(
            col("doc_id"),
            size(col("toks")).cast("long").as("n_tok"),
            size(col("kept")).cast("long").as("n_kept"),
            rnd(size(col("kept")).cast("double") / size(col("toks")), 6)
              .as("kept_ratio"),
            md5(array_join(col("kept"), " ")).as("kept_hash"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(string_split(text, ' ')) AS n_tok,
             |  len(kept) AS n_kept,
             |  floor((CAST(len(kept) AS DOUBLE) / len(string_split(text, ' '))) * 1e6 + 0.5) / 1e6 AS kept_ratio,
             |  md5(array_to_string(kept, ' ')) AS kept_hash
             |FROM (SELECT doc_id, text,
             |        list_filter(string_split(text, ' '),
             |          t -> t NOT IN ('the', 'a', 'of', 'and', 'to', 'in')) AS kept
             |      FROM documents)
             |ORDER BY doc_id""".stripMargin)),

    // Token-distribution entropy per document — a repetitiveness signal
    // (boilerplate and template spam score low). Algebraic form
    // H = ln n − (Σ c·ln c)/n needs only two partial-agg passes on
    // (doc_id, tok) then doc_id: no per-row division before aggregation,
    // map-side combine on both shuffles.
    QDef(
      "text_entropy",
      (s, dir) => {
        val tf = tokenized(s, dir)
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        tf.groupBy("doc_id")
          .agg(
            sum("cnt").as("n"),
            sum(col("cnt") * log(col("cnt"))).as("clogc"),
            count(lit(1)).as("n_distinct"))
          .select(
            col("doc_id"), col("n_distinct"),
            rnd(log(col("n").cast("double")) - col("clogc") / col("n"), 6)
              .as("entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH tf AS (
             |  SELECT doc_id, tok, count(*) AS cnt
             |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |        FROM documents)
             |  GROUP BY doc_id, tok)
             |SELECT doc_id, n_distinct,
             |  floor((ln(CAST(n AS DOUBLE)) - clogc / n) * 1e6 + 0.5) / 1e6 AS entropy
             |FROM (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
             |        sum(cnt * ln(cnt)) AS clogc, count(*) AS n_distinct
             |      FROM tf GROUP BY doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // Top-20 bigrams: one lead-window pass per document (partitioned by
    // doc_id — embarrassingly parallel) then a counted groupBy with
    // map-side partials. Full-key tiebreak keeps the LIMIT boundary
    // deterministic cross-engine.
    QDef(
      "text_bigram",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        tokenized(s, dir)
          .withColumn("nxt", lead(col("tok"), 1).over(w))
          .where(col("nxt").isNotNull)
          .select(concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
          .groupBy("bigram").agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("bigram").asc)
          .limit(20)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(string_split(text, ' ')) AS tok,
             |    generate_subscripts(string_split(text, ' '), 1) AS pos
             |  FROM documents),
             |big AS (
             |  SELECT tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
             |  FROM tok)
             |SELECT bigram, count(*) AS cnt FROM big WHERE bigram IS NOT NULL
             |GROUP BY bigram ORDER BY cnt DESC, bigram ASC LIMIT 20""".stripMargin)),

    // Gopher-style quality gate: composite keep/drop decision from document
    // statistics (token count bounds, mean-token-length bounds, stopword
    // share floor). All thresholds compare EXACT integer-derived doubles
    // (IEEE int/int division is correctly rounded in both engines), so the
    // boolean is engine-stable without rounding tricks.
    QDef(
      "quality_gopher",
      (s, dir) =>
        T.documents(s, dir)
          .withColumn("toks", tokens)
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .withColumn("mtl",
            (length(col("text")).cast("double") - (col("n_tok") - 1L)) / col("n_tok"))
          .withColumn("stop_frac",
            size(filter(col("toks"), t => t.isin("the", "a", "of", "and", "to", "in")))
              .cast("double") / col("n_tok"))
          .select(
            col("doc_id"), col("n_tok"),
            rnd(col("mtl"), 6).as("mean_tok_len"),
            rnd(col("stop_frac"), 6).as("stop_frac"),
            (col("n_tok") >= 20L && col("n_tok") <= 800L &&
              col("mtl") >= 2.0 && col("mtl") <= 10.0 &&
              col("stop_frac") >= 0.01).as("keep"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, n_tok,
             |  floor(mtl * 1e6 + 0.5) / 1e6 AS mean_tok_len,
             |  floor(stop_frac * 1e6 + 0.5) / 1e6 AS stop_frac,
             |  (n_tok >= 20 AND n_tok <= 800 AND mtl >= 2.0 AND mtl <= 10.0
             |    AND stop_frac >= 0.01) AS keep
             |FROM (
             |  SELECT doc_id, n_tok,
             |    (CAST(length(text) AS DOUBLE) - (n_tok - 1)) / n_tok AS mtl,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) / n_tok AS stop_frac
             |  FROM (SELECT *, len(string_split(text, ' ')) AS n_tok FROM documents))
             |ORDER BY doc_id""".stripMargin)),

    // Keyphrase extraction: top-3 tokens per document by TF-IDF — the
    // per-document projection of text_tfidf's corpus-wide scoring (keyword
    // tagging / index-term selection). The rank window re-shuffles only
    // tf-sized rows on doc_id; score order compares RAW tf·ln(N/df) —
    // exact-integer inputs make the double identical cross-engine.
    QDef(
      "text_keyphrase",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(col("score").desc, col("tok").asc)
        val tf = tokenized(s, dir)
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("tok").agg(count(lit(1)).as("df"))
        val n = T.documents(s, dir).agg(count(lit(1)).as("n_docs"))
        tf.join(broadcast(df), "tok")
          .crossJoin(broadcast(n))
          .withColumn("score",
            col("tf") * log(col("n_docs").cast("double") / col("df")))
          .withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 3L)
          .select(col("doc_id"), col("rank"), col("tok"),
            rnd(col("score"), 6).as("tfidf"))
          .orderBy("doc_id", "rank")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |  FROM documents),
             |tf AS (
             |  SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
             |  FROM tok GROUP BY doc_id, tok),
             |df AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |ranked AS (
             |  SELECT doc_id, tok,
             |    tf * ln(CAST(n_docs AS DOUBLE) / df) AS score,
             |    row_number() OVER (PARTITION BY doc_id
             |      ORDER BY tf * ln(CAST(n_docs AS DOUBLE) / df) DESC, tok ASC) AS rank
             |  FROM tf JOIN df USING (tok) CROSS JOIN n)
             |SELECT doc_id, rank, tok,
             |  floor((score) * 1e6 + 0.5) / 1e6 AS tfidf
             |FROM ranked WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin)),

    // Bigram language-model estimation: conditional probability
    // P(w2 | w1) = c(w1 w2) / c(w1 ·) — the count-based n-gram LM a
    // training pipeline estimates for perplexity filtering. Numerator and
    // denominator are both partial-agg counts over the lead-window bigram
    // stream; the denominator (contexts) is vocabulary-sized → broadcast.
    // Top-50 by bigram count with full-key tiebreak. Exact-integer division
    // is engine-identical; rounded for presentation only.
    QDef(
      "text_bigram_lm",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        val bg = tokenized(s, dir)
          .withColumn("nxt", lead(col("tok"), 1).over(w))
          .where(col("nxt").isNotNull)
          .groupBy(col("tok").as("w1"), col("nxt").as("w2"))
          .agg(count(lit(1)).as("c12"))
        val ctx = bg.groupBy("w1").agg(sum("c12").as("c1"))
        bg.join(broadcast(ctx), "w1")
          .select(col("w1"), col("w2"), col("c12"), col("c1"),
            rnd(col("c12").cast("double") / col("c1"), 6).as("p"))
          .orderBy(col("c12").desc, col("w1").asc, col("w2").asc)
          .limit(50)
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(string_split(text, ' ')) AS tok,
             |    generate_subscripts(string_split(text, ' '), 1) AS pos
             |  FROM documents),
             |bg AS (
             |  SELECT tok AS w1,
             |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
             |  FROM tok),
             |c AS (
             |  SELECT w1, w2, count(*) AS c12 FROM bg WHERE w2 IS NOT NULL
             |  GROUP BY w1, w2),
             |ctx AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c GROUP BY w1)
             |SELECT w1, w2, c12, c1,
             |  floor((CAST(c12 AS DOUBLE) / c1) * 1e6 + 0.5) / 1e6 AS p
             |FROM c JOIN ctx USING (w1)
             |ORDER BY c12 DESC, w1 ASC, w2 ASC LIMIT 50""".stripMargin)),

    // Dataset-card rollup: the per-(lang, source) quality report a curation
    // pipeline publishes with a training corpus — doc counts, token volume,
    // quality-gate pass rate, canonical-duplicate rate. One pass computes
    // per-doc stats narrow (no joins); the rollup is a single partial-agg
    // groupBy on the (low-cardinality) report key. The duplicate flag
    // reuses dedup_canonical's set-of-words key via a window count.
    QDef(
      "quality_report",
      (s, dir) => {
        val wc = org.apache.spark.sql.expressions.Window.partitionBy("canon")
        T.documents(s, dir)
          .withColumn("toks", tokens)
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .withColumn("mtl",
            (length(col("text")).cast("double") - (col("n_tok") - 1L)) / col("n_tok"))
          .withColumn("keep",
            col("n_tok") >= 20L && col("n_tok") <= 800L &&
              col("mtl") >= 2.0 && col("mtl") <= 10.0)
          .withColumn("canon",
            md5(array_join(array_sort(array_distinct(col("toks"))), " ")))
          .withColumn("is_dup", (count(lit(1)).over(wc) > 1L).cast("long"))
          .groupBy("lang", "source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(col("n_tok")).as("total_tokens"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"),
            sum(col("is_dup")).as("n_dup"),
            rnd(avg(col("mtl")), 6).as("avg_tok_len"))
          .orderBy("lang", "source")
      },
      Some("""WITH d AS (
             |  SELECT lang, source, text,
             |    len(string_split(text, ' ')) AS n_tok,
             |    (CAST(length(text) AS DOUBLE) - (len(string_split(text, ' ')) - 1))
             |      / len(string_split(text, ' ')) AS mtl,
             |    md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' ')) AS canon
             |  FROM documents),
             |f AS (
             |  SELECT lang, source, n_tok, mtl,
             |    (n_tok >= 20 AND n_tok <= 800 AND mtl >= 2.0 AND mtl <= 10.0) AS keep,
             |    CASE WHEN count(*) OVER (PARTITION BY canon) > 1 THEN 1 ELSE 0 END AS is_dup
             |  FROM d)
             |SELECT lang, source, count(*) AS n_docs,
             |  CAST(sum(n_tok) AS BIGINT) AS total_tokens,
             |  CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
             |  CAST(sum(is_dup) AS BIGINT) AS n_dup,
             |  floor((avg(mtl)) * 1e6 + 0.5) / 1e6 AS avg_tok_len
             |FROM f GROUP BY lang, source ORDER BY lang, source""".stripMargin)),

    // Order-sensitive document fingerprint: token-dictionary ids (dense,
    // deterministic: row_number over sorted distinct tokens) combined with a
    // position-dependent weight 31^(pos % 8) — a rolling-hash analogue in
    // pure integer arithmetic, identical in both engines.
    QDef(
      "text_fingerprint",
      (s, dir) => {
        val tok = tokenized(s, dir)
        val dict = Dedup.dict(tok.select("tok"))
        val pw = Seq(1L, 31L, 961L, 29791L, 923521L, 28629151L, 887503681L, 27512614111L)
        val weight = (col("pos") - 1L) % 8L
        tok.join(broadcast(dict), "tok")
          .withColumn("w",
            when(weight === 0L, pw(0)).when(weight === 1L, pw(1))
              .when(weight === 2L, pw(2)).when(weight === 3L, pw(3))
              .when(weight === 4L, pw(4)).when(weight === 5L, pw(5))
              .when(weight === 6L, pw(6)).otherwise(pw(7)))
          .groupBy("doc_id")
          .agg(sum(col("tok_id") * col("w")).as("fingerprint"),
            count(lit(1)).as("n_tok"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(string_split(text, ' ')) AS tok,
             |    generate_subscripts(string_split(text, ' '), 1) AS pos
             |  FROM documents),
             |dict AS (
             |  SELECT tok, row_number() OVER (ORDER BY tok) AS tok_id
             |  FROM (SELECT DISTINCT tok FROM tok)),
             |weighted AS (
             |  SELECT t.doc_id,
             |    d.tok_id * (CASE (t.pos - 1) % 8
             |      WHEN 0 THEN 1 WHEN 1 THEN 31 WHEN 2 THEN 961 WHEN 3 THEN 29791
             |      WHEN 4 THEN 923521 WHEN 5 THEN 28629151 WHEN 6 THEN 887503681
             |      ELSE 27512614111 END) AS term
             |  FROM tok t JOIN dict d USING (tok))
             |SELECT doc_id, CAST(sum(term) AS BIGINT) AS fingerprint, count(*) AS n_tok
             |FROM weighted GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Gopher-style repetition filter: the complement of quality_gopher's
    // length/stopword gate — drop documents dominated by repeated n-grams.
    // Per doc: fraction of bigram occurrences covered by the single most
    // frequent bigram (top_frac) and fraction that are repeats of an
    // already-seen bigram (dup_frac). One lead-window per doc_id partition
    // (embarrassingly parallel), then two nested per-doc aggregates — every
    // shuffle keys on doc_id, so at 100 TB this is a narrow pipeline after
    // one exchange. Both fractions are int/int divisions (correctly-rounded
    // IEEE in both engines) so the keep boolean is engine-stable unrounded.
    QDef(
      "text_repetition",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        tokenized(s, dir)
          .withColumn("nxt", lead(col("tok"), 1).over(w))
          .where(col("nxt").isNotNull)
          .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
          .groupBy("doc_id", "bigram").agg(count(lit(1)).as("cnt"))
          .groupBy("doc_id")
          .agg(
            sum("cnt").as("n_bigrams"),
            max("cnt").as("mx"),
            count(lit(1)).as("n_distinct"))
          .select(
            col("doc_id"), col("n_bigrams"),
            rnd(col("mx").cast("double") / col("n_bigrams"), 6).as("top_frac"),
            rnd((col("n_bigrams") - col("n_distinct")).cast("double") / col("n_bigrams"), 6)
              .as("dup_frac"),
            (col("mx").cast("double") / col("n_bigrams") <= 0.05 &&
              (col("n_bigrams") - col("n_distinct")).cast("double") / col("n_bigrams") <= 0.5)
              .as("keep"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(string_split(text, ' ')) AS tok,
             |    generate_subscripts(string_split(text, ' '), 1) AS pos
             |  FROM documents),
             |big AS (
             |  SELECT doc_id,
             |    tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
             |  FROM tok),
             |cnts AS (
             |  SELECT doc_id, bigram, count(*) AS cnt FROM big
             |  WHERE bigram IS NOT NULL GROUP BY doc_id, bigram),
             |stats AS (
             |  SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_bigrams,
             |    max(cnt) AS mx, count(*) AS n_distinct
             |  FROM cnts GROUP BY doc_id)
             |SELECT doc_id, n_bigrams,
             |  floor((CAST(mx AS DOUBLE) / n_bigrams) * 1e6 + 0.5) / 1e6 AS top_frac,
             |  floor((CAST(n_bigrams - n_distinct AS DOUBLE) / n_bigrams) * 1e6 + 0.5) / 1e6 AS dup_frac,
             |  (CAST(mx AS DOUBLE) / n_bigrams <= 0.05
             |    AND CAST(n_bigrams - n_distinct AS DOUBLE) / n_bigrams <= 0.5) AS keep
             |FROM stats ORDER BY doc_id""".stripMargin)),

    // Fixed-window chunking with overlap: split each document into 32-token
    // windows on a 24-token stride — the step that turns raw documents into
    // training sequences. Entirely narrow (split + sequence-explode + slice
    // per row, no shuffle until the output sort); at 100 TB chunking is
    // embarrassingly parallel and the chunk count per doc is bounded by
    // doc length / stride, so no skew amplification.
    QDef(
      "text_chunk",
      (s, dir) => {
        val docs = T.documents(s, dir)
          .select(col("doc_id"), split(col("text"), " ").as("toks"))
          .withColumn("n_tok", size(col("toks")).cast("long"))
        docs
          .select(col("doc_id"), col("toks"), col("n_tok"),
            explode(sequence(lit(1L), col("n_tok"), lit(ChunkStride.toLong))).as("start"))
          .select(
            col("doc_id"), col("start"),
            array_join(slice(col("toks"), col("start").cast("int"), lit(ChunkLen)), " ")
              .as("chunk"),
            least(col("n_tok") - col("start") + 1L, lit(ChunkLen.toLong)).as("chunk_tokens"))
          .orderBy("doc_id", "start")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id, string_split(text, ' ') AS toks,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |st AS (
             |  SELECT doc_id, toks, n_tok,
             |    unnest(generate_series(1, n_tok, $ChunkStride)) AS start
             |  FROM t)
             |SELECT doc_id, start,
             |  array_to_string(list_slice(toks, start, least(start + ${ChunkLen - 1}, n_tok)), ' ') AS chunk,
             |  least(n_tok - start + 1, $ChunkLen) AS chunk_tokens
             |FROM st ORDER BY doc_id, start""".stripMargin)),

    // PII masking: the redaction pass a training-data pipeline runs before
    // anything ships. The fixtures' synthetic corpus carries no contact
    // strings, so the query derives deterministic ones from existing columns
    // (doc_id / source / n_chars — inputs only, no synthesis from outside
    // the tables) and then masks emails, IPv4 addresses, and standalone
    // digit runs in that order, counting each class as it is removed.
    // Pure regexp projection: narrow, codegen'd, no shuffle before the
    // output sort; the regexes are RE2-compatible so Spark (Java regex) and
    // DuckDB (RE2) agree on every match.
    QDef(
      "text_pii",
      (s, dir) => {
        val email = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
        val ip = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
        val num = "\\b\\d{3,}\\b"
        T.documents(s, dir)
          .select(col("doc_id"),
            concat_ws(" ", col("text"),
              concat(lit("user"), col("doc_id"), lit("@"), col("source"), lit(".com")),
              concat(lit("10.0."), col("doc_id") % 256, lit("."), col("n_chars") % 256),
              concat(lit("order id "), (col("doc_id") * 7919 + 100017L))).as("raw"))
          .withColumn("n_email", size(regexp_extract_all(col("raw"), lit(email), lit(0))).cast("long"))
          .withColumn("m1", regexp_replace(col("raw"), email, "<EMAIL>"))
          .withColumn("n_ip", size(regexp_extract_all(col("m1"), lit(ip), lit(0))).cast("long"))
          .withColumn("m2", regexp_replace(col("m1"), ip, "<IP>"))
          .withColumn("n_num", size(regexp_extract_all(col("m2"), lit(num), lit(0))).cast("long"))
          .select(col("doc_id"),
            regexp_replace(col("m2"), num, "<NUM>").as("masked"),
            col("n_email"), col("n_ip"), col("n_num"))
          .orderBy("doc_id")
      },
      Some("""WITH raw AS (
             |  SELECT doc_id,
             |    text || ' ' || 'user' || doc_id || '@' || source || '.com'
             |      || ' ' || '10.0.' || (doc_id % 256) || '.' || (n_chars % 256)
             |      || ' ' || 'order id ' || (doc_id * 7919 + 100017) AS raw
             |  FROM documents),
             |m1 AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_email,
             |    regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g') AS m1
             |  FROM raw),
             |m2 AS (
             |  SELECT doc_id, n_email,
             |    CAST(len(regexp_extract_all(m1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ip,
             |    regexp_replace(m1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g') AS m2
             |  FROM m1)
             |SELECT doc_id,
             |  regexp_replace(m2, '\b\d{3,}\b', '<NUM>', 'g') AS masked,
             |  n_email, n_ip,
             |  CAST(len(regexp_extract_all(m2, '\b\d{3,}\b')) AS BIGINT) AS n_num
             |FROM m2 ORDER BY doc_id""".stripMargin)),

    // Count-min sketch heavy hitters: the frequency complement of the HLL
    // sketch in agg_sketch_reagg. Token occurrences update a d=2 × w=256
    // counter grid through two independent arithmetic hashes of the
    // deterministic dictionary id; a token's estimate is the min of its two
    // cells (never an undercount). The sketch is CONSTANT-size state (512
    // cells) regardless of corpus scale and merges by cell-wise addition —
    // the pre-aggregation shape exact per-token counts cannot give at
    // 100 TB. The exact count is joined back only for the top-20 output so
    // the overcount column makes the sketch's error visible.
    QDef(
      "text_heavyhitters",
      (s, dir) => {
        val t = tokenized(s, dir)
        val d = Dedup.dict(t.select("tok"))
        val withId = t.join(broadcast(d), "tok")
        val occ = withId.select(col("tok_id"))
        val cells = occ.select(lit(1).as("j"), cmBucket(0).as("b"))
          .unionAll(occ.select(lit(2).as("j"), cmBucket(1).as("b")))
          .groupBy("j", "b").agg(count(lit(1)).as("cnt"))
        val exact = withId.groupBy("tok", "tok_id").agg(count(lit(1)).as("exact"))
        exact
          .join(broadcast(cells.where(col("j") === 1)
              .select(col("b").as("b1"), col("cnt").as("c1"))),
            cmBucket(0) === col("b1"))
          .join(broadcast(cells.where(col("j") === 2)
              .select(col("b").as("b2"), col("cnt").as("c2"))),
            cmBucket(1) === col("b2"))
          .select(col("tok"), least(col("c1"), col("c2")).as("est"), col("exact"),
            (least(col("c1"), col("c2")) - col("exact")).as("overcount"))
          .orderBy(col("est").desc, col("tok"))
          .limit(20)
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
             |dict AS (
             |  SELECT tok, CAST(row_number() OVER (ORDER BY tok) AS BIGINT) AS tok_id
             |  FROM (SELECT DISTINCT tok FROM tok)),
             |occ AS (SELECT d.tok_id FROM tok t JOIN dict d USING (tok)),
             |cells AS (
             |  SELECT j, b, count(*) AS cnt FROM (
             |    SELECT 1 AS j, ${CmBucketSql(0)} AS b FROM occ
             |    UNION ALL
             |    SELECT 2 AS j, ${CmBucketSql(1)} AS b FROM occ)
             |  GROUP BY j, b),
             |exact AS (
             |  SELECT t.tok, d.tok_id, count(*) AS exact
             |  FROM tok t JOIN dict d USING (tok) GROUP BY t.tok, d.tok_id)
             |SELECT e.tok,
             |  CAST(least(c1.cnt, c2.cnt) AS BIGINT) AS est,
             |  CAST(e.exact AS BIGINT) AS exact,
             |  CAST(least(c1.cnt, c2.cnt) - e.exact AS BIGINT) AS overcount
             |FROM exact e
             |JOIN cells c1 ON c1.j = 1 AND c1.b = ${CmBucketSql(0).replace("tok_id", "e.tok_id")}
             |JOIN cells c2 ON c2.j = 2 AND c2.b = ${CmBucketSql(1).replace("tok_id", "e.tok_id")}
             |ORDER BY est DESC, tok LIMIT 20""".stripMargin)),

    // Per-domain corpus rollup: the web-corpus curation pass (C4/CCNet
    // style) that decides per-SOURCE-DOMAIN inclusion — URL → host extract,
    // then docs/langs/volume per host. The fixtures carry no URLs, so each
    // doc's URL derives deterministically from its own columns; the regexp
    // host extraction + low-cardinality rollup is the operator under test.
    // Narrow until the final tiny per-host aggregate — one shuffle on the
    // domain key (the natural partition key of a crawl corpus at 100 TB).
    QDef(
      "text_domains",
      (s, dir) =>
        T.documents(s, dir)
          .select(col("doc_id"), col("lang"), col("n_chars"),
            concat(lit("https://"), col("source"), lit(".example.com/"),
              col("lang"), lit("/"), col("doc_id")).as("url"))
          .withColumn("host", regexp_extract(col("url"), "^https://([^/]+)/", 1))
          .groupBy("host")
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("lang")).as("n_langs"),
            sum(col("n_chars")).as("total_chars"))
          .orderBy("host"),
      Some("""WITH u AS (
             |  SELECT doc_id, lang, n_chars,
             |    'https://' || source || '.example.com/' || lang || '/' || doc_id AS url
             |  FROM documents)
             |SELECT regexp_extract(url, '^https://([^/]+)/', 1) AS host,
             |  count(*) AS n_docs,
             |  count(DISTINCT lang) AS n_langs,
             |  CAST(sum(n_chars) AS BIGINT) AS total_chars
             |FROM u GROUP BY host ORDER BY host""".stripMargin)),

    // Perplexity filtering (CCNet-style): per-document bigram cross-entropy
    // under the corpus's own count LM — THE classic statistical quality
    // filter (low = fluent/repetitive, high = noise). P(w2|w1) = c12/c1 from
    // the same corpus, so every document bigram has P > 0 and no smoothing
    // branch can diverge cross-engine. Scale: two partial-agg count passes
    // (bigram stream keyed on doc_id from the lead window, then on the
    // token keys), LM tables joined back on (w1, w2)/(w1) — broadcast while
    // the vocab² table fits, shuffled token-key joins beyond that — then a
    // per-doc partial-agg mean of −ln P.
    QDef(
      "text_perplexity",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("pos")
        val big = tokenized(s, dir)
          .withColumn("w2", lead(col("tok"), 1).over(w))
          .where(col("w2").isNotNull)
          .select(col("doc_id"), col("tok").as("w1"), col("w2"))
        val c12 = big.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
        val c1 = big.groupBy("w1").agg(count(lit(1)).as("c1"))
        big.join(broadcast(c12), Seq("w1", "w2"))
          .join(broadcast(c1), Seq("w1"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_bigrams"),
            rnd(avg(-log(col("c12").cast("double") / col("c1"))), 6)
              .as("cross_entropy"))
          .orderBy("doc_id")
      },
      Some("""WITH tok AS (
             |  SELECT doc_id,
             |    unnest(string_split(text, ' ')) AS tok,
             |    generate_subscripts(string_split(text, ' '), 1) AS pos
             |  FROM documents),
             |big AS (
             |  SELECT doc_id, tok AS w1,
             |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
             |  FROM tok QUALIFY w2 IS NOT NULL),
             |c12 AS (SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2),
             |c1 AS (SELECT w1, count(*) AS c1 FROM big GROUP BY w1)
             |SELECT doc_id, count(*) AS n_bigrams,
             |  floor((avg(-ln(CAST(c12 AS DOUBLE) / c1))) * 1e6 + 0.5) / 1e6 AS cross_entropy
             |FROM big JOIN c12 USING (w1, w2) JOIN c1 USING (w1)
             |GROUP BY doc_id ORDER BY doc_id""".stripMargin)),

    // Flagship composition: the full curation pipeline a training-data run
    // chains from this library's pieces — Gopher quality gate
    // (quality_gopher's exact thresholds) → canonical keep-first dedup
    // (dedup_canonical's set-of-words key) → training-sequence chunking
    // (text_chunk's 32/24 windows) → per-language yield report. One QDef so
    // the composition itself is oracle-checked end to end. Scale shape:
    // narrow gate → ONE shuffle on the 16-byte canon hash (row_number
    // keep-first) → narrow chunk fan-out → tiny per-lang rollup; the corpus
    // text never shuffles at all (only hashes and counts move).
    QDef(
      "pipeline_curate",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("canon").orderBy("doc_id")
        T.documents(s, dir)
          .withColumn("toks", tokens)
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .withColumn("mtl",
            (length(col("text")).cast("double") - (col("n_tok") - 1L)) / col("n_tok"))
          .withColumn("stop_frac",
            size(filter(col("toks"), t => t.isin("the", "a", "of", "and", "to", "in")))
              .cast("double") / col("n_tok"))
          .where(col("n_tok") >= 20L && col("n_tok") <= 800L &&
            col("mtl") >= 2.0 && col("mtl") <= 10.0 && col("stop_frac") >= 0.01)
          .withColumn("canon",
            md5(array_join(array_sort(array_distinct(col("toks"))), " ")))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select(col("doc_id"), col("lang"), col("n_tok"),
            explode(sequence(lit(1L), col("n_tok"), lit(ChunkStride.toLong))).as("start"))
          .withColumn("chunk_tokens",
            least(col("n_tok") - col("start") + 1L, lit(ChunkLen.toLong)))
          .groupBy("lang")
          .agg(countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_chunks"),
            sum(col("chunk_tokens")).as("chunk_tokens"))
          .orderBy("lang")
      },
      Some(s"""WITH g AS (
             |  SELECT doc_id, lang, text, n_tok FROM (
             |    SELECT doc_id, lang, text, n_tok,
             |      (CAST(length(text) AS DOUBLE) - (n_tok - 1)) / n_tok AS mtl,
             |      CAST(len(list_filter(string_split(text, ' '),
             |        t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) / n_tok AS stop_frac
             |    FROM (SELECT *, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |          FROM documents))
             |  WHERE n_tok >= 20 AND n_tok <= 800 AND mtl >= 2.0 AND mtl <= 10.0
             |    AND stop_frac >= 0.01),
             |k AS (
             |  SELECT doc_id, lang, n_tok,
             |    row_number() OVER (
             |      PARTITION BY md5(array_to_string(
             |        list_sort(list_distinct(string_split(text, ' '))), ' '))
             |      ORDER BY doc_id) AS rn
             |  FROM g),
             |c AS (
             |  SELECT doc_id, lang, n_tok, unnest(generate_series(1, n_tok, $ChunkStride)) AS start
             |  FROM k WHERE rn = 1)
             |SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_chunks,
             |  CAST(sum(least(n_tok - start + 1, $ChunkLen)) AS BIGINT) AS chunk_tokens
             |FROM c GROUP BY lang ORDER BY lang""".stripMargin)),

    // IN-FLIGHT PIPELINE METRICS via the Observation API (`df.observe`):
    // the production monitoring primitive — pre-gate volume and post-gate
    // yield measured DURING the curation pass itself, accumulator-style,
    // with ZERO extra scans (a separate metrics query would re-read the
    // corpus; at 100 TB the whole point is that monitoring must be free).
    // Two observation points bracket the quality gate; the driver reads
    // them after one action and the declared output carries them as
    // columns, so the metric VALUES are oracle-checked (DuckDB computes
    // the same totals from the data) — not just asserted non-null. The
    // in-query require pins the law that makes observe trustworthy:
    // observed post-gate count ≡ the rollup's own total.
    QDef(
      "pipeline_observe",
      (s, dir) => {
        val obsIn = new org.apache.spark.sql.Observation("gate_in")
        val obsOut = new org.apache.spark.sql.Observation("gate_out")
        val rollup = T.documents(s, dir)
          .observe(obsIn, count(lit(1)).as("n"),
            sum(col("n_chars")).as("chars"))
          .where(col("n_chars") >= 200L && col("n_chars") <= 4000L)
          .observe(obsOut, count(lit(1)).as("n"),
            sum(col("n_chars")).as("chars"))
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).cast("long").as("chars"))
        val perLang = rollup.collect() // ONE action fires both observations
        val nIn = obsIn.get("n").asInstanceOf[Long]
        val charsIn = obsIn.get("chars").asInstanceOf[Long]
        val nOut = obsOut.get("n").asInstanceOf[Long]
        require(nOut == perLang.map(_.getAs[Long]("n_docs")).sum,
          s"observed post-gate count $nOut diverged from the rollup")
        rollup
          .withColumn("total_in", lit(nIn))
          .withColumn("chars_in", lit(charsIn))
          .withColumn("total_kept", lit(nOut))
          .orderBy("lang")
      },
      Some("""WITH t AS (
             |  SELECT CAST(count(*) AS BIGINT) AS total_in,
             |    CAST(sum(n_chars) AS BIGINT) AS chars_in,
             |    CAST(sum(CASE WHEN n_chars BETWEEN 200 AND 4000
             |                  THEN 1 ELSE 0 END) AS BIGINT) AS total_kept
             |  FROM documents)
             |SELECT lang, count(*) AS n_docs,
             |  CAST(sum(n_chars) AS BIGINT) AS chars,
             |  (SELECT total_in FROM t) AS total_in,
             |  (SELECT chars_in FROM t) AS chars_in,
             |  (SELECT total_kept FROM t) AS total_kept
             |FROM documents WHERE n_chars BETWEEN 200 AND 4000
             |GROUP BY lang ORDER BY lang""".stripMargin)),

    // Subword (BPE-style) tokenization under a LEARNED merge table: the
    // operator that makes token counts/budgets honest — every real LLM
    // pipeline counts tokens under learned merges, not whitespace. Learn:
    // count adjacent character pairs over the token stream (occurrence-
    // weighted distinct-token counts — same totals, vocabulary-sized
    // work), rank top-BpeMerges deterministically (count desc, pair asc).
    // Apply: the K merges fold over each DISTINCT token's symbol string
    // (ordered leftmost-non-overlap replace passes via the `aggregate`
    // HOF) and the folded vocabulary joins back onto per-(doc, tok)
    // counts. Folding the vocabulary instead of the token stream is the
    // load-bearing choice: by Zipf the distinct-token table is orders of
    // magnitude smaller than the corpus (31 vs 500k rows at sf0.1 — the
    // interpreted HOF fold runs 31 times, not 500k), and the same holds
    // at 100 TB (vocab in the millions vs trillions of occurrences; the
    // folded vocab joins back by token, broadcast at fixture scale,
    // shuffle-join when vocab outgrows it). (True BPE re-counts pairs
    // between merges — sequential by nature; the one-shot count +
    // rank-ordered application is the standard distributed approximation,
    // exactly mirrored by the oracle's K unrolled scalar-subquery
    // replace() calls.) The global rank window runs on the aggregated
    // pair table (≤ alphabet² rows) — single-partition by design.
    QDef(
      "text_bpe",
      (s, dir) => {
        val occ = T.documents(s, dir)
          .select(col("doc_id"), explode(tokens).as("tok"))
          .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        // localCheckpoint pins the BOUNDED per-type vocabulary (one row per
        // distinct token, never corpus rows): three consumers (pair counts →
        // merges, the merge fold, and through them the final join) would
        // otherwise each inline their own full corpus tokenize+aggregate —
        // measured: 6 parquet scans of documents vs 2 (the pipeline_mix
        // lesson applied to the vocab frame).
        val toks = occ.groupBy("tok").agg(sum("cnt").as("w"))
          .withColumn("cs", expr("regexp_extract_all(tok, '.', 0)"))
          .localCheckpoint()
        val pairs = toks.where(size(col("cs")) >= 2)
          .select(col("w"), explode(zip_with(
            slice(col("cs"), lit(1), size(col("cs")) - 1),
            slice(col("cs"), lit(2), size(col("cs")) - 1),
            (a, b) => struct(a.as("a"), b.as("b")))).as("p"))
          .select(col("w"), col("p.a").as("a"), col("p.b").as("b"))
        val rw = org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        val merges = pairs.groupBy("a", "b").agg(sum(col("w")).as("cnt"))
          .withColumn("rank", row_number().over(rw))
          .where(col("rank") <= BpeMerges)
          .select(struct(col("rank"),
            concat_ws(" ", col("a"), col("b")).as("pat"),
            concat(col("a"), col("b")).as("rep")).as("m"))
          .agg(sort_array(collect_list(col("m"))).as("merges"))
        val folded = toks.crossJoin(broadcast(merges))
          .withColumn("folded",
            expr("aggregate(merges, array_join(cs, ' '), (acc, m) -> replace(acc, m.pat, m.rep))"))
          .select(col("tok"), size(col("cs")).cast("long").as("n_sym"),
            size(split(col("folded"), " ")).cast("long").as("n_sub"))
        occ.join(folded, "tok")
          .groupBy("doc_id")
          .agg(sum("cnt").as("n_tokens"),
            sum(col("cnt") * col("n_sym")).as("n_symbols"),
            sum(col("cnt") * col("n_sub")).as("n_subwords"))
          .withColumn("bpe_ratio",
            rnd(col("n_subwords").cast("double") / col("n_symbols"), 6))
          .orderBy("doc_id")
      },
      Some {
        val applied = (1 to BpeMerges).foldLeft("array_to_string(cs, ' ')") { (acc, i) =>
          s"replace($acc, (SELECT pat FROM merges WHERE rank = $i), (SELECT rep FROM merges WHERE rank = $i))"
        }
        s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
           |chars AS (SELECT doc_id, tok, regexp_extract_all(tok, '.') AS cs FROM tok),
           |prs AS (
           |  SELECT unnest(cs[1:len(cs)-1]) AS a, unnest(cs[2:len(cs)]) AS b FROM chars),
           |cnt AS (SELECT a, b, count(*) AS cnt FROM prs GROUP BY a, b),
           |merges AS (
           |  SELECT a || ' ' || b AS pat, a || b AS rep,
           |    row_number() OVER (ORDER BY cnt DESC, a ASC, b ASC) AS rank
           |  FROM cnt QUALIFY rank <= $BpeMerges),
           |applied AS (SELECT doc_id, cs, $applied AS folded FROM chars)
           |SELECT doc_id, count(*) AS n_tokens,
           |  CAST(sum(len(cs)) AS BIGINT) AS n_symbols,
           |  CAST(sum(len(string_split(folded, ' '))) AS BIGINT) AS n_subwords,
           |  floor((CAST(sum(len(string_split(folded, ' '))) AS DOUBLE) / sum(len(cs))) * 1e6 + 0.5) / 1e6 AS bpe_ratio
           |FROM applied GROUP BY doc_id ORDER BY doc_id""".stripMargin
      }),

    // Model-based quality filtering — the LEARNED counterpart of
    // quality_gopher's hand-rule gate, and the family (fastText-style
    // classifier gates) modern pipelines run after the heuristics. Fully
    // in-engine train→infer: weak labels come from the Gopher rule itself
    // (distillation — exactly how production seeds classifier training
    // from rules/reference corpora), the model is multinomial Naive Bayes
    // over a rank-truncated token vocabulary, and every document is scored
    // with the learned log-odds. Scale shape: training is ONE tokenize
    // pass + map-side-combined (tok, class) counts; the model — vocab,
    // per-token log-odds, class prior — is O(NbVocab) and BROADCASTS;
    // inference re-streams the corpus once and rolls up per doc_id. No
    // stage touches pairs and nothing driver-side: the same plan trains on
    // 100 TB because the only global state is the broadcast weight table.
    // Engine-parity: counts are exact integers, so the ln() inputs are
    // identical doubles cross-engine; per-doc weight sums round on the
    // 1e-6 grid and `pred` compares the ROUNDED score so the decision
    // boundary is grid-exact.
    QDef(
      "quality_classifier",
      (s, dir) => {
        val V = graft.GraftConfig.NbVocab
        val gated = T.documents(s, dir)
          .withColumn("toks", tokens)
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .withColumn("mtl",
            (length(col("text")).cast("double") - (col("n_tok") - 1L)) / col("n_tok"))
          .withColumn("stop_frac",
            size(filter(col("toks"), t => t.isin("the", "a", "of", "and", "to", "in")))
              .cast("double") / col("n_tok"))
          .withColumn("keep",
            col("n_tok") >= 20L && col("n_tok") <= 800L &&
              col("mtl") >= 2.0 && col("mtl") <= 10.0 && col("stop_frac") >= 0.01)
          .select(col("doc_id"), col("keep"), col("toks"))
        val lab = gated.select(col("doc_id"), col("keep"), explode(col("toks")).as("tok"))
        val vocab = lab.groupBy("tok").agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("tok").asc).limit(V).select("tok")
        val cnt = lab.join(broadcast(vocab), "tok")
          .groupBy("tok")
          .agg(sum(when(col("keep"), 1L).otherwise(0L)).as("c1"),
            sum(when(col("keep"), 0L).otherwise(1L)).as("c0"))
        val tot = cnt.agg(sum("c1").as("n1"), sum("c0").as("n0"),
          count(lit(1)).as("nv"))
        val wts = cnt.crossJoin(broadcast(tot))
          .select(col("tok"),
            (log((col("c1") + 1.0) / (col("n1") + col("nv"))) -
              log((col("c0") + 1.0) / (col("n0") + col("nv")))).as("w"))
        val pri = gated.agg(
          log(sum(when(col("keep"), 1L).otherwise(0L)).cast("double") /
            sum(when(col("keep"), 0L).otherwise(1L))).as("prior"))
        val sc = lab.join(broadcast(wts), Seq("tok"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_feat"), sum(col("w")).as("s"))
        gated.select("doc_id").join(sc, Seq("doc_id"), "left")
          .crossJoin(broadcast(pri))
          .withColumn("score",
            rnd(col("prior") + coalesce(col("s"), lit(0.0)), 6))
          .select(col("doc_id"),
            coalesce(col("n_feat"), lit(0L)).as("n_feat"),
            col("score"), (col("score") > 0.0).as("pred"))
          .orderBy("doc_id")
      },
      Some(s"""WITH g AS (
             |  SELECT doc_id, text,
             |    (n_tok >= 20 AND n_tok <= 800 AND mtl >= 2.0 AND mtl <= 10.0
             |      AND stop_frac >= 0.01) AS keep
             |  FROM (
             |    SELECT doc_id, text, n_tok,
             |      (CAST(length(text) AS DOUBLE) - (n_tok - 1)) / n_tok AS mtl,
             |      CAST(len(list_filter(string_split(text, ' '),
             |        t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) / n_tok AS stop_frac
             |    FROM (SELECT doc_id, text, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |          FROM documents))),
             |tok AS (SELECT doc_id, keep, unnest(string_split(text, ' ')) AS tok FROM g),
             |vocab AS (
             |  SELECT tok FROM (SELECT tok, count(*) AS c FROM tok GROUP BY tok
             |                   ORDER BY c DESC, tok ASC LIMIT ${graft.GraftConfig.NbVocab})),
             |cnt AS (
             |  SELECT tok,
             |    sum(CASE WHEN keep THEN 1 ELSE 0 END) AS c1,
             |    sum(CASE WHEN keep THEN 0 ELSE 1 END) AS c0
             |  FROM tok WHERE tok IN (SELECT tok FROM vocab) GROUP BY tok),
             |tot AS (SELECT sum(c1) AS n1, sum(c0) AS n0, count(*) AS nv FROM cnt),
             |w AS (
             |  SELECT tok, ln((c1 + 1.0) / (n1 + nv)) - ln((c0 + 1.0) / (n0 + nv)) AS w
             |  FROM cnt, tot),
             |pri AS (
             |  SELECT ln(CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) /
             |    sum(CASE WHEN keep THEN 0 ELSE 1 END)) AS prior FROM g),
             |sc AS (
             |  SELECT doc_id, count(*) AS n_feat, sum(w) AS s
             |  FROM tok JOIN w USING (tok) GROUP BY doc_id)
             |SELECT g.doc_id, coalesce(sc.n_feat, 0) AS n_feat,
             |  floor((pri.prior + coalesce(sc.s, 0)) * 1e6 + 0.5) / 1e6 AS score,
             |  floor((pri.prior + coalesce(sc.s, 0)) * 1e6 + 0.5) / 1e6 > 0 AS pred
             |FROM g LEFT JOIN sc ON g.doc_id = sc.doc_id, pri
             |ORDER BY g.doc_id""".stripMargin)),

    // Sequence packing — the step between curation and the training loop:
    // concatenate the corpus (doc_id order) and chunk it into fixed-
    // capacity training sequences, so every sequence is full and a doc may
    // straddle a boundary (GPT-style concat-then-chunk; the complement of
    // text_chunk's per-doc windows, which pad instead of pack). Packing
    // windows partition on (lang, SHARD): a lang alone is not a bounded
    // unit — one language can be most of a 100 TB corpus, and a per-lang
    // window would pack it on one reducer. `shard = doc_id div
    // PackShardDocs` models production's input splits, each packing its
    // own stream independently; nothing is corpus-globally sequential and
    // per-window work is bounded by shard size at any corpus size. A doc
    // spanning sequences explodes into its covered range (narrow fan-out
    // ≤ n_tok/capacity + 1 rows per doc); per-sequence stats partial-
    // aggregate on (lang, shard, seq). All arithmetic is integer —
    // boundaries are engine-exact by construction.
    QDef(
      "pipeline_pack",
      (s, dir) => {
        val cap = graft.GraftConfig.PackCapacity
        val sh = graft.GraftConfig.PackShardDocs
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang", "shard").orderBy("doc_id")
        T.documents(s, dir)
          .select(col("doc_id"), col("lang"),
            size(tokens).cast("long").as("n_tok"))
          .withColumn("shard", expr(s"doc_id div $sh"))
          .withColumn("cum", sum(col("n_tok")).over(w))
          .withColumn("seq_id",
            explode(sequence(expr(s"(cum - n_tok) div $cap"),
              expr(s"(cum - 1) div $cap"))))
          .withColumn("tok_in_seq",
            least(col("cum"), (col("seq_id") + 1L) * cap) -
              greatest(col("cum") - col("n_tok"), col("seq_id") * cap))
          .groupBy("lang", "shard", "seq_id")
          .agg(count(lit(1)).as("n_docs"), sum("tok_in_seq").as("n_tokens"),
            min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
          .withColumn("is_full", col("n_tokens") === cap)
          .orderBy("lang", "shard", "seq_id")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, lang, doc_id // ${graft.GraftConfig.PackShardDocs} AS shard,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |c AS (
             |  SELECT doc_id, lang, shard, n_tok,
             |    CAST(sum(n_tok) OVER (PARTITION BY lang, shard ORDER BY doc_id
             |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
             |  FROM d),
             |e AS (
             |  SELECT doc_id, lang, shard, n_tok, cum,
             |    unnest(generate_series((cum - n_tok) // ${graft.GraftConfig.PackCapacity},
             |      (cum - 1) // ${graft.GraftConfig.PackCapacity})) AS seq_id
             |  FROM c)
             |SELECT lang, shard, seq_id, count(*) AS n_docs,
             |  CAST(sum(least(cum, (seq_id + 1) * ${graft.GraftConfig.PackCapacity}) -
             |    greatest(cum - n_tok, seq_id * ${graft.GraftConfig.PackCapacity})) AS BIGINT) AS n_tokens,
             |  min(doc_id) AS first_doc, max(doc_id) AS last_doc,
             |  CAST(sum(least(cum, (seq_id + 1) * ${graft.GraftConfig.PackCapacity}) -
             |    greatest(cum - n_tok, seq_id * ${graft.GraftConfig.PackCapacity})) AS BIGINT) = ${graft.GraftConfig.PackCapacity} AS is_full
             |FROM e GROUP BY lang, shard, seq_id ORDER BY lang, shard, seq_id""".stripMargin)),

    // Target-mixture resampling — the data-mixing step that sets how much
    // each source contributes to a training run (the Pile/LLaMA-style
    // recipe): a global token budget (one corpus epoch here — see
    // GraftConfig.MixBudgetDen for why) is split across sources by target
    // weight (uniform here; production passes a learned or hand-set
    // weight vector), each source's quota is CAPPED at one epoch of what
    // it actually has, the surplus from capped sources is redistributed
    // across the uncapped ones (one water-fill round — production
    // iterates to fixpoint; the trailing `least` below caps any source
    // the redistribution itself pushes past its epoch), and each source is
    // then sampled at rate quota/available with the same Knuth-hash
    // keep-rule as `sample_temperature` — selection is a pure function of
    // doc_id, so any engine and any partitioning reproduces it. All
    // quota/rate arithmetic is integer (micro-rate grid), so the
    // cap/redistribute boundaries are engine-exact. Scale shape: exactly
    // TWO corpus passes (per-source totals, then the selection rollup);
    // the water-fill itself runs on the checkpointed #sources-row
    // aggregate through broadcast-only joins; the rollup pass is scan →
    // broadcast rate join → conditional partial agg — the text never
    // shuffles, and there is no per-source total order anywhere (an
    // exact prefix-by-hash selection would need one; the rate form is
    // what a 100 TB mixer actually runs).
    // CURRICULUM MIXING SCHEDULE — the anneal between two mixtures every
    // staged training run performs (start on the corpus's natural source
    // shares, end uniform — or any warmup→final recipe): per step t of S,
    // the target weight interpolates w_t = (start·(S−1−t) + end·t)/(S−1),
    // and a fixed per-step batch of B documents is allocated to sources
    // by the LARGEST-REMAINDER method (base = floor share, the deficit
    // goes to the largest remainders, ties → source order) — the exact,
    // deterministic integer allocation samplers then consume. EVERYTHING
    // is fixed-point integer (micro-weights, bases, remainders, ranked
    // deficit), so the schedule is bit-reproducible in both engines; the
    // interpolation numerator is kept non-negative because integer
    // division FLOORS in DuckDB but TRUNCATES on the JVM — they only
    // agree on non-negatives. In-query law: every step's allocation sums
    // exactly to B (step 0 equals the natural shares by construction —
    // (sh·(S−1)) div (S−1) is exact). Scale: ONE
    // corpus pass for the per-source counts; the schedule itself is
    // O(steps × sources) metadata.
    QDef(
      "pipeline_anneal",
      (s, dir) => {
        val S = 4L; val B = 1000L; val M = 1000000L
        // localCheckpoint pins ONE corpus pass: both the totals and the
        // schedule fan-out reference this #sources-row frame (the
        // pipeline_mix lesson — without it each branch inlines its own
        // corpus scan+agg).
        val avail = T.documents(s, dir).groupBy("source")
          .agg(count(lit(1)).as("n_src"))
          .localCheckpoint()
        val glob = avail.agg(sum("n_src").cast("long").as("tot"),
          count(lit(1)).as("ns"))
        val w = avail.crossJoin(broadcast(glob))
          .withColumn("sh", expr(s"(n_src * ${M}L) div tot"))
          .withColumn("ufp", expr(s"${M}L div ns"))
          .withColumn("step", explode(sequence(lit(0L), lit(S - 1L))))
          .withColumn("w_micro", expr(
            s"(sh * (${S - 1L}L - step) + ufp * step) div ${S - 1L}L"))
          .withColumn("base", expr(s"(${B}L * w_micro) div ${M}L"))
          .withColumn("rem", expr(s"(${B}L * w_micro) % ${M}L"))
        val ws = org.apache.spark.sql.expressions.Window.partitionBy("step")
        val wr = org.apache.spark.sql.expressions.Window.partitionBy("step")
          .orderBy(col("rem").desc, col("source").asc)
        val alloc = w
          .withColumn("deficit", lit(B) - sum("base").over(ws))
          .withColumn("rk", row_number().over(wr).cast("long"))
          .withColumn("alloc",
            col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
          .select("step", "source", "w_micro", "alloc")
        // Law: every step allocates EXACTLY the batch.
        val sums = alloc.groupBy("step").agg(sum("alloc").cast("long").as("t"))
          .collect() // bounded: S rows
        require(sums.forall(_.getLong(1) == B),
          s"largest-remainder allocation must sum to $B per step")
        alloc.orderBy("step", "source")
      },
      Some(s"""WITH avail AS (
             |  SELECT source, CAST(count(*) AS BIGINT) AS n_src
             |  FROM documents GROUP BY source),
             |tots AS (
             |  SELECT CAST(sum(n_src) AS BIGINT) AS tot, count(*) AS ns
             |  FROM avail),
             |w AS (
             |  SELECT source, g.k AS step,
             |    ((n_src * 1000000) // tot * (3 - g.k) +
             |     (1000000 // ns) * g.k) // 3 AS w_micro
             |  FROM avail CROSS JOIN tots CROSS JOIN generate_series(0, 3) g(k)),
             |e AS (
             |  SELECT step, source, w_micro,
             |    (1000 * w_micro) // 1000000 AS base,
             |    (1000 * w_micro) % 1000000 AS rem
             |  FROM w),
             |r AS (
             |  SELECT *,
             |    1000 - CAST(sum(base) OVER (PARTITION BY step) AS BIGINT)
             |      AS deficit,
             |    row_number() OVER (PARTITION BY step
             |      ORDER BY rem DESC, source ASC) AS rk
             |  FROM e)
             |SELECT step, source, w_micro,
             |  base + (CASE WHEN rk <= deficit THEN 1 ELSE 0 END) AS alloc
             |FROM r ORDER BY step, source""".stripMargin)),

    QDef(
      "pipeline_mix",
      (s, dir) => {
        val d = T.documents(s, dir).select("doc_id", "source", "n_chars")
        // localCheckpoint pins ONE corpus pass for the per-source totals:
        // the water-fill references this #sources-row frame four times
        // (glob, surplus, quota, rate), and without the checkpoint each
        // reference inlines its own full corpus scan+agg into the plan —
        // measured: 6 parquet scans of documents vs 2.
        val avail = d.groupBy("source")
          .agg(sum("n_chars").cast("long").as("avail_tok"))
          .localCheckpoint()
        val glob = avail.agg(sum("avail_tok").cast("long").as("tot"),
          count(lit(1)).as("ns"))
        val q0 = avail.crossJoin(broadcast(glob))
          .withColumn("quota0",
            expr(s"(tot div ${graft.GraftConfig.MixBudgetDen}) div ns"))
        val r1 = q0.agg(
          sum(when(col("avail_tok") < col("quota0"),
            col("quota0") - col("avail_tok")).otherwise(0L))
            .cast("long").as("surplus"),
          sum(when(col("avail_tok") >= col("quota0"), 1L).otherwise(0L))
            .cast("long").as("n_unc"))
        val fin = q0.crossJoin(broadcast(r1))
          .withColumn("quota_tok",
            least(col("avail_tok"),
              when(col("avail_tok") < col("quota0"), col("avail_tok"))
                .otherwise(col("quota0") + expr("surplus div n_unc"))))
          // quota_tok*1e6 overflows int64 past ~9.2e12 tokens/source — real
          // production scale. Widen the one intermediate to decimal(38,0)
          // (Spark's int128 path; `div` still returns BIGINT), matching the
          // oracle's HUGEINT: both engines then agree everywhere instead of
          // Spark wrapping silently while DuckDB raises.
          .withColumn("rate_micro",
            least(lit(graft.GraftConfig.TempSampleModulus),
              expr(s"(cast(quota_tok as decimal(38,0)) * ${graft.GraftConfig.TempSampleModulus}) div avail_tok")))
          .select("source", "avail_tok", "quota_tok", "rate_micro")
        // One corpus pass for the selection rollup: the keep-rule folds
        // into a conditional partial agg (every doc flows through, so no
        // source can vanish and no outer join is needed), and the quota
        // columns ride the broadcast join into the grouping key.
        val keep = (col("doc_id") * 2654435761L) %
          graft.GraftConfig.TempSampleModulus < col("rate_micro")
        d.join(broadcast(fin), "source")
          .groupBy("source", "avail_tok", "quota_tok", "rate_micro")
          .agg(sum(when(keep, 1L).otherwise(0L)).as("n_sel"),
            sum(when(keep, col("n_chars")).otherwise(0L)).cast("long").as("tok_sel"))
          .orderBy("source")
      },
      Some(s"""WITH a AS (
             |  SELECT source, CAST(sum(n_chars) AS BIGINT) AS avail_tok
             |  FROM documents GROUP BY source),
             |g AS (SELECT CAST(sum(avail_tok) AS BIGINT) AS tot, count(*) AS ns FROM a),
             |q0 AS (
             |  SELECT source, avail_tok,
             |    (tot // ${graft.GraftConfig.MixBudgetDen}) // ns AS quota0
             |  FROM a CROSS JOIN g),
             |r1 AS (
             |  SELECT
             |    CAST(sum(CASE WHEN avail_tok < quota0 THEN quota0 - avail_tok ELSE 0 END) AS BIGINT) AS surplus,
             |    CAST(sum(CASE WHEN avail_tok >= quota0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unc
             |  FROM q0),
             |f AS (
             |  SELECT source, avail_tok,
             |    least(avail_tok, CASE WHEN avail_tok < quota0 THEN avail_tok
             |      ELSE quota0 + surplus // n_unc END) AS quota_tok
             |  FROM q0 CROSS JOIN r1),
             |t AS (
             |  SELECT source, avail_tok, quota_tok,
             |    least(${graft.GraftConfig.TempSampleModulus},
             |      CAST((CAST(quota_tok AS HUGEINT) * ${graft.GraftConfig.TempSampleModulus}) // avail_tok AS BIGINT)) AS rate_micro
             |  FROM f),
             |r AS (
             |  SELECT d.source, count(*) AS n_sel, CAST(sum(d.n_chars) AS BIGINT) AS tok_sel
             |  FROM documents d JOIN t USING (source)
             |  WHERE (d.doc_id * 2654435761) % ${graft.GraftConfig.TempSampleModulus} < t.rate_micro
             |  GROUP BY d.source)
             |SELECT t.source, t.avail_tok, t.quota_tok, t.rate_micro,
             |  coalesce(r.n_sel, 0) AS n_sel, coalesce(r.tok_sel, 0) AS tok_sel
             |FROM t LEFT JOIN r USING (source) ORDER BY t.source""".stripMargin)),

    // The full preprocessing funnel as ONE declared query — the report a
    // dataset card publishes per source: raw docs → Gopher quality gate
    // (pipeline_curate's exact thresholds) → canonical keep-first dedup
    // (over GATED docs only — the production order; a dropped doc can't
    // shadow a kept one) → the pipeline_mix water-fill and deterministic
    // rate selection over the SURVIVING tokens. Composing the stages into
    // one oracle-checked query is the point: stage interactions (the
    // dedup keeper changing which tokens the mixer sees) are exactly
    // where hand-chained pipelines silently drift. Scale shape: TWO
    // corpus passes, each with one shuffle — pass 1 flags gate+keep
    // (the canon window's hash partitioning) and collapses to the
    // per-source funnel aggregate; the water-fill runs on that
    // checkpointed #sources-row frame (broadcast-only); pass 2 re-derives
    // the deterministic flags (pure functions of the row, so the passes
    // agree) and rolls up the rate selection with a conditional partial
    // agg. Non-gated rows get a per-doc unique canon so the keep window's
    // partitions stay unpolluted.
    QDef(
      "pipeline_recipe",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("canon").orderBy("doc_id")
        def flagged = T.documents(s, dir)
          .withColumn("toks", tokens)
          .withColumn("n_tok", size(col("toks")).cast("long"))
          .withColumn("mtl",
            (length(col("text")).cast("double") - (col("n_tok") - 1L)) / col("n_tok"))
          .withColumn("stop_frac",
            size(filter(col("toks"), t => t.isin("the", "a", "of", "and", "to", "in")))
              .cast("double") / col("n_tok"))
          .withColumn("gated",
            col("n_tok") >= 20L && col("n_tok") <= 800L &&
              col("mtl") >= 2.0 && col("mtl") <= 10.0 && col("stop_frac") >= 0.01)
          .withColumn("canon",
            when(col("gated"),
              md5(array_join(array_sort(array_distinct(col("toks"))), " ")))
              .otherwise(concat(lit("raw-"), col("doc_id"))))
          .withColumn("kept",
            col("gated") && row_number().over(w) === 1)
          .select("doc_id", "source", "n_tok", "gated", "kept")
        val funnel = flagged.groupBy("source").agg(
            count(lit(1)).as("n_raw"),
            sum(when(col("gated"), 1L).otherwise(0L)).as("n_gated"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("kept"), col("n_tok")).otherwise(0L)).cast("long")
              .as("avail_tok"))
          .localCheckpoint()
        val glob = funnel.agg(sum("avail_tok").cast("long").as("tot"),
          count(lit(1)).as("ns"))
        val q0 = funnel.crossJoin(broadcast(glob))
          .withColumn("quota0",
            expr(s"(tot div ${graft.GraftConfig.MixBudgetDen}) div ns"))
        val r1 = q0.agg(
          sum(when(col("avail_tok") < col("quota0"),
            col("quota0") - col("avail_tok")).otherwise(0L))
            .cast("long").as("surplus"),
          sum(when(col("avail_tok") >= col("quota0"), 1L).otherwise(0L))
            .cast("long").as("n_unc"))
        val rates = q0.crossJoin(broadcast(r1))
          .withColumn("quota_tok",
            least(col("avail_tok"),
              when(col("avail_tok") < col("quota0"), col("avail_tok"))
                .otherwise(col("quota0") + expr("surplus div n_unc"))))
          .withColumn("rate_micro",
            when(col("avail_tok") === 0L, 0L)
              // decimal(38,0) intermediate: see pipeline_mix's rate note.
              .otherwise(least(lit(graft.GraftConfig.TempSampleModulus),
                expr(s"(cast(quota_tok as decimal(38,0)) * ${graft.GraftConfig.TempSampleModulus}) div avail_tok"))))
          .select("source", "n_raw", "n_gated", "n_kept", "avail_tok", "rate_micro")
        val keep = (col("doc_id") * 2654435761L) %
          graft.GraftConfig.TempSampleModulus < col("rate_micro")
        // Roll up over ALL flagged rows (pipeline_mix's shape) with the
        // selection gated in the conditional sums — a pre-filter on `kept`
        // would drop a source whose every doc fails the gate from the
        // groupBy entirely, while the oracle's rates LEFT JOIN sel emits it
        // with n_sel = 0. Every raw doc flows through, so no source can
        // vanish and no outer join is needed.
        flagged
          .join(broadcast(rates), "source")
          .groupBy("source", "n_raw", "n_gated", "n_kept", "avail_tok", "rate_micro")
          .agg(sum(when(col("kept") && keep, 1L).otherwise(0L)).as("n_sel"),
            sum(when(col("kept") && keep, col("n_tok")).otherwise(0L))
              .cast("long").as("tok_sel"))
          .orderBy("source")
      },
      Some(s"""WITH b AS (
             |  SELECT doc_id, source, text, n_tok,
             |    (CAST(length(text) AS DOUBLE) - (n_tok - 1)) / n_tok AS mtl,
             |    CAST(len(list_filter(string_split(text, ' '),
             |      t -> t IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS DOUBLE) / n_tok AS stop_frac
             |  FROM (SELECT *, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |        FROM documents)),
             |fl AS (
             |  SELECT doc_id, source, n_tok,
             |    (n_tok >= 20 AND n_tok <= 800 AND mtl >= 2.0 AND mtl <= 10.0
             |      AND stop_frac >= 0.01) AS gated,
             |    CASE WHEN (n_tok >= 20 AND n_tok <= 800 AND mtl >= 2.0 AND mtl <= 10.0
             |      AND stop_frac >= 0.01)
             |      THEN md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))
             |      ELSE 'raw-' || doc_id END AS canon
             |  FROM b),
             |fk AS (
             |  SELECT doc_id, source, n_tok, gated,
             |    gated AND row_number() OVER (PARTITION BY canon ORDER BY doc_id) = 1 AS kept
             |  FROM fl),
             |funnel AS (
             |  SELECT source, count(*) AS n_raw,
             |    CAST(sum(CASE WHEN gated THEN 1 ELSE 0 END) AS BIGINT) AS n_gated,
             |    CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |    CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT) AS avail_tok
             |  FROM fk GROUP BY source),
             |g AS (SELECT CAST(sum(avail_tok) AS BIGINT) AS tot, count(*) AS ns FROM funnel),
             |q0 AS (
             |  SELECT source, n_raw, n_gated, n_kept, avail_tok,
             |    (tot // ${graft.GraftConfig.MixBudgetDen}) // ns AS quota0
             |  FROM funnel CROSS JOIN g),
             |r1 AS (
             |  SELECT
             |    CAST(sum(CASE WHEN avail_tok < quota0 THEN quota0 - avail_tok ELSE 0 END) AS BIGINT) AS surplus,
             |    CAST(sum(CASE WHEN avail_tok >= quota0 THEN 1 ELSE 0 END) AS BIGINT) AS n_unc
             |  FROM q0),
             |rates AS (
             |  SELECT source, n_raw, n_gated, n_kept, avail_tok,
             |    CASE WHEN avail_tok = 0 THEN 0
             |      ELSE least(${graft.GraftConfig.TempSampleModulus},
             |        CAST((CAST(least(avail_tok, CASE WHEN avail_tok < quota0 THEN avail_tok
             |           ELSE quota0 + surplus // n_unc END) AS HUGEINT)
             |         * ${graft.GraftConfig.TempSampleModulus}) // avail_tok AS BIGINT)) END AS rate_micro
             |  FROM q0 CROSS JOIN r1),
             |sel AS (
             |  SELECT fk.source, count(*) AS n_sel,
             |    CAST(sum(fk.n_tok) AS BIGINT) AS tok_sel
             |  FROM fk JOIN rates USING (source)
             |  WHERE fk.kept
             |    AND (fk.doc_id * 2654435761) % ${graft.GraftConfig.TempSampleModulus} < rates.rate_micro
             |  GROUP BY fk.source)
             |SELECT rates.source, rates.n_raw, rates.n_gated, rates.n_kept,
             |  rates.avail_tok, rates.rate_micro,
             |  coalesce(sel.n_sel, 0) AS n_sel, coalesce(sel.tok_sel, 0) AS tok_sel
             |FROM rates LEFT JOIN sel USING (source) ORDER BY rates.source""".stripMargin)),

    // Output sharding — the LAST step of a curation pipeline: split the
    // corpus into ShardCount training shards balanced by TOKEN mass (not
    // doc count; doc sizes are heavy-tailed, and a count-balanced split
    // leaves some shards 2-3x heavier). Assignment is round-robin by
    // global size rank (rank r → shard (r-1) % S): consecutive ranks have
    // near-equal sizes, so every shard receives one doc from each size
    // stratum — within one max-doc of perfect token balance, deterministic,
    // and join-free to apply. The SCALE trick is computing a global
    // (n_tok DESC, doc_id) rank without a global single-reducer sort: the
    // doc-level row_number PARTITIONS BY n_tok (parallel across size
    // classes), and each class's global offset comes from a window over
    // the AGGREGATE-SIZED class-count table (distinct token counts —
    // hundreds of rows at any corpus size; the family's monitoring-table
    // budget), broadcast back onto the docs. rank = class offset + local
    // rank reproduces the global ordering exactly — DuckDB oracles it with
    // a plain global row_number.
    QDef(
      "pipeline_shard",
      (s, dir) => {
        val S = graft.GraftConfig.ShardCount
        val d = T.documents(s, dir)
          .select(col("doc_id"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
        val off = d.groupBy("n_tok").agg(count(lit(1)).as("c"))
          .withColumn("offset",
            coalesce(
              sum("c").over(org.apache.spark.sql.expressions.Window
                .orderBy(col("n_tok").desc)
                .rowsBetween(Long.MinValue, -1L)),
              lit(0L)))
          .select("n_tok", "offset")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("n_tok").orderBy("doc_id")
        d.withColumn("lr", row_number().over(w).cast("long"))
          .join(broadcast(off), Seq("n_tok"))
          .withColumn("rank", col("offset") + col("lr"))
          .withColumn("shard", (col("rank") - 1L) % S)
          .groupBy("shard")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").cast("long").as("tok_total"),
            min("rank").as("first_rank"))
          .orderBy("shard")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |r AS (
             |  SELECT doc_id, n_tok,
             |    row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rank
             |  FROM d)
             |SELECT (rank - 1) % ${graft.GraftConfig.ShardCount} AS shard,
             |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_total,
             |  min(rank) AS first_rank
             |FROM r GROUP BY 1 ORDER BY 1""".stripMargin)),

    // REPRODUCIBLE DATASET RELEASE — the shard manifest PINNED to a
    // commit-log snapshot version: "train run X used dataset release v1"
    // must mean the same bytes forever, even as the corpus table keeps
    // ingesting. The corpus lands in a commit-log table (v1 = the 80%
    // slice, v2 = the rest appended); the shard manifest (pipeline_shard's
    // rank-without-global-sort layout) is computed AS OF an explicit
    // version, and the reproducibility LAW is require'd in-query: the v1
    // manifest computed BEFORE the v2 append and the v1 manifest computed
    // AFTER it are row-identical (time travel makes the release immutable),
    // while the v2 manifest genuinely differs (the append was not a
    // no-op). Output = both releases' manifests, hash-checked, so a
    // single doc landing in a different shard anywhere mismatches. At
    // 100 TB this is the release discipline that replaces "copy the
    // corpus per experiment": a release is O(1) metadata (a version
    // number), the manifest recomputes deterministically from the pinned
    // snapshot, and nightly ingest appends never disturb published
    // releases — the lakehouse side (time travel) doing for TRAINING DATA
    // what it does for tables.
    QDef(
      "pipeline_train_snapshot",
      (s, dir) => {
        import graft.sources.CommitLog
        val root = Scans.freshRunTmpPath(s, "graft_release_")
        val S = graft.GraftConfig.ShardCount
        val d = T.documents(s, dir).select(col("doc_id"),
          size(tokens).cast("long").as("n_tok"))
        d.where(col("doc_id") % 5L =!= 0L)
          .coalesce(1).write.mode("overwrite").parquet(s"$root/g=1")
        CommitLog.commit(root, 1L, "g=1")
        def manifest(v: Long): DataFrame = {
          val snap = CommitLog.readAsOf(s, root, v).select("doc_id", "n_tok")
          val off = snap.groupBy("n_tok").agg(count(lit(1)).as("c"))
            .withColumn("offset", coalesce(
              sum("c").over(org.apache.spark.sql.expressions.Window
                .orderBy(col("n_tok").desc).rowsBetween(Long.MinValue, -1L)),
              lit(0L)))
            .select("n_tok", "offset")
          val w = org.apache.spark.sql.expressions.Window
            .partitionBy("n_tok").orderBy("doc_id")
          snap.withColumn("lr", row_number().over(w).cast("long"))
            .join(broadcast(off), Seq("n_tok"))
            .withColumn("rank", col("offset") + col("lr"))
            .withColumn("shard", (col("rank") - 1L) % S)
            .groupBy("shard")
            .agg(count(lit(1)).as("n_docs"),
              sum("n_tok").cast("long").as("tok_total"),
              sum("doc_id").cast("long").as("id_sum"),
              min("rank").as("first_rank"))
            .select(lit(v).as("version"), col("shard"), col("n_docs"),
              col("tok_total"), col("id_sum"), col("first_rank"))
        }
        def rows(m: DataFrame) = // bounded: ShardCount rows
          m.collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4), r.getLong(5))).sortBy(_._1).toSeq
        val release1 = rows(manifest(1L))
        d.where(col("doc_id") % 5L === 0L)
          .coalesce(1).write.mode("overwrite").parquet(s"$root/g=2")
        CommitLog.commit(root, 2L, "g=2")
        require(rows(manifest(1L)) == release1,
          "a published release must be byte-stable across later ingest")
        require(rows(manifest(2L)) != release1,
          "the appended release must genuinely differ")
        manifest(1L).unionAll(manifest(2L)).orderBy("version", "shard")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |r1 AS (
             |  SELECT doc_id, n_tok,
             |    row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rank
             |  FROM d WHERE doc_id % 5 <> 0),
             |r2 AS (
             |  SELECT doc_id, n_tok,
             |    row_number() OVER (ORDER BY n_tok DESC, doc_id) AS rank
             |  FROM d)
             |SELECT CAST(1 AS BIGINT) AS version,
             |  (rank - 1) % ${graft.GraftConfig.ShardCount} AS shard,
             |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_total,
             |  CAST(sum(doc_id) AS BIGINT) AS id_sum, min(rank) AS first_rank
             |FROM r1 GROUP BY 1, 2
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), (rank - 1) % ${graft.GraftConfig.ShardCount},
             |  count(*), CAST(sum(n_tok) AS BIGINT),
             |  CAST(sum(doc_id) AS BIGINT), min(rank)
             |FROM r2 GROUP BY 1, 2
             |ORDER BY version, shard""".stripMargin)),

    // TRAINING DATA LOADER manifest — the piece between a curated corpus
    // and the optimizer step: per EPOCH, a fresh DETERMINISTIC permutation
    // (multiplicative hash of (doc_id, epoch) — reproducible across
    // restarts and engines, where an RNG shuffle is neither), sharded to
    // loader workers, each worker's stream greedily packed into
    // fixed-token-budget batches (batch = exclusive-prefix-tokens div
    // budget — the declarative form of "fill until the budget spills").
    // The loader LAWS are require'd in-query: every epoch covers every
    // doc exactly once (coverage), and the two epochs produce genuinely
    // different batch compositions (the permutation actually varies —
    // epoch reshuffling is the point). Output = the full batch manifest
    // (epoch, shard, batch, n_docs, tok_sum), hash-checked, so a batch
    // boundary off by one doc anywhere mismatches. At 100 TB: the
    // permutation key is a pushdown-able projection (no shuffle to
    // assign), each (epoch, shard) packs independently under its own
    // window — the cumsum never crosses workers, exactly like a real
    // loader — and the manifest is O(corpus/budget) rows of metadata the
    // trainer consumes instead of re-deriving order at every restart.
    QDef(
      "pipeline_dataloader",
      (s, dir) => {
        val W = graft.GraftConfig.LoaderWorkers
        val B = graft.GraftConfig.LoaderBatchTokens
        val d = T.documents(s, dir).select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tok"))
        val epochs = Seq(0L, 1L).map(e => d.withColumn("epoch", lit(e)))
          .reduce(_.unionByName(_))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("epoch", "shard").orderBy("ord", "doc_id")
        val manifest = epochs
          .withColumn("ord",
            (col("doc_id") * 2654435761L + (col("epoch") + 1L) * 40503L)
              % 1000000007L)
          .withColumn("shard", col("ord") % W)
          .withColumn("pre", coalesce(
            sum("n_tok").over(w.rowsBetween(Long.MinValue, -1L)), lit(0L)))
          .withColumn("batch", expr(s"pre div $B"))
          .groupBy("epoch", "shard", "batch")
          .agg(count(lit(1)).as("n_docs"),
            sum("n_tok").cast("long").as("tok_sum"))
          .localCheckpoint()
        // Loader law 1 — COVERAGE: each epoch is exactly one pass.
        val total = d.count()
        manifest.groupBy("epoch").agg(sum("n_docs").cast("long").as("n"))
          .collect().foreach(r => require(r.getLong(1) == total,
            s"epoch ${r.getLong(0)} covered ${r.getLong(1)} of $total docs"))
        // Loader law 2 — the permutation VARIES by epoch: at least one
        // (shard, batch) cell differs in composition between the epochs.
        val e0 = manifest.where(col("epoch") === 0L)
          .select(col("shard"), col("batch"), col("n_docs").as("d0"),
            col("tok_sum").as("t0"))
        val e1 = manifest.where(col("epoch") === 1L)
          .select(col("shard"), col("batch"), col("n_docs").as("d1"),
            col("tok_sum").as("t1"))
        val differing = e0.join(e1, Seq("shard", "batch"), "full")
          .where(col("d0").isNull || col("d1").isNull
            || col("d0") =!= col("d1") || col("t0") =!= col("t1"))
          .count()
        require(differing > 0L,
          "epoch reshuffle produced identical batch compositions")
        manifest.orderBy("epoch", "shard", "batch")
      },
      Some(s"""WITH d AS (
             |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |ep AS (
             |  SELECT doc_id, n_tok, CAST(0 AS BIGINT) AS epoch FROM d
             |  UNION ALL
             |  SELECT doc_id, n_tok, CAST(1 AS BIGINT) AS epoch FROM d),
             |k AS (
             |  SELECT epoch, doc_id, n_tok,
             |    (doc_id * 2654435761 + (epoch + 1) * 40503) % 1000000007 AS ord
             |  FROM ep),
             |sh AS (SELECT *, ord % ${graft.GraftConfig.LoaderWorkers} AS shard FROM k),
             |p AS (
             |  SELECT epoch, shard, n_tok,
             |    coalesce(CAST(sum(n_tok) OVER (PARTITION BY epoch, shard
             |      ORDER BY ord, doc_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
             |      0) AS pre
             |  FROM sh)
             |SELECT epoch, shard, pre // ${graft.GraftConfig.LoaderBatchTokens} AS batch,
             |  count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS tok_sum
             |FROM p GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin))
  )
}
