package graft.operators

import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.functions._

/** §2.2 Projection / filter / predicates. All row-level, totally ordered. */
object Filters {

  val defs: Seq[QDef] = Seq(

    // Deterministic systematic sample: a 5% slice selected by key arithmetic
    // (o_orderkey·prime mod 100 < 5), then an aggregate over the slice.
    // TABLESAMPLE/df.sample use engine-specific RNG streams that can never
    // hash-match across engines; the arithmetic slice gives the same
    // pushdown-able scan-level sampling (the predicate reaches the parquet
    // reader) with bit-identical membership — the shape a 100 TB
    // explore/estimate pass uses.
    QDef(
      "filter_sample",
      (s, dir) =>
        T.orders(s, dir)
          .where((col("o_orderkey") * 7919L) % 100L < 5L)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), rnd(avg("o_totalprice"), 2).as("avg_price"))
          .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  floor((avg(o_totalprice)) * 1e2 + 0.5) / 1e2 AS avg_price
             |FROM orders WHERE (o_orderkey * 7919) % 100 < 5
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Stratified quota sample: exactly 20 documents per language, selected
    // by rank over a deterministic per-row hash (Knuth multiplicative mod a
    // prime — engine-portable integer arithmetic, unlike RNG sampling).
    // One shuffle on the stratum key; at 100 TB strata are far larger than
    // the quota, so the rank window is the bottleneck — the production
    // refinement is a pre-filter on the hash (h < quota/|stratum| · P,
    // oversampled) before ranking, which this plan composes with the same
    // filter_sample-style pushdown predicate. This is the per-domain /
    // per-language quota pass a training-mix builder runs.
    QDef(
      "sample_stratified",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("lang")
          .orderBy(col("h"), col("doc_id"))
        T.documents(s, dir)
          .withColumn("h", (col("doc_id") * 2654435761L) % 1000000007L)
          .withColumn("rk", row_number().over(w).cast("long"))
          .where(col("rk") <= 20L)
          .select("lang", "rk", "doc_id", "h")
          .orderBy("lang", "rk")
      },
      Some("""SELECT lang, rk, doc_id, h
             |FROM (SELECT lang, doc_id, (doc_id * 2654435761) % 1000000007 AS h,
             |        CAST(row_number() OVER (PARTITION BY lang
             |          ORDER BY (doc_id * 2654435761) % 1000000007, doc_id) AS BIGINT) AS rk
             |      FROM documents)
             |WHERE rk <= 20 ORDER BY lang, rk""".stripMargin)),

    // Temperature-weighted training-mix sampling: per-language keep
    // probability chosen so kept counts are ∝ n_lang^α with α = 1/2 — the
    // standard LLM multilingual rebalance (upweight low-resource languages
    // without discarding the head entirely). The smallest language anchors
    // at keep-prob 1 (f = min(1, sqrt(n_ref / n_lang)), n_ref = smallest
    // stratum), so kept_lang = n_lang·f ∝ sqrt(n_lang). Membership is the
    // same engine-portable Knuth-hash slice as sample_stratified — and
    // α = 1/2 keeps the threshold bit-identical across engines because
    // sqrt and the divide are IEEE correctly-rounded in both (a pow() with
    // arbitrary α is not). Scale shape: the per-lang count table is
    // #languages rows → broadcast back; the corpus itself NEVER shuffles —
    // count partial-agg + broadcast-join + pushdown-able filter. This is
    // the quota-free sibling of sample_stratified's rank window.
    QDef(
      "sample_temperature",
      (s, dir) => {
        val d = T.documents(s, dir).select("doc_id", "lang")
        val counts = d.groupBy("lang").agg(count(lit(1)).as("n_total"))
        val nref = counts.agg(min("n_total").as("n_ref"))
        val th = counts.crossJoin(broadcast(nref))
          .withColumn("thresh",
            floor(least(lit(1.0),
              sqrt(col("n_ref").cast("double") / col("n_total"))) * 1e6)
              .cast("long"))
          .select("lang", "n_total", "thresh")
        d.join(broadcast(th), "lang")
          .where((col("doc_id") * 2654435761L) % graft.GraftConfig.TempSampleModulus
            < col("thresh"))
          .select("lang", "doc_id", "n_total", "thresh")
          .orderBy("lang", "doc_id")
      },
      Some(s"""WITH c AS (SELECT lang, count(*) AS n_total FROM documents GROUP BY lang),
              |r AS (SELECT min(n_total) AS n_ref FROM c),
              |t AS (SELECT lang, n_total,
              |    CAST(floor(least(1.0,
              |      sqrt(CAST(n_ref AS DOUBLE) / n_total)) * 1e6) AS BIGINT) AS thresh
              |  FROM c CROSS JOIN r)
              |SELECT d.lang, d.doc_id, t.n_total, t.thresh
              |FROM documents d JOIN t ON d.lang = t.lang
              |WHERE (d.doc_id * 2654435761) % ${graft.GraftConfig.TempSampleModulus} < t.thresh
              |ORDER BY d.lang, d.doc_id""".stripMargin)),

    // PER-EXAMPLE importance sampling — the complement to
    // sample_temperature's SOURCE-level reweighting: each document is
    // accepted with probability proportional to its own utility (here the
    // token-budget proxy n_tok/400, capped at 1), the standard shape for
    // quality-weighted subsampling. Acceptance is the deterministic
    // Knuth-hash threshold the whole sample family uses — a pure function
    // of the key in fixed-point micro units, reproducible on any engine,
    // stable under re-partitioning. Output: per-source kept counts and
    // token mass plus the fixed-point expected count (Σ w div 1e6) — the
    // sampler's own calibration readout. Scale: the weight and the accept
    // bit are pushdown-able projections (no shuffle to decide a row);
    // everything aggregates map-side into #sources rows.
    QDef(
      "sample_importance",
      (s, dir) => {
        val M = 1000000L
        val d = T.documents(s, dir)
          .select(col("doc_id"), col("source"),
            size(split(col("text"), " ")).cast("long").as("n_tok"))
          .withColumn("w_micro",
            least(lit(M), expr(s"(n_tok * ${M}L) div 400L")))
          .withColumn("kept",
            (col("doc_id") * 2654435761L) % lit(M) < col("w_micro"))
        d.groupBy("source")
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).cast("long").as("n_kept"),
            sum(when(col("kept"), col("n_tok")).otherwise(0L))
              .cast("long").as("tok_kept"),
            expr(s"cast(sum(w_micro) div ${M}L as bigint)").as("exp_kept"))
          .orderBy("source")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
             |  FROM documents),
             |w AS (
             |  SELECT source, n_tok,
             |    least(1000000, (n_tok * 1000000) // 400) AS w_micro,
             |    (doc_id * 2654435761) % 1000000
             |      < least(1000000, (n_tok * 1000000) // 400) AS kept
             |  FROM d)
             |SELECT source, count(*) AS n_docs,
             |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             |  CAST(sum(CASE WHEN kept THEN n_tok ELSE 0 END) AS BIGINT)
             |    AS tok_kept,
             |  CAST(CAST(sum(w_micro) AS BIGINT) // 1000000 AS BIGINT)
             |    AS exp_kept
             |FROM w GROUP BY source ORDER BY source""".stripMargin)),

    // Deterministic train/validation/test split: every document lands in
    // exactly one split by Knuth-hash bucket (80/10/10), so the assignment
    // is a pure function of the key — re-runnable on any engine, stable
    // under re-partitioning, and consistent with the dedup/decontam passes
    // (a doc near-duplicated across splits is caught by key, not by which
    // executor sampled it — the leakage failure mode of RNG splits).
    // Output is the per-(lang, split) contingency table plus each split's
    // within-language share. Scale shape: the split column is a pushdown-
    // able projection (no shuffle to assign); the count table is
    // #langs × 3 rows from one partial-agg groupBy; the share window runs
    // on that tiny aggregate, never the corpus.
    QDef(
      "sample_split",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window.partitionBy("lang")
        T.documents(s, dir)
          .withColumn("b", (col("doc_id") * 2654435761L) % 1000000007L % 100L)
          .withColumn("split",
            when(col("b") < 80L, "train")
              .when(col("b") < 90L, "val")
              .otherwise("test"))
          .groupBy("lang", "split")
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("lang_share",
            rnd(col("n_docs").cast("double") / sum("n_docs").over(w), 6))
          .orderBy("lang", "split")
      },
      Some("""WITH a AS (
             |  SELECT lang,
             |    CASE WHEN (doc_id * 2654435761) % 1000000007 % 100 < 80 THEN 'train'
             |         WHEN (doc_id * 2654435761) % 1000000007 % 100 < 90 THEN 'val'
             |         ELSE 'test' END AS split
             |  FROM documents),
             |c AS (SELECT lang, split, count(*) AS n_docs FROM a GROUP BY lang, split)
             |SELECT lang, split, n_docs,
             |  floor((CAST(n_docs AS DOUBLE) /
             |    CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT)) * 1e6 + 0.5) / 1e6
             |    AS lang_share
             |FROM c ORDER BY lang, split""".stripMargin)),

    // Deterministic per-group reservoir: a FIXED-SIZE (k=5) sample per
    // source — the eval-set / spot-check draw (rate-based samplers like
    // filter_sample can't bound group size; a rare source yields 0, a huge
    // one thousands). "Reservoir" here is the distributed determinization:
    // rank docs within each source by the engine-portable multiplicative
    // hash (mod-reduced multiply — overflow-free at any id, the zp_milli
    // fix applied from day one) and keep rank ≤ k. Spark 4's rank-filter
    // pushdown (WindowGroupLimit) keeps only k rows per source per task
    // BEFORE the shuffle, so the exchange carries O(sources × k × tasks),
    // not O(corpus) — the classic streaming-reservoir memory bound,
    // recovered declaratively. Uniformity comes from the hash ordering
    // being independent of position; determinism makes it reproducible
    // and oracle-checkable (a true RNG reservoir is neither).
    QDef(
      "sample_reservoir",
      (s, dir) => {
        val m = 1000000L
        val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("hk"), col("doc_id"))
        T.documents(s, dir)
          .select(col("source"), col("doc_id"),
            (((col("doc_id") % m) * (2654435761L % m)) % m).as("hk"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .where(col("rank") <= 5L)
          .select(col("source"), col("rank"), col("doc_id"), col("hk"))
          .orderBy("source", "rank")
      },
      Some("""SELECT source, rank, doc_id, hk FROM (
             |  SELECT source, doc_id,
             |    ((doc_id % 1000000) * 435761) % 1000000 AS hk,
             |    row_number() OVER (PARTITION BY source
             |      ORDER BY ((doc_id % 1000000) * 435761) % 1000000, doc_id) AS rank
             |  FROM documents)
             |WHERE rank <= 5 ORDER BY source, rank""".stripMargin)),

    // Scalar-subquery filter: rows above the global average — the broadcast-
    // scalar idiom (one-row aggregate broadcast to every partition; no
    // driver round-trip, no collect). Catalyst plans the DataFrame cross
    // join and the SQL scalar subquery identically.
    QDef(
      "filter_subquery",
      (s, dir) => {
        val avgQty = T.lineitem(s, dir).agg(avg("l_quantity").as("avg_qty"))
        T.lineitem(s, dir)
          .crossJoin(broadcast(avgQty))
          .where(col("l_quantity") > col("avg_qty") * 1.9)
          .select("l_orderkey", "l_linenumber", "l_quantity")
          .orderBy("l_orderkey", "l_linenumber", "l_quantity")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity
             |FROM lineitem
             |WHERE l_quantity > (SELECT avg(l_quantity) FROM lineitem) * 1.9
             |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin)),

    // Derived-column projection: the TPC-H net-price arithmetic. Pure
    // per-row IEEE arithmetic evaluates identically in both engines;
    // rounded anyway per SURVEY §7.4.
    QDef(
      "proj_expr",
      (s, dir) =>
        T.lineitem(s, dir)
          .select(
            col("l_orderkey"), col("l_linenumber"),
            rnd(col("l_extendedprice") * (lit(1.0) - col("l_discount")) *
              (lit(1.0) + col("l_tax")), 4).as("net_price"),
            rnd(col("l_extendedprice") * col("l_discount"), 4).as("disc_amount"))
          .orderBy("l_orderkey", "l_linenumber", "net_price", "disc_amount"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  floor((l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)) * 1e4 + 0.5) / 1e4 AS net_price,
             |  floor((l_extendedprice * l_discount) * 1e4 + 0.5) / 1e4 AS disc_amount
             |FROM lineitem ORDER BY l_orderkey, l_linenumber, net_price, disc_amount""".stripMargin)),

    // Conjunctive/disjunctive predicates: AND / OR / NOT / BETWEEN / IN / LIKE.
    QDef(
      "filter_conj",
      (s, dir) =>
        T.lineitem(s, dir)
          .where(
            col("l_returnflag").isin("A", "R") &&
              col("l_quantity").between(10.0, 20.0) &&
              !(col("l_discount") > 0.08) &&
              col("l_linestatus").like("F%"))
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_discount")
          .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_discount"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount
             |FROM lineitem
             |WHERE l_returnflag IN ('A','R')
             |  AND l_quantity BETWEEN 10.0 AND 20.0
             |  AND NOT (l_discount > 0.08)
             |  AND l_linestatus LIKE 'F%'
             |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount""".stripMargin)),

    // Null semantics: IS NULL / IS NOT NULL / null-safe equality.
    // Fixtures are null-free, so nulls are manufactured with nullif.
    QDef(
      "filter_null",
      (s, dir) =>
        T.events(s, dir)
          .withColumn("et", nullif(col("event_type"), lit("click")))
          .where(col("et").isNull || col("et") <=> lit("error"))
          .select(col("event_id"), col("et"),
            col("et").isNotNull.as("has_type"))
          .orderBy("event_id"),
      Some("""SELECT event_id, et, et IS NOT NULL AS has_type
             |FROM (SELECT event_id, nullif(event_type, 'click') AS et FROM events)
             |WHERE et IS NULL OR et IS NOT DISTINCT FROM 'error'
             |ORDER BY event_id""".stripMargin)),

    // Timestamp range predicate [PK: epoch windowing] — half-open [t0, t1).
    QDef(
      "filter_range_ts",
      (s, dir) =>
        T.events(s, dir)
          .where(col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
            col("ts") < lit("2024-01-12 00:00:00").cast("timestamp"))
          .select("event_id", "ts", "event_type")
          .orderBy("event_id"),
      Some("""SELECT event_id, ts, event_type FROM events
             |WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
             |  AND ts < TIMESTAMP '2024-01-12 00:00:00'
             |ORDER BY event_id""".stripMargin))
  )
}
