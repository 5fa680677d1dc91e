package graft.operators

import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.functions._

/** §2.8 Scalar function suites. Row-level, totally ordered, every
  * dialect-divergent function pinned per SURVEY §5.3:
  *   - natural log: Spark `log` ≡ DuckDB `ln` (DuckDB `log` is log10!)
  *   - floor/ceil: Spark returns BIGINT, DuckDB DOUBLE → explicit CAST both
  *   - double→int cast: Spark truncates, DuckDB rounds → trunc() in oracle
  *   - datediff: Spark (end, start) ≡ DuckDB ('day', start, end)
  */
object Scalars {

  val defs: Seq[QDef] = Seq(

    QDef(
      "fn_string",
      (s, dir) =>
        T.part(s, dir)
          .select(
            col("p_partkey"),
            upper(col("p_name")).as("up"),
            lower(col("p_brand")).as("lo"),
            substring(col("p_name"), 1, 3).as("pre3"),
            length(col("p_name")).cast("long").as("len"),
            trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
            regexp_replace(col("p_name"), lit(" "), lit("_")).as("snake"),
            size(split(col("p_name"), " ")).cast("long").as("n_words"),
            regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
            col("p_name").like("%red%").as("is_red"),
            concat_ws("-", col("p_name"), col("p_brand")).as("tagged"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
             |  upper(p_name) AS up,
             |  lower(p_brand) AS lo,
             |  substr(p_name, 1, 3) AS pre3,
             |  length(p_name) AS len,
             |  trim('  ' || p_name || '  ') AS trimmed,
             |  replace(p_name, ' ', '_') AS snake,
             |  len(string_split(p_name, ' ')) AS n_words,
             |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
             |  p_name LIKE '%red%' AS is_red,
             |  p_name || '-' || p_brand AS tagged
             |FROM part ORDER BY p_partkey""".stripMargin)),

    QDef(
      "fn_date",
      (s, dir) =>
        T.orders(s, dir)
          .select(
            col("o_orderkey"),
            year(col("o_orderdate")).cast("long").as("y"),
            month(col("o_orderdate")).cast("long").as("m"),
            dayofmonth(col("o_orderdate")).cast("long").as("d"),
            date_trunc("month", col("o_orderdate")).as("month_start"),
            date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
            datediff(col("o_orderdate").cast("date"),
              lit("1995-01-01").cast("date")).cast("long").as("days_since"),
            unix_timestamp(col("o_orderdate")).as("epoch_sec"),
            date_format(col("o_orderdate"), "yyyy-MM").as("ym"),
            make_date(year(col("o_orderdate")), lit(1), lit(1)).as("year_start"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
             |  year(o_orderdate) AS y,
             |  month(o_orderdate) AS m,
             |  day(o_orderdate) AS d,
             |  date_trunc('month', o_orderdate) AS month_start,
             |  CAST(o_orderdate AS DATE) + 30 AS plus30,
             |  datediff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS days_since,
             |  CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_sec,
             |  strftime(o_orderdate, '%Y-%m') AS ym,
             |  make_date(year(o_orderdate), 1, 1) AS year_start
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    QDef(
      "fn_math",
      (s, dir) =>
        T.customer(s, dir)
          .select(
            col("c_custkey"),
            rnd(abs(col("c_acctbal")), 2).as("abs_bal"),
            rnd(sqrt(abs(col("c_acctbal"))), 6).as("sqrt_bal"),
            pow(lit(2.0), (col("c_custkey") % 10).cast("double")).as("pow2"),
            floor(col("c_acctbal")).cast("long").as("flr"),
            ceil(col("c_acctbal")).cast("long").as("cl"),
            signum(col("c_acctbal")).cast("int").as("sgn"),
            (col("c_custkey") % 7).as("m7"),
            rnd(log(abs(col("c_acctbal")) + 1.0), 6).as("ln_bal"),
            rnd(log10(abs(col("c_acctbal")) + 1.0), 6).as("log10_bal"),
            rnd(exp(col("c_acctbal") / 10000.0), 6).as("exp_bal"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
             |  floor((abs(c_acctbal)) * 1e2 + 0.5) / 1e2 AS abs_bal,
             |  floor((sqrt(abs(c_acctbal))) * 1e6 + 0.5) / 1e6 AS sqrt_bal,
             |  pow(2.0, CAST(c_custkey % 10 AS DOUBLE)) AS pow2,
             |  CAST(floor(c_acctbal) AS BIGINT) AS flr,
             |  CAST(ceil(c_acctbal) AS BIGINT) AS cl,
             |  CAST(sign(c_acctbal) AS INT) AS sgn,
             |  c_custkey % 7 AS m7,
             |  floor((ln(abs(c_acctbal) + 1.0)) * 1e6 + 0.5) / 1e6 AS ln_bal,
             |  floor((log10(abs(c_acctbal) + 1.0)) * 1e6 + 0.5) / 1e6 AS log10_bal,
             |  floor((exp(c_acctbal / 10000.0)) * 1e6 + 0.5) / 1e6 AS exp_bal
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Bitwise suite. Dialect traps pinned: DuckDB `^` is POWER — its xor is
    // the `xor()` function; Spark's `^` is xor. Shifts/and/or/not agree.
    QDef(
      "fn_bitwise",
      (s, dir) =>
        T.events(s, dir)
          .select(
            col("event_id"),
            (col("event_id").bitwiseAND(255L)).as("low8"),
            (col("event_id").bitwiseOR(4096L)).as("or12"),
            (col("event_id").bitwiseXOR(col("user_id").cast("long"))).as("mixed"),
            shiftleft(col("event_id"), 3).cast("long").as("shl3"),
            shiftright(col("event_id"), 2).cast("long").as("shr2"),
            bitwise_not(col("event_id")).as("inv"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  event_id & 255 AS low8,
             |  event_id | 4096 AS or12,
             |  xor(event_id, CAST(user_id AS BIGINT)) AS mixed,
             |  event_id << 3 AS shl3,
             |  event_id >> 2 AS shr2,
             |  ~event_id AS inv
             |FROM events ORDER BY event_id""".stripMargin)),

    QDef(
      "fn_cond",
      (s, dir) =>
        T.events(s, dir)
          .select(
            col("event_id"),
            when(col("value") < 50.0, "low")
              .when(col("value") < 200.0, "mid")
              .otherwise("high").as("tier"),
            coalesce(nullif(col("event_type"), lit("view")), lit("(none)")).as("et"),
            rnd(greatest(col("value"), lit(100.0)), 4).as("hi"),
            rnd(least(col("value"), lit(100.0)), 4).as("lo"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CASE WHEN value < 50.0 THEN 'low'
             |       WHEN value < 200.0 THEN 'mid'
             |       ELSE 'high' END AS tier,
             |  coalesce(nullif(event_type, 'view'), '(none)') AS et,
             |  floor((greatest(value, 100.0)) * 1e4 + 0.5) / 1e4 AS hi,
             |  floor((least(value, 100.0)) * 1e4 + 0.5) / 1e4 AS lo
             |FROM events ORDER BY event_id""".stripMargin)),

    // Array suite over the 64-dim embedding column. Elements are FLOAT →
    // cast to DOUBLE before arithmetic in BOTH engines (float accumulation
    // would diverge; SURVEY §7.4).
    QDef(
      "fn_array",
      (s, dir) =>
        T.embeddings(s, dir)
          .select(
            col("vec_id"),
            size(col("embedding")).cast("long").as("n_dims"),
            rnd(element_at(col("embedding"), 1).cast("double"), 6).as("head"),
            rnd(element_at(col("embedding"), 64).cast("double"), 6).as("last"),
            rnd(element_at(col("embedding"), 1).cast("double") +
                element_at(col("embedding"), 2).cast("double") +
                element_at(col("embedding"), 3).cast("double") +
                element_at(col("embedding"), 4).cast("double"), 6).as("sum4"),
            rnd(array_min(col("embedding")).cast("double"), 6).as("mn"),
            rnd(array_max(col("embedding")).cast("double"), 6).as("mx"))
          .orderBy("vec_id"),
      Some("""SELECT vec_id,
             |  len(embedding) AS n_dims,
             |  floor((CAST(embedding[1] AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS head,
             |  floor((CAST(embedding[64] AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS last,
             |  floor((CAST(embedding[1] AS DOUBLE) + CAST(embedding[2] AS DOUBLE)
             |      + CAST(embedding[3] AS DOUBLE) + CAST(embedding[4] AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS sum4,
             |  floor((CAST(list_min(embedding) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mn,
             |  floor((CAST(list_max(embedding) AS DOUBLE)) * 1e6 + 0.5) / 1e6 AS mx
             |FROM embeddings ORDER BY vec_id""".stripMargin)),

    // Higher-order array functions over an exact-integer array (derived
    // from the row itself, so both engines build identical inputs): lambda
    // transform, predicate filter, existential/universal quantifiers, and a
    // left-fold aggregate. Integer arithmetic end-to-end — fold order can't
    // produce FP divergence, and Spark's higher-order functions stay
    // codegen-adjacent (no UDF, no serialization). The keyed 1-in-101
    // slice proves identical lambda semantics (every arr variant is
    // l_linenumber-derived and present in the slice) without the full
    // corpus riding the determinism sort — bench hygiene, zero coverage
    // loss.
    QDef(
      "fn_higher_order",
      (s, dir) =>
        T.lineitem(s, dir)
          .where(col("l_orderkey") % 101L === 0L)
          .select(col("l_orderkey"), col("l_linenumber"),
            expr("sequence(CAST(1 AS BIGINT), CAST(3 + l_linenumber % 4 AS BIGINT))")
              .as("arr"))
          .select(
            col("l_orderkey"), col("l_linenumber"),
            size(col("arr")).cast("long").as("n"),
            // flattened to strings: the compare must never depend on
            // nested-parquet encodings (same rule as agg_collect_sorted)
            expr("array_join(transform(arr, x -> cast(x * x + 1 AS STRING)), ',')")
              .as("squares"),
            expr("array_join(transform(filter(arr, x -> x % 2 = 0), x -> cast(x AS STRING)), ',')")
              .as("evens"),
            expr("exists(arr, x -> x % 5 = 0)").as("has_mult5"),
            expr("forall(arr, x -> x < 8)").as("all_small"),
            expr("aggregate(arr, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)")
              .as("sumsq"))
          .orderBy("l_orderkey", "l_linenumber", "n"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  len(arr) AS n,
             |  array_to_string(list_transform(arr, x -> x * x + 1), ',') AS squares,
             |  array_to_string(list_filter(arr, x -> x % 2 = 0), ',') AS evens,
             |  len(list_filter(arr, x -> x % 5 = 0)) > 0 AS has_mult5,
             |  len(list_filter(arr, x -> NOT x < 8)) = 0 AS all_small,
             |  CAST(list_sum(list_transform(arr, x -> x * x)) AS BIGINT) AS sumsq
             |FROM (SELECT l_orderkey, l_linenumber,
             |        range(1, 4 + l_linenumber % 4) AS arr
             |      FROM lineitem WHERE l_orderkey % 101 = 0)
             |ORDER BY l_orderkey, l_linenumber, n""".stripMargin)),

    // Boolean aggregates: per-group universal/existential reduction
    // (bool_and / bool_or) — partial-agg friendly single-bit state.
    QDef(
      "agg_bool",
      (s, dir) =>
        T.orders(s, dir)
          .groupBy("o_orderpriority")
          .agg(
            expr("bool_and(o_totalprice > 1000.0)").as("all_over_1k"),
            expr("bool_or(o_orderstatus = 'F')").as("any_finished"),
            count(lit(1)).as("n"))
          .orderBy("o_orderpriority"),
      Some("""SELECT o_orderpriority,
             |  bool_and(o_totalprice > 1000.0) AS all_over_1k,
             |  bool_or(o_orderstatus = 'F') AS any_finished,
             |  count(*) AS n
             |FROM orders GROUP BY o_orderpriority
             |ORDER BY o_orderpriority""".stripMargin)),

    // JSON extraction from the semi-structured `props` column.
    QDef(
      "fn_map_json",
      (s, dir) =>
        T.events(s, dir)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("k"))
          .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
             |FROM events ORDER BY event_id""".stripMargin)),

    // Spark 4 VARIANT for semi-structured data — the current-generation
    // answer to JSON columns (`parse_json` → binary variant encoding,
    // typed `variant_get` path extraction) vs `get_json_object`'s
    // string re-parse per access: the variant is DECODED ONCE and each
    // path access is a typed traversal, which is why lakehouse engines
    // store event payloads as variant at 100 TB. A nested document
    // (object-in-object + array) is built from event fields, parsed to
    // variant, and read back through typed paths: int/string/bigint
    // leaves, an array index, and a MISSING path through
    // `try_variant_get` (null, never error). Type bridges pinned by the
    // oracle: variant_get 'int' ≡ DuckDB CAST(AS INT), 'long' ≡ BIGINT,
    // string leaf extraction unquoted on both engines; doubles stay OUT
    // of the JSON text (integer cents) so no float-format divergence
    // can ride the string. Deterministic: pure row-wise mapping. The
    // keyed 1-in-11 slice exercises every branch (the tag/type variety is
    // event-derived and survives any coprime slice) at a tenth the
    // determinism-sort volume — bench hygiene, zero coverage loss.
    QDef(
      "fn_variant",
      (s, dir) =>
        T.events(s, dir)
          .where(col("event_id") % 11L === 0L)
          .withColumn("j", concat(
            lit("{\"k\":"), get_json_object(col("props"), "$.k"),
            lit(",\"meta\":{\"type\":\""), col("event_type"),
            lit("\",\"cents\":"),
            expr("cast(floor(value * 1e2 + 0.5) as bigint)").cast("string"),
            lit("},\"tags\":["), (col("event_id") % 3L).cast("string"),
            lit(",7]}")))
          .withColumn("v", parse_json(col("j")))
          .select(
            col("event_id"),
            variant_get(col("v"), "$.k", "int").as("k"),
            variant_get(col("v"), "$.meta.type", "string").as("vtype"),
            variant_get(col("v"), "$.meta.cents", "long").as("cents"),
            variant_get(col("v"), "$.tags[0]", "long").as("tag0"),
            try_variant_get(col("v"), "$.missing", "int").as("absent"))
          .orderBy("event_id"),
      Some("""WITH src AS (
             |  SELECT event_id,
             |    '{"k":' || json_extract_string(props, '$.k') ||
             |    ',"meta":{"type":"' || event_type || '","cents":' ||
             |    CAST(CAST(floor(value * 1e2 + 0.5) AS BIGINT) AS VARCHAR) ||
             |    '},"tags":[' || CAST(event_id % 3 AS VARCHAR) || ',7]}' AS j
             |  FROM events WHERE event_id % 11 = 0)
             |SELECT event_id,
             |  CAST(json_extract_string(j, '$.k') AS INT) AS k,
             |  json_extract_string(j, '$.meta.type') AS vtype,
             |  CAST(json_extract_string(j, '$.meta.cents') AS BIGINT) AS cents,
             |  CAST(json_extract_string(j, '$.tags[0]') AS BIGINT) AS tag0,
             |  CAST(json_extract_string(j, '$.missing') AS INT) AS absent
             |FROM src ORDER BY event_id""".stripMargin)),

    // VARIANT SHREDDING — fn_variant's storage half: the variant column's
    // hot paths are materialized ONCE as typed parquet subcolumns
    // ("shredding", the variant storage optimization lakehouse engines
    // apply under Spark 4's VariantType), and the payoff is require'd IN
    // the plan: a comparison predicate on the shredded column reaches the
    // parquet scan as a PushedFilter — impossible through variant_get
    // over the in-row binary, where every row must decode before any
    // filter can run. At 100 TB this is the difference between min/max-
    // pruning the k-subcolumn's row groups and decoding every event
    // payload; the shred is paid once at write time, every query after
    // rides typed columnar storage.
    QDef(
      "fn_variant_shred",
      (s, dir) => {
        val root = Scans.freshRunTmpPath(s, "graft_shred_")
        T.events(s, dir)
          .withColumn("v", parse_json(col("props")))
          .select(col("event_id"), col("event_type"),
            variant_get(col("v"), "$.k", "int").cast("long").as("k"),
            expr("cast(floor(value * 1e2 + 0.5) as bigint)").as("cents"))
          .coalesce(2).write.mode("overwrite").parquet(root)
        val shredded = s.read.parquet(root).where(col("k") >= 50L)
        val plan = shredded.queryExecution.executedPlan.toString
        require(plan.contains("PushedFilters:")
            && plan.contains("GreaterThanOrEqual(k,50"),
          s"shredded-column predicate must push to the parquet scan:\n$plan")
        shredded.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum("k").cast("long").as("sum_k"),
            sum("cents").cast("long").as("sum_cents"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
             |  CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents
             |FROM events
             |WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QDef(
      "fn_cast",
      (s, dir) =>
        T.events(s, dir)
          .select(
            col("event_id"),
            col("event_id").cast("string").as("id_str"),
            col("event_id").cast("string").cast("long").as("id_back"),
            col("value").cast("int").as("v_int"),
            col("ts").cast("date").as("ts_date"),
            col("ts").cast("date").cast("string").as("date_str"),
            (lit("123.5").cast("double") + rnd(col("value"), 2)).as("parsed_plus"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  CAST(event_id AS VARCHAR) AS id_str,
             |  CAST(CAST(event_id AS VARCHAR) AS BIGINT) AS id_back,
             |  CAST(trunc(value) AS INT) AS v_int,
             |  CAST(ts AS DATE) AS ts_date,
             |  CAST(CAST(ts AS DATE) AS VARCHAR) AS date_str,
             |  CAST('123.5' AS DOUBLE) + floor((value) * 1e2 + 0.5) / 1e2 AS parsed_plus
             |FROM events ORDER BY event_id""".stripMargin)),

    // The try_* SAFE-EVALUATION family (ANSI mode's error-absorbing
    // escape hatch — the ingestion-pipeline reality where a poisoned
    // string, a zero divisor, or an overflowing accumulator must become a
    // NULL to count and route, never a job-killing exception 40 TB into a
    // scan): try_cast over four malformation classes (clean round-trip,
    // unparsable, empty string, NULL), try_divide's divide-by-zero → NULL
    // (Spark nulls even the floating-point case, where bare division
    // would produce Infinity), and try_add's Long-overflow → NULL. The
    // oracle reproduces each with TRY_CAST / guarded CASE arithmetic —
    // the overflow lane is expressed as the guard itself, since DuckDB
    // RAISES on BIGINT overflow (the exact failure mode try_add exists to
    // absorb). Overflow survivors are summed as deltas from the base so
    // the SUM cannot itself overflow. All codegen'd expressions — the
    // whole point of try_* over a validating UDF. The keyed 1-in-7 slice
    // keeps every malformation/overflow class (7 is coprime to the mod-4/
    // 5/16 class selectors, so all residues survive) at a seventh the
    // scan — bench hygiene, zero coverage loss.
    QDef(
      "fn_try",
      (s, dir) =>
        T.orders(s, dir)
          .where(col("o_orderkey") % 7L === 0L)
          .select(col("o_orderkey").as("key"),
            expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)").as("cents"))
          .withColumn("m", col("key") % 4L)
          .withColumn("sstr", expr(
            """CASE WHEN key % 4 = 0 THEN CAST(key AS STRING)
              |     WHEN key % 4 = 1 THEN concat('x', key)
              |     WHEN key % 4 = 2 THEN '' ELSE NULL END""".stripMargin))
          .withColumn("parsed", expr("try_cast(sstr AS BIGINT)"))
          .withColumn("d", col("key") % 5L)
          .withColumn("q", expr(
            "try_divide(cast(cents as double), cast(d as double))"))
          .withColumn("added", expr("try_add(9223372036854775800L, key % 16)"))
          .groupBy("m")
          .agg(count(lit(1)).as("n"),
            count(col("parsed")).cast("long").as("n_parsed"),
            coalesce(sum(col("parsed")), lit(0L)).cast("long").as("sum_parsed"),
            count(when(col("d") === 0L, 1)).cast("long").as("n_div_null"),
            rnd(sum(col("q")), 2).as("sum_div"),
            count(when(col("added").isNull, 1)).cast("long").as("n_overflow"),
            sum(col("added") - lit(9223372036854775800L))
              .cast("long").as("sum_add_delta"))
          .orderBy("m"),
      Some("""WITH b AS (
             |  SELECT o_orderkey AS key,
             |    CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents,
             |    o_orderkey % 4 AS m, o_orderkey % 5 AS d, o_orderkey % 16 AS k16,
             |    CASE WHEN o_orderkey % 4 = 0 THEN CAST(o_orderkey AS VARCHAR)
             |         WHEN o_orderkey % 4 = 1 THEN concat('x', o_orderkey)
             |         WHEN o_orderkey % 4 = 2 THEN '' ELSE NULL END AS sstr
             |  FROM orders WHERE o_orderkey % 7 = 0)
             |SELECT m, count(*) AS n,
             |  count(TRY_CAST(sstr AS BIGINT)) AS n_parsed,
             |  CAST(coalesce(sum(TRY_CAST(sstr AS BIGINT)), 0) AS BIGINT) AS sum_parsed,
             |  CAST(sum(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
             |  floor((sum(CASE WHEN d = 0 THEN NULL
             |                  ELSE CAST(cents AS DOUBLE) / d END)) * 1e2 + 0.5) / 1e2
             |    AS sum_div,
             |  CAST(sum(CASE WHEN k16 > 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
             |  CAST(sum(CASE WHEN k16 > 7 THEN NULL ELSE k16 END) AS BIGINT)
             |    AS sum_add_delta
             |FROM b GROUP BY m ORDER BY m""".stripMargin)),

    // Nested struct argmax: per customer, the lexicographically-last
    // (date, price, key) order via max(struct(...)) — PARTIAL-AGGREGATING,
    // so latest-per-key never needs a window shuffle of raw rows (map-side
    // states carry one struct per customer per partition; this is the
    // latest-record-per-entity idiom for CDC/compaction at 100 TB). Oracle
    // expresses the same argmax as DESC-ordered row_number — identical
    // semantics, exercised both ways.
    // CRYPTOGRAPHIC CONTENT HASHES — md5 / sha2-256 as CONTENT ADDRESSES
    // (the dedup-ledger / provenance-manifest primitive: a document's
    // identity across systems is its hash, not its row id). Standard
    // algorithms mean the hex digests are ENGINE-INDEPENDENT by
    // specification — the one family of derived values that transfers
    // between engines bit-for-bit with no rounding discipline at all
    // (contrast every rnd()-guarded double in this inventory). Row-wise,
    // codegen'd, shuffle-free; at 100 TB content addressing runs in the
    // scan stage and only the 16/32-byte digests ever move.
    QDef(
      "fn_hash_crypto",
      (s, dir) =>
        T.documents(s, dir)
          .select(col("doc_id"),
            md5(col("text")).as("md5_hex"),
            sha2(col("text"), 256).as("sha256_hex"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, md5(text) AS md5_hex, sha256(text) AS sha256_hex
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QDef(
      "fn_struct",
      (s, dir) =>
        T.orders(s, dir)
          .groupBy("o_custkey")
          .agg(
            max(struct(
              col("o_orderdate").cast("date").as("d"),
              col("o_totalprice").as("p"),
              col("o_orderkey").as("k"))).as("m"),
            count(lit(1)).as("n_orders"))
          .select(col("o_custkey"),
            col("m.d").as("last_date"),
            rnd(col("m.p"), 2).as("last_price"),
            col("m.k").as("last_key"),
            col("n_orders"))
          .orderBy("o_custkey"),
      Some("""SELECT o_custkey, last_date, last_price, last_key, n_orders
             |FROM (
             |  SELECT o_custkey,
             |    CAST(o_orderdate AS DATE) AS last_date,
             |    floor((o_totalprice) * 1e2 + 0.5) / 1e2 AS last_price,
             |    o_orderkey AS last_key,
             |    count(*) OVER (PARTITION BY o_custkey) AS n_orders,
             |    row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY CAST(o_orderdate AS DATE) DESC, o_totalprice DESC,
             |               o_orderkey DESC) AS rn
             |  FROM orders)
             |WHERE rn = 1 ORDER BY o_custkey""".stripMargin))
  )
}
