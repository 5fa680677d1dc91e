package graft.operators

import graft.functions.{Magnitude, WeightedMean}
import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Encoders

/** §2.11 UDF / UDAF / UDTF surface.
  *
  *  - `udf_scalar`: a REAL custom Catalyst expression ([[Magnitude]], with
  *    codegen) registered into the function registry — not an opaque Scala
  *    UDF — so the plan stays inside WholeStageCodegen. Oracle mirrors the
  *    arithmetic.
  *  - `udaf_typed`: typed [[WeightedMean]] `Aggregator` via `functions.udaf`.
  *  - `udtf_gen`: row→many generation via the built-in `explode` Generator
  *    (SURVEY §2.11: no custom Generator needed for tokenizing).
  */
object Extensibility {

  val defs: Seq[QDef] = Seq(

    QDef(
      "udf_scalar",
      (s, dir) => {
        Magnitude.register(s)
        T.events(s, dir)
          // mag undefined at flux ≤ 0 (same guard as lc_features) — and a
          // live divergence at sf0.1, where a value=0 row appears: DuckDB
          // log10(0) raises, Spark returns null.
          .where(col("value") > 0.0)
          .select(col("event_id"),
            rnd(expr("graft_mag(value)"), 6).as("mag"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, floor((-2.5 * log10(value) + 25.0) * 1e6 + 0.5) / 1e6 AS mag
             |FROM events WHERE value > 0.0 ORDER BY event_id""".stripMargin)),

    QDef(
      "udaf_typed",
      (s, dir) => {
        val wm = udaf(WeightedMean, Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble))
        T.events(s, dir)
          .withColumn("w",
            get_json_object(col("props"), "$.k").cast("double") + 1.0)
          .groupBy("event_type")
          .agg(rnd(wm(col("value"), col("w")), 4).as("wmean"),
            count(lit(1)).as("n"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type,
             |  floor((sum(value * w) / sum(w)) * 1e4 + 0.5) / 1e4 AS wmean,
             |  count(*) AS n
             |FROM (SELECT *,
             |        CAST(json_extract_string(props, '$.k') AS DOUBLE) + 1.0 AS w
             |      FROM events)
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    QDef(
      "udtf_gen",
      (s, dir) =>
        T.documents(s, dir)
          .where(col("doc_id") < 50L)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
          .orderBy("doc_id", "tok"),
      Some("""SELECT doc_id, unnest(string_split(text, ' ')) AS tok
             |FROM documents WHERE doc_id < 50
             |ORDER BY doc_id, tok""".stripMargin)),

    // Custom DataSourceV2 connector ([[graft.sources.FrameCatalogSource]])
    // — the extension surface beyond functions: a library-owned TABLE with
    // real scan planning. The id-range predicate pushes into the
    // connector at PLANNING time, input partitions are planned only for
    // the surviving [lo, hi) window (ids outside it get no partition and
    // no reader — V2SourceSpec counts the readers), and column pruning
    // reaches the row materializer. Every column is pure arithmetic of
    // frame_id, so DuckDB's generate_series reproduces the table exactly;
    // the aggregate sticks to integer-exact columns. The `$"band" === "r"`
    // filter is deliberately NOT pushable: the plan must show it
    // evaluated post-scan while the range disappears into the scan.
    QDef(
      "scan_custom_v2",
      (s, dir) => {
        s.read.format("graft.sources.FrameCatalogSource")
          .option("frames", "100000").option("slice", "8192")
          .load()
          .where(col("frame_id") >= 20000L && col("frame_id") < 60000L)
          .groupBy("band")
          .agg(count(lit(1)).as("n"),
            sum("exptime").as("total_exp"),
            sum("zp_milli").as("sum_zp"),
            min("frame_id").as("first_frame"),
            max("frame_id").as("last_frame"))
          .orderBy("band")
      },
      Some("""SELECT band, count(*) AS n,
             |  CAST(sum(exptime) AS BIGINT) AS total_exp,
             |  CAST(sum(zp_milli) AS BIGINT) AS sum_zp,
             |  min(frame_id) AS first_frame, max(frame_id) AS last_frame
             |FROM (
             |  SELECT i AS frame_id,
             |    ['u', 'g', 'r', 'i', 'z'][CAST(i % 5 AS INT) + 1] AS band,
             |    30 + (i % 7) * 15 AS exptime,
             |    25000 + (i * 2654435761) % 500 AS zp_milli
             |  FROM generate_series(20000, 59999) t(i))
             |GROUP BY band ORDER BY band""".stripMargin)),

    // The connector REPORTS STATISTICS (SupportsReportStatistics,
    // sources/FrameCatalogSource.scala): the estimate reflects the
    // PUSHED-DOWN window — a million-row catalog narrowed to 512 ids
    // reports ~24 KB — so Catalyst broadcasts the V2 side STATICALLY, with
    // no hint. The distinction from AQE's runtime SMJ→BHJ conversion is
    // `require`d on the INITIAL plan (pre-execution): AQE only converts
    // after the fact side's shuffle map stage has been paid; reported
    // stats eliminate that shuffle write entirely, which at 100 TB is the
    // whole cost of joining a big fact to a connector-backed dimension.
    QDef(
      "scan_v2_stats",
      (s, dir) => {
        val dim = s.read.format("graft.sources.FrameCatalogSource")
          .option("frames", "1000000").option("slice", "8192")
          .load()
          .where(col("frame_id") >= 100000L && col("frame_id") < 100512L)
          .select("frame_id", "band", "zp_milli")
        val fact = T.orders(s, dir)
          .select((col("o_orderkey") % 512L + 100000L).as("frame_id"),
            expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)").as("cents"))
        val joined = fact.join(dim, "frame_id") // NO broadcast hint
          .groupBy("band")
          .agg(count(lit(1)).as("n"),
            sum("cents").cast("long").as("sum_cents"),
            sum("zp_milli").cast("long").as("sum_zp"))
          .orderBy("band")
        val p = joined.queryExecution.executedPlan.toString
        require(p.contains("BroadcastHashJoin"),
          s"reported V2 statistics did not drive a STATIC broadcast:\n$p")
        require(p.contains("GraftFrameCatalogScan lo=100000 hi=100512"),
          s"the statistic must be computed over the PUSHED window:\n$p")
        joined
      },
      Some("""WITH f AS (
             |  SELECT i AS frame_id,
             |    ['u', 'g', 'r', 'i', 'z'][CAST(i % 5 AS INT) + 1] AS band,
             |    25000 + (i * 2654435761) % 500 AS zp_milli
             |  FROM generate_series(100000, 100511) t(i)),
             |fact AS (
             |  SELECT o_orderkey % 512 + 100000 AS frame_id,
             |    CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents
             |  FROM orders)
             |SELECT band, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents,
             |  CAST(sum(zp_milli) AS BIGINT) AS sum_zp
             |FROM fact JOIN f USING (frame_id)
             |GROUP BY band ORDER BY band""".stripMargin)),

    // The connector's AGGREGATE pushdown (SupportsPushDownAggregates,
    // sources/FrameCatalogSource.scala): this rollup is answered COMPLETELY
    // by the source — count/min/max per band are interval arithmetic over
    // the pushed [lo, hi) id window (a band is the congruence class
    // id ≡ b mod 5; mjd is monotone in id), so the scan emits ONE ROW PER
    // GROUP and the plan carries NO aggregation operator at all (V2SourceSpec
    // pins ≤ 5 rows materialized and zero HashAggregates). At 100 TB this
    // is the metadata-read path: count(*) answered by the catalog, not by
    // scanning shards. Unsupported shapes (sum over the periodic columns —
    // see scan_custom_v2 — distinct, other group keys) fall back to the
    // row scan with Spark aggregating above.
    QDef(
      "scan_v2_agg",
      (s, dir) => {
        s.read.format("graft.sources.FrameCatalogSource")
          .option("frames", "100000").option("slice", "8192")
          .load()
          .where(col("frame_id") >= 20000L && col("frame_id") < 90000L)
          .groupBy("band")
          .agg(count(lit(1)).as("n_frames"),
            min("frame_id").as("first_frame"),
            max("frame_id").as("last_frame"),
            min("mjd").as("min_mjd"),
            max("mjd").as("max_mjd"))
          .orderBy("band")
      },
      Some("""SELECT band, count(*) AS n_frames,
             |  min(frame_id) AS first_frame, max(frame_id) AS last_frame,
             |  min(mjd) AS min_mjd, max(mjd) AS max_mjd
             |FROM (
             |  SELECT i AS frame_id,
             |    ['u', 'g', 'r', 'i', 'z'][CAST(i % 5 AS INT) + 1] AS band,
             |    60000.0 + CAST(i AS DOUBLE) * 0.02 AS mjd
             |  FROM generate_series(20000, 89999) t(i))
             |GROUP BY band ORDER BY band""".stripMargin)),

    // The connector surface's WRITE half (SupportsWrite / BATCH_WRITE,
    // sources/FrameStoreSink.scala): overwrite one slice of orders into a
    // library-owned V2 table through the full two-phase commit protocol —
    // per-task DataWriters STREAM into staged parquet files, commit
    // messages carry only FILE MANIFESTS (path+rows+bytes, cf. CommitLog's
    // add-actions), and the driver's BatchWrite.commit publishes the
    // manifests atomically, O(tasks) metadata at any data size — then
    // append a second slice through the same protocol, and read the
    // committed snapshot back (BATCH_READ: one input partition per staged
    // file, executor-side parquet re-read) and aggregate. Overwrite
    // arrives as SupportsTruncate (Spark plans OverwriteByExpression),
    // append as AppendData — both V2 write plans, no V1 fallback.
    // FrameStoreSpec pins the protocol itself: nothing visible before
    // commit, abort deletes the staging, truncate swaps atomically, no
    // InternalRow can ride a commit message, and append schema drift
    // fails the commit. The cents fixed-point keeps the sum
    // integer-exact across engines.
    QDef(
      "sink_custom_v2",
      (s, dir) => {
        val t = "sink_custom_v2_tbl"
        def slice(rem: Long) = T.orders(s, dir)
          .where(col("o_orderkey") % 5L === rem)
          .select(col("o_orderkey").as("key"), col("o_custkey").as("cust"),
            expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)").as("cents"))
        slice(1L).write.format("graft.sources.FrameStoreSink")
          .option("table", t).mode("overwrite").save()
        slice(2L).write.format("graft.sources.FrameStoreSink")
          .option("table", t).mode("append").save()
        s.read.format("graft.sources.FrameStoreSink").option("table", t).load()
          .groupBy((col("key") % 10L).as("bucket"))
          .agg(count(lit(1)).as("n"),
            sum("cents").cast("long").as("sum_cents"),
            countDistinct("cust").cast("long").as("n_cust"))
          .orderBy("bucket")
      },
      Some("""SELECT o_orderkey % 10 AS bucket, count(*) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT) AS sum_cents,
             |  count(DISTINCT o_custkey) AS n_cust
             |FROM orders WHERE o_orderkey % 5 IN (1, 2)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // STORAGE-PARTITIONED execution (SupportsReportPartitioning +
    // HasPartitionKey): with `partition_by=band` the connector plans one
    // input partition per band and REPORTS KeyGroupedPartitioning(band),
    // so the band-keyed aggregation runs with NO exchange above the scan
    // (V2SourceSpec pins zero hashpartitioning exchanges below the sort)
    // — the Iceberg/Hive-bucketing path where the store's layout replaces
    // the shuffle. The sums here are over the PERIODIC columns, which the
    // aggregate pushdown deliberately rejects (no closed form), so this
    // is Spark's own aggregation made shuffle-free by layout, not the
    // metadata answer scan_v2_agg demonstrates. Composes with filter
    // pushdown: each band partition enumerates its congruence class
    // inside the pushed [lo, hi) window only. At 100 TB: "already
    // partitioned how you need — don't move the table to prove it."
    QDef(
      "scan_v2_spj",
      (s, dir) => {
        s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        s.read.format("graft.sources.FrameCatalogSource")
          .option("frames", "100000").option("partition_by", "band")
          .load()
          .where(col("frame_id") >= 10000L && col("frame_id") < 70000L)
          .groupBy("band")
          .agg(count(lit(1)).as("n"),
            sum("exptime").cast("long").as("sum_exp"),
            sum("zp_milli").cast("long").as("sum_zp"))
          .orderBy("band")
      },
      Some("""SELECT band, count(*) AS n,
             |  CAST(sum(exptime) AS BIGINT) AS sum_exp,
             |  CAST(sum(zp_milli) AS BIGINT) AS sum_zp
             |FROM (
             |  SELECT ['u', 'g', 'r', 'i', 'z'][CAST(i % 5 AS INT) + 1] AS band,
             |    30 + (i % 7) * 15 AS exptime,
             |    25000 + (i * 2654435761) % 500 AS zp_milli
             |  FROM generate_series(10000, 69999) t(i))
             |GROUP BY band ORDER BY band""".stripMargin)),

    // STORAGE-PARTITIONED JOIN — the mechanism scan_v2_spj demonstrates
    // for aggregation, applied to its headline use: two co-partitioned
    // banded scans (different pushed windows) join on (band, frame_id)
    // with NO exchange below the join on either side — the join keys
    // cover the reported partition key, so Catalyst matches the two
    // KeyGroupedPartitionings partition-for-partition (Iceberg's SPJ).
    // At 100 TB this is the fact-to-fact join that bucketing exists for:
    // neither table moves. The overlap window (ids in both [10k,40k) and
    // [20k,60k)) makes the join selective and the per-band rollup
    // oracle-exact over the periodic columns.
    QDef(
      "join_spj",
      (s, dir) => {
        s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
        // The join clusters on (band, frame_id) ⊋ the reported partition
        // key (band); clustering by a coarser key still co-locates every
        // matching pair, so relax the exact-match requirement and let the
        // two KeyGroupedPartitionings align partition-for-partition.
        s.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
        def side(lo: Long, hi: Long) =
          s.read.format("graft.sources.FrameCatalogSource")
            .option("frames", "100000").option("partition_by", "band").load()
            .where(col("frame_id") >= lo && col("frame_id") < hi)
        val l = side(10000L, 40000L)
          .select(col("band"), col("frame_id"), col("exptime"))
        val r = side(20000L, 60000L)
          .select(col("band").as("band2"), col("frame_id").as("fid2"),
            col("zp_milli"))
        l.join(r, col("band") === col("band2") && col("frame_id") === col("fid2"))
          .groupBy("band")
          .agg(count(lit(1)).as("n"),
            sum("exptime").cast("long").as("sum_exp"),
            sum("zp_milli").cast("long").as("sum_zp"))
          .orderBy("band")
      },
      Some("""SELECT band, count(*) AS n,
             |  CAST(sum(exptime) AS BIGINT) AS sum_exp,
             |  CAST(sum(zp_milli) AS BIGINT) AS sum_zp
             |FROM (
             |  SELECT ['u', 'g', 'r', 'i', 'z'][CAST(i % 5 AS INT) + 1] AS band,
             |    30 + (i % 7) * 15 AS exptime,
             |    25000 + (i * 2654435761) % 500 AS zp_milli
             |  FROM generate_series(20000, 39999) t(i))
             |GROUP BY band ORDER BY band""".stripMargin)),

    // RUNTIME V2 filtering (SupportsRuntimeV2Filtering) — dynamic
    // partition pruning for the custom store, the V2 analog of join_dpp's
    // parquet path and the last cell of the connector pushdown matrix
    // (static filter / column / aggregate / reported partitioning / SPJ /
    // write / runtime filter). The calibration dim is tiny and FILTERED;
    // Spark broadcasts it, re-uses the broadcast as a dynamic-pruning
    // subquery, and delivers the surviving join keys to the scan as a
    // runtime IN predicate — the scan then re-plans and reads ONLY the
    // id-slices containing a calibration frame (4 of ~49; V2SourceSpec
    // pins the reader count). Static pushdown prunes by what the query
    // says, runtime filtering by what the DATA says: at 100 TB this is
    // "scan the slices the dim actually touches", decided at execution
    // time with zero query-code changes.
    QDef(
      "scan_v2_runtime_filter",
      (s, dir) => {
        import s.implicits._
        // The dim must survive as a SCAN with a selective filter for the
        // pruning rule to pattern-match — a local Seq would constant-fold
        // to a LocalRelation and DPP would never inject (measured). The
        // parquet staging is the same fixture discipline as join_dpp.
        val dimPath = Scans.runTmpPath(s, "graft_rtf_dim_")
        (1L to 8L).map(k => (k * 11111L, k % 2L)).toDF("cal_id", "rig")
          .coalesce(1).write.mode("overwrite").parquet(dimPath)
        val cal = s.read.parquet(dimPath).where(col("rig") === 0L)
        val frames = s.read.format("graft.sources.FrameCatalogSource")
          .option("frames", "100000").option("slice", "2048").load()
        frames
          .join(broadcast(cal), col("frame_id") === col("cal_id"))
          .select(col("frame_id"), col("band"), col("exptime"))
          .orderBy("frame_id")
      },
      Some("""SELECT i AS frame_id,
             |  ['u', 'g', 'r', 'i', 'z'][CAST(i % 5 AS INT) + 1] AS band,
             |  30 + (i % 7) * 15 AS exptime
             |FROM generate_series(0, 99999) t(i)
             |WHERE i IN (22222, 44444, 66666, 88888)
             |ORDER BY i""".stripMargin)),

    // LIMIT / TOP-N pushdown (SupportsPushDownLimit / SupportsPushDownTopN)
    // — the last two cells of the connector pushdown matrix. Ids enumerate
    // in order inside the pushed window, so the store answers both shapes
    // COMPLETELY: LIMIT k plans ONE partition holding the window's first k
    // ids, and ORDER BY frame_id DESC LIMIT k plans one partition walking
    // the window's TAIL — Catalyst drops its Sort and Limit operators
    // entirely (isPartiallyPushed = false; V2SourceSpec pins one reader,
    // k rows materialized, and a Sort-free plan). At 100 TB this is the
    // difference between a LIMIT-10 preview opening one shard and stopping,
    // versus a cluster-wide scan feeding a global sort. The head side also
    // composes with filter pushdown (the >= 1000 range narrows the window
    // first); the unpushable band predicate demo stays with scan_custom_v2.
    QDef(
      "scan_v2_limit",
      (s, dir) => {
        def base = s.read.format("graft.sources.FrameCatalogSource")
          .option("frames", "100000").option("slice", "8192").load()
        val head = base.where(col("frame_id") >= 1000L)
          .orderBy("frame_id").limit(7)
        val tail = base.orderBy(col("frame_id").desc).limit(7)
        def shaped(df: org.apache.spark.sql.DataFrame, side: String) =
          df.select(lit(side).as("side"), col("frame_id"), col("band"),
            col("exptime"), col("zp_milli"))
        shaped(head, "head").unionAll(shaped(tail, "tail"))
          .orderBy("side", "frame_id")
      },
      Some("""WITH t AS (
             |  SELECT i AS frame_id,
             |    ['u', 'g', 'r', 'i', 'z'][CAST(i % 5 AS INT) + 1] AS band,
             |    30 + (i % 7) * 15 AS exptime,
             |    25000 + (i * 2654435761) % 500 AS zp_milli
             |  FROM generate_series(0, 99999) t(i))
             |SELECT 'head' AS side, frame_id, band, exptime, zp_milli
             |FROM t WHERE frame_id BETWEEN 1000 AND 1006
             |UNION ALL
             |SELECT 'tail', frame_id, band, exptime, zp_milli
             |FROM t WHERE frame_id >= 99993
             |ORDER BY side, frame_id""".stripMargin)),

    // OFFSET pushdown (SupportsPushDownOffset) — pagination, completing
    // the LIMIT/TOP-N family: OFFSET m skips the window's first m ids
    // (asc) or its top m (desc) by INTERVAL ARITHMETIC before the limit
    // applies, so a "page 3" read plans one partition holding exactly
    // that page's ids — no row is ever materialized for the skipped
    // prefix, and the Sort/Limit/Offset operators all vanish from the
    // plan. The production shape for cursor-style catalog pagination:
    // page N of a 100 TB listing costs the same as page 1.
    QDef(
      "scan_v2_offset",
      (s, dir) => {
        def base = s.read.format("graft.sources.FrameCatalogSource")
          .option("frames", "100000").option("slice", "8192").load()
        val page = base.where(col("frame_id") >= 1000L)
          .orderBy("frame_id").offset(14).limit(7)
        val tail = base.orderBy(col("frame_id").desc).offset(3).limit(5)
        def shaped(df: org.apache.spark.sql.DataFrame, side: String) =
          df.select(lit(side).as("side"), col("frame_id"), col("band"),
            col("exptime"))
        shaped(page, "page3").unionAll(shaped(tail, "tail"))
          .orderBy("side", "frame_id")
      },
      Some("""WITH t AS (
             |  SELECT i AS frame_id,
             |    ['u', 'g', 'r', 'i', 'z'][CAST(i % 5 AS INT) + 1] AS band,
             |    30 + (i % 7) * 15 AS exptime
             |  FROM generate_series(0, 99999) t(i))
             |SELECT 'page3' AS side, frame_id, band, exptime
             |FROM t WHERE frame_id BETWEEN 1014 AND 1020
             |UNION ALL
             |SELECT 'tail', frame_id, band, exptime
             |FROM t WHERE frame_id BETWEEN 99992 AND 99996
             |ORDER BY side, frame_id""".stripMargin)),

    // The connector's STREAMING read path (MicroBatchStream on
    // FrameCatalogSource — sources/FrameCatalogSource.scala): the catalog
    // is TAILED as an arriving-frames stream. Offsets are frame-id
    // watermarks (O(1) checkpoint metadata), admission control
    // (SupportsAdmissionControl, `arrive` ids per batch) paces the drain
    // — the rate-limit contract maxFilesPerTrigger implements on the
    // file source — and each batch's planInputPartitions slices its id
    // range with the SAME slice geometry and reader factory as the batch
    // scan: one row-materialization code path, queried or tailed.
    // Trigger.AvailableNow drains in ceil(window/arrive) batches and
    // stops; the multi-batch execution is require'd from the query's own
    // progress (5 non-empty batches for 40960/8192 — one batch would mean
    // admission control never engaged). Streamed rows re-aggregate
    // batch-side into the declared oracle-checked rollup; StreamingSpec
    // pins streamed ≡ batch row-identically over the same window. A
    // connector that can only be queried is half a connector at 100 TB —
    // this is the other half: CDC-style tailing with bounded per-batch
    // work and restart-stable id offsets.
    QDef(
      "scan_v2_stream",
      (s, dir) => graft.streaming.StreamRunner.frameCatalogStream(s, dir),
      Some("""SELECT band, count(*) AS n,
             |  CAST(sum(exptime) AS BIGINT) AS total_exp,
             |  CAST(sum(zp_milli) AS BIGINT) AS sum_zp,
             |  min(frame_id) AS first_frame, max(frame_id) AS last_frame
             |FROM (
             |  SELECT i AS frame_id,
             |    ['u', 'g', 'r', 'i', 'z'][CAST(i % 5 AS INT) + 1] AS band,
             |    30 + (i % 7) * 15 AS exptime,
             |    25000 + (i * 2654435761) % 500 AS zp_milli
             |  FROM generate_series(0, 40959) t(i))
             |GROUP BY band ORDER BY band""".stripMargin)),

    // The connector's STREAMING write half (StreamingWrite on
    // FrameStoreSink, log-backed mode): writeStream.format(...) commits
    // each micro-batch as one txn-stamped log version — per-epoch
    // staging under root/stage-x/e<epoch>/, version = epochId + 1, txn
    // marker <queryId>/<epochId> in the commitInfo. A replayed epoch
    // (at-least-once re-delivery after recovery; the queryId is stable
    // across restarts via the checkpoint) finds its version committed
    // with ITS txn and no-ops, dropping the duplicate staging; a version
    // held by a FOREIGN txn fails loudly. This is stream_exactly_once's
    // recipe promoted from foreachBatch user code to the connector
    // surface — exactly-once streaming ingest for free behind the V2
    // API, with the table readable and time-travelable mid-stream.
    // In-query requires pin one version per non-empty batch + txn on
    // every commit; the declared read drives the V2 READ path over the
    // committed snapshot and must hash-match the batch oracle (a
    // duplicated or dropped epoch cannot). FrameStoreSpec drives the
    // replay and foreign-writer branches directly.
    QDef(
      "sink_v2_stream",
      (s, dir) => graft.streaming.StreamRunner.v2LogStreamingSink(s, dir),
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // The V2 write protocol UNIFIED with the transaction log: the same
    // two-phase executor-staged parquet write as sink_custom_v2, but
    // phase two publishes an atomic CommitLog version instead of an
    // in-memory manifest swap (option("root", dir) — staging lives at
    // root/stage-<uuid>/, invisible until committed because the LOG is
    // authoritative, vacuum-reclaimable if the job dies). A V2-written
    // table is thereby a first-class log table: v1 and v2 are appends
    // (adds only), v3 arrives as OverwriteByExpression → SupportsTruncate
    // and commits adds + removes-of-previous-snapshot in ONE action list.
    // The declared read drives the V2 READ path time-travelling all three
    // versions (option("asOf", v) resolves the snapshot from the log at
    // scan planning — the v2 read must see BOTH appends, the v3 read only
    // the rewrite), and the in-query requires pin that the overwrite
    // tombstoned rather than deleted (retention-window vacuum removes 0)
    // — the reader-isolation property the in-memory store now shares.
    // At 100 TB: streaming/batch V2 writers and the maintenance family
    // (restore, optimize, clone, vacuum) finally share ONE commit
    // protocol, so a connector write is time-travelable like any table.
    QDef(
      "sink_v2_log",
      (s, dir) => {
        import graft.sources.CommitLog
        val root = Scans.freshRunTmpPath(s, "graft_v2log_")
        val t = "sink_v2_log_tbl"
        def write(df: org.apache.spark.sql.DataFrame, mode: String) =
          df.write.format("graft.sources.FrameStoreSink")
            .option("table", t).option("root", root).mode(mode).save()
        def slice(m: Long, rem: Long) = T.orders(s, dir)
          .where(col("o_orderkey") % m === rem)
          .select(col("o_orderkey").as("key"),
            expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)").as("cents"))
        write(slice(4L, 1L), "append")    // v1: base append
        write(slice(4L, 2L), "append")    // v2: second append (adds only)
        write(T.orders(s, dir).where(col("o_orderkey") % 8L === 3L)
          .select(col("o_orderkey").as("key"),
            expr("cast(floor((o_totalprice * 0.5) * 1e2 + 0.5) as bigint)")
              .as("cents")), "overwrite") // v3: truncate = adds + removes
        require(CommitLog.latestVersion(root) == 3L,
          s"expected 3 committed versions, log says ${CommitLog.latestVersion(root)}")
        // The overwrite TOMBSTONED v2's files: a retention-window vacuum
        // must keep them all (in-flight readers of older snapshots still
        // resolve), and the live set is exactly v3's.
        val (kept, removed) = CommitLog.vacuum(root, retainVersions = 10L)
        require(removed == 0L,
          s"retention-window vacuum reclaimed $removed file(s) of a live history")
        require(kept == CommitLog.filesAsOf(root, 3L).size.toLong,
          "vacuum's live count must match the current snapshot")
        def asOf(v: Long) = s.read.format("graft.sources.FrameStoreSink")
          .option("table", t).option("root", root)
          .option("asOf", v.toString).load()
          .agg(count(lit(1)).as("n"),
            sum("key").cast("long").as("sum_key"),
            sum("cents").cast("long").as("sum_cents"))
          .select(lit(v).as("as_of"), col("n"), col("sum_key"), col("sum_cents"))
        asOf(1L).unionAll(asOf(2L)).unionAll(asOf(3L)).orderBy("as_of")
      },
      Some("""WITH g1 AS (
             |  SELECT o_orderkey AS key,
             |    CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents
             |  FROM orders WHERE o_orderkey % 4 = 1),
             |g2 AS (
             |  SELECT o_orderkey AS key,
             |    CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT) AS cents
             |  FROM orders WHERE o_orderkey % 4 = 2),
             |g3 AS (
             |  SELECT o_orderkey AS key,
             |    CAST(floor((o_totalprice * 0.5) * 1e2 + 0.5) AS BIGINT) AS cents
             |  FROM orders WHERE o_orderkey % 8 = 3)
             |SELECT CAST(1 AS BIGINT) AS as_of, count(*) AS n,
             |  CAST(sum(key) AS BIGINT) AS sum_key,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM g1
             |UNION ALL
             |SELECT CAST(2 AS BIGINT), count(*), CAST(sum(key) AS BIGINT),
             |  CAST(sum(cents) AS BIGINT)
             |FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
             |UNION ALL
             |SELECT CAST(3 AS BIGINT), count(*), CAST(sum(key) AS BIGINT),
             |  CAST(sum(cents) AS BIGINT)
             |FROM g3
             |ORDER BY as_of""".stripMargin)),

    // RECURSIVE CTE — Spark 4's `WITH RECURSIVE` (SQL:1999 linear
    // recursion, the ANSI answer to hierarchical queries / CONNECT BY):
    // a deterministic forest over customer (parent(k) = k div 2, root 1 —
    // every key's parent chain reaches the root, so the walk covers the
    // table) traversed top-down, depth and balance rolled up per level.
    // The engine compiles the recursion to a UnionLoop: each iteration
    // joins ONLY the previous frontier (linear recursion — the working
    // set is one level, never the accumulated closure), and iteration
    // count is the hierarchy DEPTH — log₂(keys) here, so a 100 TB
    // dimension hierarchy walks in ~40 frontier joins, each one
    // broadcast-able when the frontier is small. The same SQL (modulo the
    // div spelling) runs on DuckDB — recursion as a portable query
    // surface rather than a hand-rolled driver loop (the graph_* family
    // shows the loop form; this shows the declarative one).
    QDef(
      "sql_recursive_cte",
      (s, dir) => {
        T.customer(s, dir).createOrReplaceTempView("graft_rcte_customer")
        s.sql(
          """WITH RECURSIVE h(key, cents, depth) AS (
            |  SELECT c_custkey, CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT), 0
            |  FROM graft_rcte_customer WHERE c_custkey = 1
            |  UNION ALL
            |  SELECT c.c_custkey, CAST(floor(c.c_acctbal * 1e2 + 0.5) AS BIGINT),
            |    h.depth + 1
            |  FROM graft_rcte_customer c JOIN h ON c.c_custkey div 2 = h.key)
            |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_nodes,
            |  CAST(sum(key) AS BIGINT) AS sum_key,
            |  CAST(max(key) AS BIGINT) AS max_key,
            |  CAST(sum(cents) AS BIGINT) AS sum_cents
            |FROM h GROUP BY depth ORDER BY depth""".stripMargin)
      },
      Some("""WITH RECURSIVE h(key, cents, depth) AS (
             |  SELECT c_custkey, CAST(floor(c_acctbal * 1e2 + 0.5) AS BIGINT), 0
             |  FROM customer WHERE c_custkey = 1
             |  UNION ALL
             |  SELECT c.c_custkey, CAST(floor(c.c_acctbal * 1e2 + 0.5) AS BIGINT),
             |    h.depth + 1
             |  FROM customer c JOIN h ON c.c_custkey // 2 = h.key)
             |SELECT CAST(depth AS BIGINT) AS depth, count(*) AS n_nodes,
             |  CAST(sum(key) AS BIGINT) AS sum_key,
             |  CAST(max(key) AS BIGINT) AS max_key,
             |  CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM h GROUP BY depth ORDER BY depth""".stripMargin)),

    // CUSTOM OPTIMIZER RULE — the THIRD extension tier (expressions:
    // udf_scalar; connectors: scan_custom_v2; now plan rewrites):
    // graft.plans.MagSargRewrite turns the native-expression predicate
    // `graft_mag(value) < 20.3` — which no source-filter API can push —
    // into the equivalent sargable `value > 10^((25−20.3)/2.5)`, and the
    // payoff is `require`d IN the plan: the rewritten comparison reaches
    // the parquet scan as a PushedFilter (GreaterThan(value, …)), which
    // the magnitude form can never do. Equivalence on the full domain
    // (0 → +∞, negative → NaN, NULL — all fail both forms) is re-proved
    // by oracle parity at every scale: DuckDB evaluates the ORIGINAL
    // magnitude predicate, so a wrong rewrite boundary hash-mismatches.
    // At 100 TB the rule moves the filter from the compute tier (decode
    // every value, evaluate codegen'd log10) to the scan's min/max row-
    // group statistics — the entire point of sargability.
    QDef(
      "opt_sarg_rewrite",
      (s, dir) => {
        Magnitude.register(s)
        graft.plans.MagSargRewrite.install(s)
        val df = T.events(s, dir)
          .where(expr("graft_mag(value)") < lit(20.3))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(expr("cast(floor(value * 1e2 + 0.5) as bigint)"))
              .cast("long").as("sum_cents"))
          .orderBy("event_type")
        val p = df.queryExecution.executedPlan.toString
        require(p.contains("PushedFilters") && p.contains("GreaterThan(value"),
          s"the sargable rewrite did not reach the scan as a pushed filter:\n$p")
        df
      },
      Some("""SELECT event_type, count(*) AS n,
             |  CAST(sum(CAST(floor(value * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM events
             |WHERE value > 0 AND -2.5 * log10(value) + 25.0 < 20.3
             |GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // STATS-DRIVEN BROADCAST — the CBO loop closed through the optimizer-
    // rule tier (plans/StatsBroadcast.scala, injected like MagSargRewrite):
    // the engine PRODUCES statistics (`table_stats`/`table_histogram`) but
    // until this tier nothing consumed them. Spark's size-only estimator
    // carries a scan's FULL file bytes through a Filter, so an equality-
    // filtered slice of a large dimension plans as a shuffle join even
    // when the matching bucket is tiny — the classic missed broadcast.
    // Here an ANALYZE pass registers per-bucket counts + average row
    // width; the rule bounds the filtered side at rows(bucket)×width and,
    // when the bound clears autoBroadcastJoinThreshold, sets the
    // broadcast strategy on the Join hint — derived from statistics, with
    // NO hint anywhere in the query. Both directions are require'd
    // in-query on INITIAL plans (before AQE could convert anything at
    // runtime): a control session WITHOUT the rule plans the shuffle
    // join; the rule session plans BroadcastHashJoin. The threshold is
    // set to half the dimension's real staged bytes, so the native
    // size-only path can never broadcast it at any fixture scale — only
    // the stats can. At 100 TB the stakes are one full shuffle of the
    // fact table per missed broadcast; the bound is exact counts × real
    // width, so the flip is as safe as the same-size user hint.
    QDef(
      "opt_stats_broadcast",
      (s, dir) => {
        val root = Scans.freshRunTmpPath(s, "graft_cbo_")
        val dimPath = s"$root/g=1"
        T.orders(s, dir)
          .select(col("o_orderkey").as("key"),
            (col("o_orderkey") % 16L).as("b"),
            col("o_custkey").as("cust"))
          .coalesce(2).write.mode("overwrite").parquet(dimPath)
        // ANALYZE: one distributed pass → per-bucket counts (O(buckets)
        // driver-side); row width from the staged footprint.
        val counts = s.read.parquet(dimPath).groupBy("b").count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
        val totalRows = counts.values.sum
        val bytes = {
          import scala.jdk.CollectionConverters._
          val st = java.nio.file.Files.list(java.nio.file.Paths.get(dimPath))
          try st.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet"))
            .map(java.nio.file.Files.size).sum
          finally st.close()
        }
        val avg = math.max(1L, bytes / math.max(1L, totalRows))
        def joined(sx: org.apache.spark.sql.SparkSession) = {
          sx.conf.set("spark.sql.autoBroadcastJoinThreshold",
            (bytes / 2L).toString)
          val fact = T.orders(sx, dir)
            .select(col("o_orderkey").as("key"),
              expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)").as("cents"))
          val dim = sx.read.parquet(dimPath).where(col("b") === 7L)
          fact.join(dim, "key") // NO hint anywhere
            .agg(count(lit(1)).as("n"),
              sum("cents").cast("long").as("sum_cents"),
              sum("cust").cast("long").as("sum_cust"))
            .select(lit(7L).as("bucket"), col("n"), col("sum_cents"),
              col("sum_cust"))
        }
        // Control: same query, same threshold, NO STATS REGISTERED — the
        // rule (present in extension-built sessions) must change nothing
        // without an artifact, and the size-only estimator must plan the
        // shuffle join (proving the stats, not the sizes, drive the flip).
        val p0 = joined(s.newSession()).queryExecution.executedPlan.toString
        require(!p0.contains("BroadcastHashJoin"),
          s"control plan must not broadcast on size-only estimates:\n$p0")
        // ANALYZE published: the artifact bounds the b=7 slice under the
        // threshold → STATIC BroadcastHashJoin, no hint.
        graft.plans.TableStatsRegistry.register(dimPath,
          graft.plans.TableStatsRegistry.Artifact("b", counts, avg))
        val s2 = s.newSession()
        graft.plans.StatsBroadcastRule.install(s2)
        val df = joined(s2)
        val p = df.queryExecution.executedPlan.toString
        require(p.contains("BroadcastHashJoin"),
          s"engine statistics did not drive the broadcast flip:\n$p")
        // Soundness guard: the SAME equality under an OR does not bound
        // the side (`b = 7 OR key > 0` can emit the whole dimension), so
        // the rule must bail — a bucket equality only counts when it is a
        // top-level conjunct of the filter. Plan-only probe, no job runs.
        // (The probe aggregates every dim column so column pruning cannot
        // shrink the size-only estimate under the threshold — the flip, if
        // any, can only come from the stats rule.)
        val dimOr = s2.read.parquet(dimPath)
          .where(col("b") === 7L || col("key") > 0L)
        val pOr = T.orders(s2, dir).select(col("o_orderkey").as("key"))
          .join(dimOr, "key")
          .agg(count(lit(1)).as("n"), sum("b").as("sb"), sum("cust").as("sc"))
          .queryExecution.executedPlan.toString
        graft.plans.TableStatsRegistry.unregister(dimPath)
        require(!pOr.contains("BroadcastHashJoin"),
          s"a disjunctive filter must not be bounded by one arm's bucket:\n$pOr")
        df
      },
      Some("""SELECT CAST(7 AS BIGINT) AS bucket, count(*) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
             |    AS sum_cents,
             |  CAST(sum(o_custkey) AS BIGINT) AS sum_cust
             |FROM orders WHERE o_orderkey % 16 = 7""".stripMargin))
  )
}
