package graft.operators

import graft.Rnd.rnd
import graft.{QDef, Tables => T}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §2.1 Scans / sources / sinks.
  *
  * Scale notes: parquet scans are the only data entry point (BASELINE.json:7).
  * Catalyst pushes predicates into the scan (row-group skipping via min/max
  * stats) and prunes columns down to the read schema — `scan_prune` exists to
  * keep that guarantee observable in `.explain` (PushedFilters / ReadSchema).
  * At 100 TB the same scans hit a partitioned lake and add partition pruning;
  * nothing in the query code changes.
  */
object Scans {

  /** Per-run tmp path `<tmpdir>/<prefix><applicationId>`, with best-effort
    * GC of STALE siblings ([[graft.FsUtil.sweepStaleTmp]] — dead JVMs'
    * leftovers; a live concurrent run's dir is minutes old and untouched,
    * preserving the concurrent-Verify/Bench isolation the run suffix
    * exists for). */
  private[operators] def runTmpPath(
      s: org.apache.spark.sql.SparkSession, prefix: String): String = {
    graft.FsUtil.sweepStaleTmp(prefix)
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val run = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
    s"${tmp.getPath}/$prefix$run"
  }

  /** [[runTmpPath]] for the commit-log demo tables: the SAME app-stable
    * path, but cleared first, so a repeated invocation (spec analysis
    * passes, bench min-of-2) rebuilds its table from version 1 instead of
    * colliding with the previous run's commits — version files are
    * create-if-absent now, and silently re-binding version N to a fresh
    * overwrite's files is exactly what the atomic log forbids. */
  private[operators] def freshRunTmpPath(
      s: org.apache.spark.sql.SparkSession, prefix: String): String = {
    val p = runTmpPath(s, prefix)
    graft.FsUtil.deleteRecursively(new java.io.File(p))
    p
  }

  private val eventJsonSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private val orderCsvSchema = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType)))

  val defs: Seq[QDef] = Seq(

    // Full-table typed scan over the smallest dim (deterministic, ordered).
    QDef(
      "scan_parquet",
      (s, dir) =>
        T.nation(s, dir).orderBy("n_nationkey"),
      Some("SELECT * FROM nation ORDER BY n_nationkey")),

    // Projection + selective predicate: both must reach the parquet reader
    // (column pruning + predicate pushdown). Total-ordered output.
    QDef(
      "scan_prune",
      (s, dir) =>
        T.lineitem(s, dir)
          .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
          .where(col("l_quantity") < 3.0)
          .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
             |FROM lineitem WHERE l_quantity < 3.0
             |ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate""".stripMargin)),

    // Schema-applied JSON ingestion: events → JSON lines → schema'd read back
    // (spark.read.schema(...).json over a Dataset[String] — the real reader
    // code path, no temp files), then an aggregate proving lossless round-trip.
    QDef(
      "scan_csv_json",
      (s, dir) => {
        val jsonLines = T.events(s, dir)
          .select("event_id", "event_type", "value")
          .toJSON
        s.read.schema(eventJsonSchema).json(jsonLines)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), rnd(sum("value"), 2).as("sum_value"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, count(*) AS n, floor((sum(value)) * 1e2 + 0.5) / 1e2 AS sum_value
             |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin)),

    // Schema-applied CSV ingestion: orders → CSV lines → schema'd read back
    // through the real CSV reader (UnivocityParser) over a Dataset[String],
    // then an aggregate proving the lossless round-trip (double→string uses
    // the shortest round-trippable representation).
    QDef(
      "scan_csv",
      (s, dir) => {
        val lines = T.orders(s, dir)
          .select(concat_ws(",", col("o_orderkey"), col("o_orderstatus"),
            col("o_totalprice")).as("v"))
          .as(org.apache.spark.sql.Encoders.STRING)
        s.read.schema(orderCsvSchema).csv(lines)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), rnd(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n, floor((sum(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // XML round-trip — the third format in the source/sink matrix (Spark 4
    // ships the former spark-xml module in core): orders → row-tagged XML
    // files → SCHEMA'D read-back (explicit schema, same discipline as
    // scan_csv — inference on a typed lake read is a reproducibility bug),
    // then the aggregate proving the typed round-trip. XML is the arrival
    // format of plenty of enterprise/archive feeds (and of astronomy's
    // VOTable catalogs); the lake answer is this exact shape: land it
    // once, convert to parquet, nothing downstream changes.
    QDef(
      "scan_xml",
      (s, dir) => {
        val out = runTmpPath(s, "graft_scan_xml_")
        T.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.mode("overwrite")
          .format("xml").option("rowTag", "row")
          .save(out)
        s.read.schema(orderCsvSchema)
          .format("xml").option("rowTag", "row")
          .load(out)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), rnd(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n, floor((sum(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // Bucketed sink + co-located join: write orders bucketed on o_custkey
    // (8 buckets, sorted), then self-join on the bucket key — Spark reads
    // matching buckets pairwise, so the join needs NO Exchange on either
    // side (the `repartition`/bucketing co-location idiom from the design
    // brief; at 100 TB this is how repeated joins on a fact key amortize
    // their shuffle to a one-time write). In-memory catalog + explicit tmp
    // path: no metastore, no files outside the sandbox.
    QDef(
      "sink_bucketed",
      (s, dir) => {
        // Path + table name carry the applicationId: two concurrent JVMs
        // (e.g. Bench and Verify overlapping) must not clobber each other's
        // sink mid-read.
        val run = s.sparkContext.applicationId.replaceAll("[^A-Za-z0-9]", "_")
        val path = runTmpPath(s, "graft_sink_bucketed_")
        val tbl = s"graft_orders_bucketed_$run"
        s.sql(s"DROP TABLE IF EXISTS $tbl")
        T.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_totalprice")
          .write.mode("overwrite")
          .bucketBy(8, "o_custkey").sortBy("o_custkey")
          .option("path", path)
          .saveAsTable(tbl)
        val t = s.table(tbl)
        val a = t.select(col("o_custkey"), col("o_orderkey").as("k1"))
        val b = t.select(col("o_custkey"), col("o_orderkey").as("k2"))
        // merge hint = the 100 TB plan (broadcast is impossible there);
        // with both sides bucketed on the key, the SMJ runs bucket-to-bucket
        // with zero Exchange in the plan.
        a.join(b.hint("merge"), "o_custkey").where(col("k1") < col("k2"))
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_pairs"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey,
             |  CAST((count(*) * (count(*) - 1)) // 2 AS BIGINT) AS n_pairs
             |FROM orders GROUP BY o_custkey
             |HAVING count(*) >= 2 ORDER BY o_custkey""".stripMargin)),

    // Partitioned sink + partition-pruned read-back: write orders
    // hive-partitioned by o_orderstatus, read back with a partition
    // predicate — the scan must show PartitionFilters (directory pruning,
    // zero I/O on other partitions). This is THE layout decision at 100 TB:
    // a lake partitioned on the dominant filter column turns full scans
    // into single-directory reads; everything downstream is unchanged
    // DataFrame code. Partition column comes back as its own column; the
    // aggregate proves the typed round-trip like the other sink queries.
    QDef(
      "sink_partitioned",
      (s, dir) => {
        val out = runTmpPath(s, "graft_sink_part_")
        T.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .write.mode("overwrite")
          .partitionBy("o_orderstatus")
          .parquet(out)
        s.read.parquet(out)
          .where(col("o_orderstatus") === "F") // → PartitionFilters, pruned dirs
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), rnd(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n,
             |  floor((sum(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total
             |FROM orders WHERE o_orderstatus = 'F'
             |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // NESTED SCHEMA PRUNING — wide structs are how 100 TB curation tables
    // actually ship (a `meta` struct of dozens of provenance fields); a
    // query touching two subfields must NOT decode the rest. Catalyst's
    // nested-schema pruning narrows the parquet ReadSchema to the
    // accessed LEAVES and the nested predicate pushes to the scan — both
    // `require`d in-query on the staged struct table: the untouched
    // subfield's NAME must be absent from the physical plan entirely.
    // Parquet's columnar layout makes this exact: each leaf is its own
    // column chunk, so pruning a subfield skips its bytes on disk.
    QDef(
      "scan_nested_prune",
      (s, dir) => {
        val out = runTmpPath(s, "graft_nested_")
        T.orders(s, dir)
          .select(col("o_orderkey").as("key"),
            struct(
              expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)").as("cents"),
              col("o_orderstatus").as("status"),
              col("o_orderdate").cast("string").as("odate")).as("info"))
          .write.mode("overwrite").parquet(out)
        val df = s.read.parquet(out)
          .where(col("info.status") === "F")
          .groupBy(col("info.status").as("status"))
          .agg(count(lit(1)).as("n"),
            sum(col("info.cents")).cast("long").as("sum_cents"))
          .orderBy("status")
        val p = df.queryExecution.executedPlan.toString
        require(p.contains("ReadSchema") && !p.contains("odate"),
          s"nested pruning lost: the untouched subfield is still read:\n$p")
        require(p.contains("PushedFilters") && p.contains("info.status"),
          s"nested predicate did not reach the scan:\n$p")
        df
      },
      Some("""SELECT o_orderstatus AS status, count(*) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
             |    AS sum_cents
             |FROM orders WHERE o_orderstatus = 'F'
             |GROUP BY o_orderstatus ORDER BY status""".stripMargin)),

    // MALFORMED-ROW HANDLING on ingest (PERMISSIVE / DROPMALFORMED — the
    // CSV reality at crawl scale: some fraction of lines is garbage and
    // the job must COUNT it, route it, and keep going, never die).
    // Deterministic fixture: well-formed lines derived from orders plus a
    // fixed set of poisoned lines (unparsable numerics, wrong arity),
    // staged as text. PERMISSIVE parses what it can and routes the rest
    // to the _corrupt_record column — corrupt count and clean rollup are
    // both declared output; DROPMALFORMED on the same file must yield
    // exactly the clean rows (`require`d). At 100 TB this is one schema'd
    // distributed text scan either way; the corrupt column costs only
    // where rows actually fail.
    QDef(
      "scan_csv_malformed",
      (s, dir) => {
        import org.apache.spark.sql.types._
        val out = runTmpPath(s, "graft_badcsv_")
        val good = T.orders(s, dir)
          .where(col("o_orderkey") % 5L === 0L)
          .select(concat_ws(",", col("o_orderkey"), col("o_orderstatus"),
            expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)")).as("line"))
        val bad = s.range(0L, 7L).select(
          concat(lit("POISON_"), col("id"), lit(",?,not_a_number")).as("line"))
        good.unionAll(bad).write.mode("overwrite").text(out)
        val schema = StructType(Seq(
          StructField("key", LongType), StructField("status", StringType),
          StructField("cents", LongType),
          StructField("_corrupt_record", StringType)))
        val parsed = s.read.schema(schema)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt_record")
          .csv(out)
          .cache() // required: corrupt-record queries need a stable frame
        val nCorrupt = parsed.where(col("_corrupt_record").isNotNull).count()
        // A bare count() over DROPMALFORMED LIES: column pruning hands the
        // parser an empty projection, nothing is validated, and every line
        // counts. Converting to RDD rows forces full-width parsing, so the
        // count reflects what the mode actually admits (a production
        // gotcha worth pinning: drop-rate dashboards built on count() read
        // zero drops forever).
        val dropped = s.read.schema(schema.copy(fields = schema.fields.init))
          .option("mode", "DROPMALFORMED").csv(out).rdd.count()
        val rollup = parsed.where(col("_corrupt_record").isNull)
          .groupBy("status")
          .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("sum_cents"))
        require(dropped == rollup.agg(sum("n")).head.getLong(0),
          "DROPMALFORMED row count diverged from PERMISSIVE's clean rows")
        val res = rollup
          .withColumn("n_corrupt", lit(nCorrupt))
          .orderBy("status")
        parsed.unpersist()
        res
      },
      Some("""SELECT o_orderstatus AS status, count(*) AS n,
             |  CAST(sum(CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)) AS BIGINT)
             |    AS sum_cents,
             |  CAST(7 AS BIGINT) AS n_corrupt
             |FROM orders WHERE o_orderkey % 5 = 0
             |GROUP BY o_orderstatus ORDER BY status""".stripMargin)),

    // DYNAMIC PARTITION OVERWRITE — the lakehouse revision write mode
    // sink_partitioned stops short of: mode("overwrite") with
    // partitionOverwriteMode=dynamic replaces ONLY the partitions the
    // incoming frame touches; static overwrite (the default) would wipe
    // the whole table first. The fixture writes a 4-partition base, then
    // overwrites a revised slice touching partitions {1,2}: the
    // UNTOUCHED partitions must survive with their ORIGINAL FILES —
    // `require`d on the physical file lists, not just row counts (a
    // rewrite-everything implementation could fake the rows but not the
    // files) — and the read-back merges revised and original rows. Per
    // write, not per session: the writer OPTION scopes the mode, nothing
    // leaks. At 100 TB this is the daily-restate pattern: revising two
    // hot days costs two directories of I/O, not a table rewrite, and
    // concurrent readers of untouched partitions never see churn.
    QDef(
      "sink_partition_overwrite",
      (s, dir) => {
        val out = freshRunTmpPath(s, "graft_sink_dpo_")
        val o = T.orders(s, dir)
          .select(col("o_orderkey").as("key"),
            expr("cast(floor(o_totalprice * 1e2 + 0.5) as bigint)").as("cents"),
            (col("o_orderkey") % 4L).as("g"))
        o.write.mode("overwrite").partitionBy("g").parquet(out)
        def filesOf(g: Long): Set[String] = {
          val d = java.nio.file.Paths.get(out, s"g=$g")
          val st = java.nio.file.Files.list(d)
          try {
            import scala.jdk.CollectionConverters._
            st.iterator().asScala.map(_.getFileName.toString)
              .filter(n => n.endsWith(".parquet") && !n.startsWith(".")).toSet
          } finally st.close()
        }
        val before = Map(0L -> filesOf(0L), 1L -> filesOf(1L), 3L -> filesOf(3L))
        // The revision: partitions 1 and 2 restated with corrected cents.
        o.where(col("g").isin(1L, 2L))
          .withColumn("cents", col("cents") + 1000L)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("g").parquet(out)
        // Untouched partitions kept their PHYSICAL files; touched did not.
        require(filesOf(0L) == before(0L) && filesOf(3L) == before(3L),
          "dynamic overwrite rewrote an untouched partition")
        require(filesOf(1L).nonEmpty && filesOf(1L) != before(1L),
          "touched partition must have been replaced with new files")
        s.read.parquet(out)
          .groupBy(col("g").cast("long").as("g"))
          .agg(count(lit(1)).as("n"), sum("cents").cast("long").as("sum_cents"))
          .orderBy("g")
      },
      Some("""SELECT g, count(*) AS n, CAST(sum(cents) AS BIGINT) AS sum_cents
             |FROM (
             |  SELECT o_orderkey % 4 AS g,
             |    CAST(floor(o_totalprice * 1e2 + 0.5) AS BIGINT)
             |      + CASE WHEN o_orderkey % 4 IN (1, 2) THEN 1000 ELSE 0 END
             |      AS cents
             |  FROM orders)
             |GROUP BY g ORDER BY g""".stripMargin)),

    // Parquet schema evolution: two file generations under one root — v=1
    // written before a column existed, v=2 with it — read back with
    // mergeSchema: the unioned schema appears, old rows carry NULL for the
    // new column, and the generation directory becomes a partition column.
    // At 100 TB this is how a lake absorbs schema change without rewriting
    // history; every reader keeps working mid-migration.
    QDef(
      "scan_schema_merge",
      (s, dir) => {
        val base = runTmpPath(s, "graft_evo_")
        val o = T.orders(s, dir)
        o.where(col("o_orderkey") % 2L === 0L)
          .select("o_orderkey", "o_totalprice")
          .write.mode("overwrite").parquet(s"$base/v=1")
        o.where(col("o_orderkey") % 2L =!= 0L)
          .select("o_orderkey", "o_totalprice", "o_orderstatus")
          .write.mode("overwrite").parquet(s"$base/v=2")
        s.read.option("mergeSchema", "true").parquet(base)
          .groupBy(col("v").cast("long").as("v"))
          .agg(count(lit(1)).as("n"),
            count(col("o_orderstatus")).as("n_with_status"),
            rnd(sum("o_totalprice"), 2).as("total"))
          .orderBy("v")
      },
      Some("""SELECT v, count(*) AS n,
             |  count(o_orderstatus) AS n_with_status,
             |  floor((sum(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total
             |FROM (
             |  SELECT CAST(1 AS BIGINT) AS v, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderstatus
             |  FROM orders WHERE o_orderkey % 2 = 0
             |  UNION ALL
             |  SELECT CAST(2 AS BIGINT) AS v, o_totalprice, o_orderstatus
             |  FROM orders WHERE o_orderkey % 2 <> 0)
             |GROUP BY v ORDER BY v""".stripMargin)),

    // Dynamic partition pruning: a partitioned fact joined to a dimension
    // whose filter is NOT on the join key — Catalyst injects a runtime
    // subquery (`dynamicpruning#...` in the scan) that evaluates the dim
    // filter first and prunes fact PARTITIONS before the scan runs. At
    // 100 TB this is the date-dim ⋈ fact pattern: a `WHERE d_year = 2025`
    // on the dimension prunes the fact to one year of directories with no
    // change to the query. PlanShapeSpec asserts the pruning subquery is
    // present.
    QDef(
      "join_dpp",
      (s, dir) => {
        import s.implicits._
        val out = runTmpPath(s, "graft_dpp_fact_")
        T.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
          .write.mode("overwrite")
          .partitionBy("o_orderstatus")
          .parquet(out)
        // The dim must be a real datasource scan: a local Seq relation gets
        // the `label` filter constant-folded into it (ConvertToLocalRelation)
        // and the pruning rule then sees no selective predicate to derive
        // the runtime subquery from.
        val dimPath = runTmpPath(s, "graft_dpp_dim_")
        Seq(("F", "done"), ("O", "open"), ("P", "pending"))
          .toDF("st", "label")
          .write.mode("overwrite").parquet(dimPath)
        val dim = s.read.parquet(dimPath)
        s.read.parquet(out)
          .join(broadcast(dim), col("o_orderstatus") === col("st"))
          .where(col("label") === "done") // dim filter → fact partition pruning
          .groupBy("o_orderpriority")
          .agg(count(lit(1)).as("n"), rnd(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, count(*) AS n,
             |  floor((sum(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total
             |FROM orders WHERE o_orderstatus = 'F'
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // Frames-catalog ingestion [PK: the reference's FITS-frame data model —
    // Spark is the catalog layer, pixels stay out-of-row (SURVEY §1.1)]: a
    // key=value header blob per frame is parsed into a typed catalog table
    // (regexp extract + casts), then aggregated per filter band to prove the
    // typed round-trip. The header strings are synthesized deterministically
    // from `events` (the fixtures carry no frame table); the parse → type →
    // aggregate pipeline is the operator under test, and it is exactly the
    // ingestion a 100 TB frame archive runs per header — narrow, no shuffle
    // until the final tiny per-band aggregate.
    QDef(
      "scan_frames",
      (s, dir) => {
        val hdr = concat(
          lit("FILTER="), col("event_type"),
          lit(";EXPTIME="), ((col("event_id") % 5L + 1L) * 10L).cast("string"),
          lit(";OBJ="), col("user_id").cast("string"))
        val frames = T.events(s, dir)
          .select(col("event_id").as("frame_id"), hdr.as("header"))
        frames
          .select(
            col("frame_id"),
            regexp_extract(col("header"), "FILTER=([a-z]+)", 1).as("filter"),
            regexp_extract(col("header"), "EXPTIME=([0-9]+)", 1)
              .cast("long").as("exptime_s"),
            regexp_extract(col("header"), "OBJ=([0-9]+)", 1)
              .cast("long").as("obj_id"))
          .groupBy("filter")
          .agg(count(lit(1)).as("n_frames"),
            sum(col("exptime_s")).as("total_exptime_s"),
            countDistinct(col("obj_id")).as("n_objects"))
          .orderBy("filter")
      },
      Some("""WITH frames AS (
             |  SELECT event_id AS frame_id,
             |    'FILTER=' || event_type ||
             |    ';EXPTIME=' || CAST((event_id % 5 + 1) * 10 AS VARCHAR) ||
             |    ';OBJ=' || CAST(user_id AS VARCHAR) AS header
             |  FROM events),
             |typed AS (
             |  SELECT frame_id,
             |    regexp_extract(header, 'FILTER=([a-z]+)', 1) AS filter,
             |    CAST(regexp_extract(header, 'EXPTIME=([0-9]+)', 1) AS BIGINT) AS exptime_s,
             |    CAST(regexp_extract(header, 'OBJ=([0-9]+)', 1) AS BIGINT) AS obj_id
             |  FROM frames)
             |SELECT filter, count(*) AS n_frames,
             |  CAST(sum(exptime_s) AS BIGINT) AS total_exptime_s,
             |  count(DISTINCT obj_id) AS n_objects
             |FROM typed GROUP BY filter ORDER BY filter""".stripMargin)),

    // Parquet sink: write → read-back → aggregate. Exercises the writer path
    // inside the query itself (the harness additionally writes every result
    // via Verify). Deterministic single file, then a count by key.
    QDef(
      "sink_parquet",
      (s, dir) => {
        val out = runTmpPath(s, "graft_sink_parquet_")
        T.orders(s, dir)
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
          .coalesce(1)
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .groupBy("o_orderstatus")
          .agg(count(lit(1)).as("n"), rnd(sum("o_totalprice"), 2).as("total"))
          .orderBy("o_orderstatus")
      },
      Some("""SELECT o_orderstatus, count(*) AS n, floor((sum(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total
             |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)),

    // ORC round-trip: write → read-back → project. Second columnar format
    // in the sink/source matrix (same writer/reader contract as parquet;
    // ORC ships in Spark's core jars). The oracle reads the parquet
    // original — equality proves the round-trip is lossless.
    QDef(
      "scan_orc",
      (s, dir) => {
        val out = runTmpPath(s, "graft_sink_orc_")
        T.customer(s, dir)
          .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
          .coalesce(1)
          .write.mode("overwrite").orc(out)
        s.read.orc(out)
          .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
            rnd(col("c_acctbal"), 2).as("acctbal"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey, c_name, c_nationkey,
             |  floor((c_acctbal) * 1e2 + 0.5) / 1e2 AS acctbal
             |FROM customer ORDER BY c_custkey""".stripMargin)),

    // Raw text-line ingestion: the format most LLM corpora arrive in (one
    // document per line, no schema). Write the corpus out as plain text,
    // read it back with the line reader, re-tokenize, and prove the
    // round-trip with order-insensitive corpus aggregates (line order is
    // NOT preserved by a distributed text write, so the proof must not
    // depend on it). Narrow scan → global partial-agg: one tiny shuffle.
    QDef(
      "scan_text",
      (s, dir) => {
        val out = runTmpPath(s, "graft_sink_text_")
        // Parallel write — the round-trip proof below is order-insensitive
        // by construction, so nothing justifies a one-task coalesce here.
        T.documents(s, dir).select("text")
          .write.mode("overwrite").text(out)
        s.read.text(out)
          .select(col("value"),
            size(split(col("value"), " ")).cast("long").as("n_tok"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("n_tok")).as("total_tokens"),
            sum(length(col("value")).cast("long")).as("total_chars"))
      },
      Some("""SELECT count(*) AS n_lines,
             |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
             |  CAST(sum(length(text)) AS BIGINT) AS total_chars
             |FROM documents""".stripMargin)),

    // Z-order clustered sink: interleave the bits of two filter dimensions
    // (customer bucket × epoch-day bucket, 8 bits each) into one sort key,
    // write the fact clustered on it, and read back a 2-D box. Because the
    // z-curve keeps both dimensions locally contiguous, every parquet
    // row-group covers a small rectangle of (x, y) space and its min/max
    // footer stats exclude everything outside the box — multi-dimensional
    // data skipping from a ONE-dimensional sort, the lakehouse layout trick
    // for a fact filtered on two axes at once (a plain sort on x gives
    // skipping on x only). The z value is pure integer bit arithmetic; the
    // clustering is semantics-free, so the oracle is the same box filter
    // over the unclustered original.
    QDef(
      "sink_zorder",
      (s, dir) => {
        val out = runTmpPath(s, "graft_sink_zorder_")
        val bits = (0 until 8).map { i =>
          val p = 1L << i
          expr(s"((x div $p) % 2) * ${1L << (2 * i)} + ((y div $p) % 2) * ${1L << (2 * i + 1)}")
        }.reduce(_ + _)
        T.orders(s, dir)
          .select(col("o_orderkey"), col("o_totalprice"),
            (col("o_custkey") % 256L).as("x"),
            (expr("unix_timestamp(o_orderdate) div 86400") % 256L).as("y"))
          .withColumn("z", bits)
          .repartitionByRange(4, col("z"))
          .sortWithinPartitions("z")
          .write.mode("overwrite").parquet(out)
        s.read.parquet(out)
          .where(col("x").between(32L, 95L) && col("y").between(64L, 159L))
          .agg(count(lit(1)).as("n"),
            rnd(sum(col("o_totalprice")), 2).as("total"),
            countDistinct(col("x")).as("n_x"),
            countDistinct(col("y")).as("n_y"))
      },
      Some("""WITH keyed AS (
             |  SELECT o_orderkey, o_totalprice,
             |    o_custkey % 256 AS x,
             |    (CAST(floor(epoch(o_orderdate)) AS BIGINT) // 86400) % 256 AS y
             |  FROM orders)
             |SELECT count(*) AS n,
             |  floor((sum(o_totalprice)) * 1e2 + 0.5) / 1e2 AS total,
             |  count(DISTINCT x) AS n_x, count(DISTINCT y) AS n_y
             |FROM keyed
             |WHERE x BETWEEN 32 AND 95 AND y BETWEEN 64 AND 159""".stripMargin)),
  )
}
