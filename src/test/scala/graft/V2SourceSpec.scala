package graft

import org.apache.spark.sql.functions._

/** The DSv2 connector's planning contract ([[graft.sources.FrameCatalogSource]]):
  * pushed range narrows the scan window, partitions outside it are never
  * read, unpushable predicates stay post-scan, column pruning reaches the
  * row materializer. */
class V2SourceSpec extends SparkSpec {

  private def table = spark.read
    .format("graft.sources.FrameCatalogSource")
    .option("frames", "100000").option("slice", "8192")
    .load()

  test("range pushdown reaches the scan; partitions outside the window are never read") {
    val df = table
      .where(col("frame_id") >= 20000L && col("frame_id") < 60000L)
      .select("frame_id", "band")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=20000 hi=60000"),
      s"pushed range missing from the scan description:\n$plan")
    graft.sources.FrameCatalogSource.readersCreated.set(0)
    // collect(), not count(): count(*) would now be answered by the
    // AGGREGATE pushdown (1 metadata reader) — this test pins the ROW
    // scan's partition pruning, so it must materialize rows.
    assert(df.collect().length === 40000)
    val readers = graft.sources.FrameCatalogSource.readersCreated.get()
    // ceil(40000 / 8192) = 5 surviving slices; an unpruned scan plans 13.
    assert(readers === 5,
      s"expected 5 partition readers for the pushed window, saw $readers")
  }

  test("column pruning reaches the materializer; unpushable predicates stay post-scan") {
    val df = table
      .where(col("frame_id") < 16384L && col("band") === "r")
      .select("frame_id", "exptime")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("lo=0 hi=16384"), "range not pushed")
    assert("cols=[a-z_,]*band".r.findFirstIn(plan).isDefined,
      "band must be read (post-scan filter needs it)")
    assert(!plan.contains("mjd"), "unused mjd column must be pruned from the scan")
    assert(plan.contains("Filter"), "the band predicate must remain a post-scan Filter")
    // Semantics under pushdown: connector result ≡ arithmetic recompute.
    val n = df.count()
    assert(n === (0L until 16384L).count(i => i % 5L == 2L))
  }

  test("aggregate pushdown: rollup answered by the scan — one row per group, no agg operator") {
    val df = table
      .where(col("frame_id") >= 20000L && col("frame_id") < 90000L)
      .groupBy("band")
      .agg(count(lit(1)).as("n"), min("frame_id").as("first_id"),
        max("frame_id").as("last_id"), max("mjd").as("max_mjd"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AGGPUSHED lo=20000 hi=90000"),
      s"aggregation not pushed into the scan:\n$plan")
    assert(!plan.contains("HashAggregate") && !plan.contains("partial_"),
      "complete pushdown must leave NO aggregation operator above the scan")
    graft.sources.FrameCatalogSource.rowsEmitted.set(0L)
    val rows = df.collect().map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows.size === 5)
    assert(graft.sources.FrameCatalogSource.rowsEmitted.get() === 5L,
      "pushed rollup must materialize one row per GROUP, never one per frame")
    // Closed form ≡ brute force over the window.
    val bands = Array("u", "g", "r", "i", "z")
    (0 until 5).foreach { b =>
      val ids = (20000L until 90000L).filter(_ % 5L == b)
      val exp = (ids.length.toLong, ids.head, ids.last, 60000.0 + ids.last * 0.02)
      assert(rows(bands(b)) === exp, s"band ${bands(b)}: closed form diverges from brute force")
    }
  }

  test("aggregate pushdown: empty window global rollup = count 0, null extrema") {
    val r = table.where(col("frame_id") < 0L)
      .agg(count(lit(1)).as("n"), min("frame_id").as("mn")).collect()
    assert(r.length === 1 && r(0).getLong(0) === 0L && r(0).isNullAt(1),
      "ANSI global-aggregate-on-empty semantics must survive complete pushdown")
  }

  test("reported partitioning: band-keyed aggregation plans with no shuffle above the scan") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    val df = spark.read.format("graft.sources.FrameCatalogSource")
      .option("frames", "100000").option("partition_by", "band").load()
      .where(col("frame_id") >= 10000L && col("frame_id") < 70000L)
      .groupBy("band").agg(sum("exptime").as("s"), sum("zp_milli").as("z"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BANDED"), "banded scan mode not engaged")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"KeyGroupedPartitioning not honored — aggregation re-shuffled the scan:\n$plan")
    // Partition-per-band readers, correct congruence-class enumeration.
    graft.sources.FrameCatalogSource.readersCreated.set(0)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(graft.sources.FrameCatalogSource.readersCreated.get() === 5)
    val exp = (10000L until 70000L).groupBy(i => "ugriz" ((i % 5L).toInt).toString)
      .map { case (b, ids) => b -> ids.map(i => 30L + (i % 7L) * 15L).sum }
    assert(got === exp)
  }

  test("reported statistics: the estimate reflects the PUSHED window and a " +
      "no-hint join against a narrowed slice broadcasts STATICALLY") {
    // The logical stats of the V2 relation must be the post-pushdown
    // window, not the table: a 100k-row catalog narrowed to 300 ids
    // should read as ~300 rows / ~14 KB to the planner.
    val dim = table
      .where(col("frame_id") >= 5000L && col("frame_id") < 5300L)
      .select("frame_id", "band")
    val stats = dim.queryExecution.optimizedPlan.stats
    assert(stats.rowCount.exists(_.longValue === 300L),
      s"reported numRows must be the pushed window (got ${stats.rowCount})")
    assert(stats.sizeInBytes.longValue < 1000000L,
      s"reported sizeInBytes must be window-scaled (got ${stats.sizeInBytes})")
    // …which is what lets Catalyst broadcast the connector side with NO
    // hint in the INITIAL plan (AQE's runtime conversion would only fire
    // after the other side's shuffle map stage was already paid).
    val s0 = spark
    import s0.implicits._
    val fact = s0.range(0L, 50000L)
      .select((col("id") % 300L + 5000L).as("frame_id"), col("id").as("v"))
    val p = fact.join(dim, "frame_id")
      .groupBy("band").agg(count(lit(1)).as("n"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"reported stats did not drive a static broadcast:\n$p")
  }

  test("storage-partitioned join: co-partitioned banded scans join with no exchange") {
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    def side(lo: Long, hi: Long) = spark.read
      .format("graft.sources.FrameCatalogSource")
      .option("frames", "100000").option("partition_by", "band").load()
      .where(col("frame_id") >= lo && col("frame_id") < hi)
    val l = side(10000L, 40000L).select(col("band"), col("frame_id"), col("exptime"))
    val r = side(20000L, 60000L)
      .select(col("band").as("band2"), col("frame_id").as("fid2"), col("zp_milli"))
    val j = l.join(r, col("band") === col("band2") && col("frame_id") === col("fid2"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      "expected a partitioned join operator")
    assert(!plan.contains("Exchange"),
      s"storage-partitioned join must move NEITHER side:\n$plan")
    // Cross-side filter inference narrows BOTH scans to the window overlap.
    assert(plan.contains("lo=20000 hi=40000"),
      "join-key equality should intersect the pushed windows on both sides")
    assert(j.count() === 20000L)
  }

  test("runtime V2 filtering: the dim's join keys prune scan partitions at execution time") {
    val df = SparkEntry.queries("scan_v2_runtime_filter")(spark, sf)
    graft.sources.FrameCatalogSource.readersCreated.set(0)
    graft.sources.FrameCatalogSource.rowsEmitted.set(0L)
    val rows = df.collect()
    assert(rows.length === 4, s"expected the 4 even-rig calibration frames, got ${rows.length}")
    // The 4 surviving cal_ids (22222, 44444, 66666, 88888) land in 4
    // distinct 2048-id slices; without runtime filtering the scan plans
    // ceil(100000/2048) = 49 slices. The declared query's global sort adds
    // a range-partitioner SAMPLING pass that re-executes the join child a
    // strategy-dependent number of times (2× as of Spark 4.1 — but that is
    // an execution detail AQE or a version bump may shift), so pin the
    // PRUNING PROPERTY: every pass reads exactly the 4 surviving slices,
    // and total work stays well under ONE unpruned 49-slice pass.
    val readers = graft.sources.FrameCatalogSource.readersCreated.get()
    assert(readers >= 4 && readers % 4 === 0 && readers < 49,
      s"runtime IN-filter must prune each pass to the 4 surviving slices " +
        s"(a positive multiple of 4, < the 49 unpruned), saw $readers")
    assert(graft.sources.FrameCatalogSource.rowsEmitted.get() ===
      readers.toLong / 4L * (4L * 2048L),
      "pruned scan should enumerate only the 4 surviving slices per pass")
    // And the runtime filter itself was delivered and parsed.
    val rt = graft.sources.FrameCatalogSource.lastRuntimeFilter.get()
    assert(rt.startsWith("IN(frame_id") && Seq("22222", "44444", "66666", "88888")
      .forall(rt.contains), s"unexpected runtime predicate: $rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic-pruning runtime filter on the V2 scan:\n$plan")
  }

  test("limit pushdown: LIMIT k composes with the pushed range — one reader, " +
      "k rows, no work beyond the window head") {
    val df = table.where(col("frame_id") >= 5000L).limit(9)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TOPN lo=5000 hi=100000 n=9 order=asc"),
      s"limit not pushed into the scan:\n$plan")
    graft.sources.FrameCatalogSource.readersCreated.set(0)
    graft.sources.FrameCatalogSource.rowsEmitted.set(0L)
    val rows = df.collect()
    assert(rows.map(_.getLong(0)).toSeq === (5000L until 5009L).toSeq)
    assert(graft.sources.FrameCatalogSource.readersCreated.get() === 1,
      "a pushed limit plans exactly one partition")
    assert(graft.sources.FrameCatalogSource.rowsEmitted.get() === 9L,
      "a pushed limit materializes exactly k rows")
  }

  test("top-N pushdown: ORDER BY frame_id DESC LIMIT k drops the Sort — the " +
      "scan walks the window tail") {
    val df = table.orderBy(col("frame_id").desc).limit(5)
      .select("frame_id", "band")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TOPN lo=0 hi=100000 n=5 order=desc"),
      s"top-N not pushed into the scan:\n$plan")
    assert(!plan.contains("Sort"),
      s"complete top-N pushdown must leave NO sort operator:\n$plan")
    graft.sources.FrameCatalogSource.rowsEmitted.set(0L)
    assert(df.collect().map(_.getLong(0)).toSeq ===
      (99999L to 99995L by -1L).toSeq)
    assert(graft.sources.FrameCatalogSource.rowsEmitted.get() === 5L)
  }

  test("offset pushdown: OFFSET skips by interval arithmetic — the skipped " +
      "prefix never materializes a row") {
    val df = table.where(col("frame_id") >= 1000L)
      .orderBy("frame_id").offset(14).limit(7).select("frame_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TOPN lo=1014"),
      s"offset must narrow the scan window at planning:\n$plan")
    assert(!plan.contains("Sort"), s"pushed page read must be sort-free:\n$plan")
    graft.sources.FrameCatalogSource.readersCreated.set(0)
    graft.sources.FrameCatalogSource.rowsEmitted.set(0L)
    assert(df.collect().map(_.getLong(0)).toSeq === (1014L to 1020L).toSeq)
    assert(graft.sources.FrameCatalogSource.readersCreated.get() === 1)
    assert(graft.sources.FrameCatalogSource.rowsEmitted.get() === 7L,
      "page read must materialize exactly the page, not offset + page")
    // Desc composition: skip the top 3, take the next 5 off the tail.
    val tail = table.orderBy(col("frame_id").desc).offset(3).limit(5)
      .select("frame_id")
    assert(tail.collect().map(_.getLong(0)).toSeq ===
      (99996L to 99992L by -1L).toSeq)
  }

  test("top-N on a non-id column is declined — the conservative contract " +
      "keeps the Sort and full scan") {
    // exptime is periodic, not monotone in id: a pushed top-N would be
    // wrong. The builder must refuse; Spark keeps its own Sort + Limit.
    val df = table.where(col("frame_id") < 1000L)
      .orderBy(col("exptime").desc).limit(3).select("frame_id", "exptime")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TOPN"), "non-id ordering must not push")
    assert(plan.contains("TakeOrderedAndProject") || plan.contains("Sort"),
      s"declined top-N must leave Spark's sort in place:\n$plan")
    assert(df.collect().map(_.getLong(1)).toSeq === Seq(120L, 120L, 120L))
  }

  test("unsupported aggregate (sum over periodic column) falls back to the row scan") {
    val df = table.where(col("frame_id") < 1000L)
      .groupBy("band").agg(sum("exptime").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("AGGPUSHED"), "sum(exptime) has no closed form — must not push")
    assert(plan.contains("HashAggregate"), "fallback must aggregate above the scan")
    graft.sources.FrameCatalogSource.rowsEmitted.set(0L)
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(graft.sources.FrameCatalogSource.rowsEmitted.get() === 1000L,
      "fallback enumerates the window's rows")
    val exp = (0L until 1000L).groupBy(i => "ugriz" ((i % 5L).toInt).toString)
      .map { case (b, ids) => b -> ids.map(i => 30L + (i % 7L) * 15L).sum }
    assert(got === exp)
  }
}
