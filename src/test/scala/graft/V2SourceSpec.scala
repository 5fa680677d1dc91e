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
    assert(df.count() === 40000L)
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
}
