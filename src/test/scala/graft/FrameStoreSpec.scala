package graft

import org.apache.spark.sql.functions._

/** The V2 write path's two-phase commit protocol
  * ([[graft.sources.FrameStoreSink]]): task output is provisional until the
  * driver-side commit, aborts publish nothing, overwrite truncates
  * atomically, and the committed snapshot round-trips through BATCH_READ. */
class FrameStoreSpec extends SparkSpec {

  import graft.sources.FrameStore

  private val fmt = "graft.sources.FrameStoreSink"
  private val s0 = TestSession.spark
  import s0.implicits._

  test("overwrite truncates, append accumulates, read-back round-trips exactly") {
    val t = "fs_spec_roundtrip"
    FrameStore.drop(t)
    val commits0 = FrameStore.commitsCompleted.get()
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    Seq((3L, "c")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("append").save()
    assert(FrameStore.commitsCompleted.get() === commits0 + 2,
      "each successful save is exactly one driver-side commit")
    val back = spark.read.format(fmt).option("table", t).load()
      .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
    assert(back.toSeq === Seq(1L -> "a", 2L -> "b", 3L -> "c"))
    // A second overwrite replaces — atomically, not append-then-trim.
    Seq((9L, "z")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    assert(FrameStore.rowCount(t) === 1L)
  }

  test("two-phase commit: a failed job publishes nothing and aborts the write") {
    val t = "fs_spec_abort"
    FrameStore.drop(t)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    val aborts0 = FrameStore.abortsSeen.get()
    // Several tasks buffer rows successfully before one throws — those
    // buffered rows must never become visible (provisional until commit).
    val bad = spark.range(0, 100, 1, 8)
      .map { i => if (i == 57L) throw new RuntimeException("injected task failure"); i }
      .toDF("k").withColumn("v", lit("x"))
    intercept[Exception] {
      bad.write.format(fmt).option("table", t).mode("append").save()
    }
    assert(FrameStore.rowCount(t) === 2L,
      "rows written by tasks of a failed job leaked into the table")
    assert(FrameStore.abortsSeen.get() > aborts0,
      "job failure must reach BatchWrite.abort")
    // And the table still serves its pre-failure snapshot.
    assert(spark.read.format(fmt).option("table", t).load().count() === 2L)
  }

  test("write plan is a V2 write; read plan scans the committed snapshot") {
    val t = "fs_spec_plan"
    FrameStore.drop(t)
    Seq((1L, "a")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    val p = spark.read.format(fmt).option("table", t).load()
      .queryExecution.executedPlan.toString
    assert(p.contains("GraftFrameStoreScan"), s"read must go through the V2 scan:\n$p")
  }
}
