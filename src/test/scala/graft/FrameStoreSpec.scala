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

  test("commit messages carry file manifests, never rows: staged parquet on " +
      "disk holds the data, and the message type cannot carry an InternalRow") {
    val t = "fs_spec_manifest"
    FrameStore.drop(t)
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    // The committed snapshot is a manifest of real parquet files — readable
    // by the ordinary parquet reader, bytes on disk, counts as metadata.
    val files = graft.sources.FrameStore.snapshot(t)
    assert(files.nonEmpty && files.map(_.rows).sum === 3L)
    files.foreach { f =>
      assert(java.nio.file.Files.size(java.nio.file.Paths.get(f.path)) === f.bytes)
      assert(f.bytes > 0L)
    }
    val reread = spark.read.parquet(files.map(_.path): _*)
    assert(reread.count() === 3L, "staged files must be ordinary parquet")
    // Structural pin: no field of the commit message type can hold rows —
    // an InternalRow (or array/collection of them) on the message is the
    // driver-bottleneck shape this protocol exists to avoid.
    import org.apache.spark.sql.catalyst.InternalRow
    def carriesRows(c: Class[_]): Boolean =
      classOf[InternalRow].isAssignableFrom(c) ||
        (c.isArray && classOf[InternalRow].isAssignableFrom(c.getComponentType))
    classOf[graft.sources.FrameStoreCommit].getDeclaredFields.foreach { fld =>
      assert(!carriesRows(fld.getType),
        s"commit message field ${fld.getName} carries rows: ${fld.getType}")
    }
    assert(classOf[graft.sources.FrameStoreCommit].getDeclaredFields
      .map(_.getType.getName).toSet === Set("scala.Option", "long"),
      "manifest shape drifted — re-check that rows cannot ride the message")
  }

  test("abort removes every staged file: an injected failure leaves no " +
      "trace of the job's staging directory") {
    val t = "fs_spec_stage_gc"
    FrameStore.drop(t)
    val bad = spark.range(0, 100, 1, 8)
      .map { i => if (i == 91L) throw new RuntimeException("injected failure"); i }
      .toDF("k").withColumn("v", lit("y"))
    intercept[Exception] {
      bad.write.format(fmt).option("table", t).mode("overwrite").save()
    }
    val staging = graft.sources.FrameStore.lastStagingDir.get()
    assert(staging.nonEmpty)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(staging)),
      s"aborted job left staged files behind under $staging")
  }

  test("append schema mismatch fails the commit and cleans its staging; " +
      "the committed snapshot is never reinterpreted") {
    val t = "fs_spec_schema_guard"
    FrameStore.drop(t)
    Seq((1L, "a")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    // Same arity, different column order/types — silently accepted before,
    // which reinterpreted the committed rows under the new schema on read.
    val ex = intercept[Exception] {
      Seq(("x", 9L)).toDF("v", "k")
        .write.format(fmt).option("table", t).mode("append").save()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("schema mismatch")
      || (ex.getCause != null && ex.getCause.getMessage.contains("schema mismatch")),
      s"commit must fail loudly on append schema drift (got $ex)")
    val staging = graft.sources.FrameStore.lastStagingDir.get()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(staging)),
      "failed-validation staging must be cleaned up")
    // Table unchanged and still readable under its committed schema.
    val back = spark.read.format(fmt).option("table", t).load().collect()
    assert(back.map(r => r.getLong(0) -> r.getString(1)).toSeq === Seq(1L -> "a"))
  }

  test("a truncate-commit eagerly reclaims the files of the manifest it replaced") {
    val t = "fs_spec_truncate_gc"
    FrameStore.drop(t)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    val firstFiles = graft.sources.FrameStore.snapshot(t).map(_.path)
    assert(firstFiles.nonEmpty)
    Seq((9L, "z")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    firstFiles.foreach { p =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
        s"replaced staged file survived the truncate swap: $p")
    }
    // The new snapshot is intact and readable.
    assert(spark.read.format(fmt).option("table", t).load().count() === 1L)
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
