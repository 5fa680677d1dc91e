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

  test("a truncate-commit TOMBSTONES the replaced files — an in-flight reader " +
      "of the prior snapshot keeps resolving; drop reclaims files and dirs") {
    val t = "fs_spec_truncate_gc"
    FrameStore.drop(t)
    Seq((1L, "a"), (2L, "b")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    // A scan PLANNED over the first snapshot: forcing executedPlan builds
    // the Scan, which binds its file list at construction; the later
    // collect() reuses this same QueryExecution.
    val inFlight = spark.read.format(fmt).option("table", t).load()
    assert(inFlight.queryExecution.executedPlan != null)
    val firstFiles = graft.sources.FrameStore.snapshot(t).map(_.path)
    assert(firstFiles.nonEmpty)
    Seq((9L, "z")).toDF("k", "v")
      .write.format(fmt).option("table", t).mode("overwrite").save()
    // Replaced files survive as tombstones: snapshot isolation for readers
    // that planned before the truncate (the CommitLog retention property,
    // mirrored by the in-memory store).
    firstFiles.foreach { p =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
        s"truncate eagerly deleted a file an in-flight reader may hold: $p")
    }
    assert(inFlight.collect().length === 2,
      "a reader planned over the prior snapshot must keep resolving")
    assert(FrameStore.tombstonesOf(t).map(_.path).toSet === firstFiles.toSet)
    // The new snapshot is intact and readable.
    assert(spark.read.format(fmt).option("table", t).load().count() === 1L)
    // drop reclaims live files AND tombstones, and prunes the staging dirs
    // they lived in (no empty graft_fstore_stage_ dirs left behind).
    val liveDirs = (FrameStore.snapshot(t).map(_.path) ++ firstFiles)
      .map(p => java.nio.file.Paths.get(p).getParent).distinct
    FrameStore.drop(t)
    (firstFiles ++ liveDirs.map(_.toString)).foreach { p =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
        s"drop left $p behind")
    }
  }

  test("log-backed mode: V2 writes commit through CommitLog — appends and a " +
      "truncate land as atomic versions, as-of reads time travel all three") {
    import graft.sources.CommitLog
    val root = java.nio.file.Files.createTempDirectory("graft_fslog_spec_").toString
    val t = "fs_spec_log"
    def write(df: org.apache.spark.sql.DataFrame, mode: String): Unit =
      df.write.format(fmt).option("table", t).option("root", root)
        .mode(mode).save()
    write(Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), "append")   // v1
    write(Seq((3L, 30.0)).toDF("k", "v"), "append")               // v2
    write(Seq((9L, 90.0)).toDF("k", "v"), "overwrite")            // v3
    assert(CommitLog.latestVersion(root) === 3L)
    def asOf(v: Long) = spark.read.format(fmt).option("table", t)
      .option("root", root).option("asOf", v.toString).load()
    assert(asOf(1L).collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(asOf(2L).collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    assert(asOf(3L).collect().map(_.getLong(0)).toSeq === Seq(9L))
    // Latest read without asOf = current snapshot.
    val latest = spark.read.format(fmt).option("table", t)
      .option("root", root).load()
    assert(latest.count() === 1L)
    assert(latest.queryExecution.executedPlan.toString.contains("GraftFrameStoreLogScan"))
    // The truncate's removes are TOMBSTONES inside retention (as-of reads
    // above still resolve); an expired vacuum reclaims exactly them.
    val (kept, removed) = CommitLog.vacuum(root, retainVersions = 10L)
    assert(removed === 0L && kept === CommitLog.filesAsOf(root, 3L).size.toLong)
    val (_, removed0) = CommitLog.vacuum(root) // retention 0: tombstones expire
    assert(removed0 === CommitLog.snapshotAsOf(root, Long.MaxValue)
      .tombstones.size.toLong)
  }

  test("log-backed mode: a failed job aborts — nothing reaches the log, " +
      "staging under the table root is removed") {
    import graft.sources.CommitLog
    val root = java.nio.file.Files.createTempDirectory("graft_fslog_abort_").toString
    val t = "fs_spec_log_abort"
    Seq((1L, 1.0)).toDF("k", "v").write.format(fmt).option("table", t)
      .option("root", root).mode("append").save()
    val v1 = CommitLog.latestVersion(root)
    val bad = spark.range(0, 100, 1, 8)
      .map { i => if (i == 33L) throw new RuntimeException("injected failure"); i }
      .toDF("k").withColumn("v", lit(1.0))
    intercept[Exception] {
      bad.write.format(fmt).option("table", t).option("root", root)
        .mode("append").save()
    }
    assert(CommitLog.latestVersion(root) === v1,
      "a failed job must not advance the log")
    val staging = graft.sources.FrameStore.lastStagingDir.get()
    assert(staging.startsWith(root) &&
      !java.nio.file.Files.exists(java.nio.file.Paths.get(staging)),
      s"aborted log-backed job left staging behind: $staging")
    // And the surviving snapshot still reads clean through the scan.
    assert(spark.read.format(fmt).option("table", t).option("root", root)
      .load().count() === 1L)
  }

  test("streaming write: each epoch commits one txn-stamped log version; " +
      "a replayed epoch no-ops and a foreign writer's version fails loudly") {
    import graft.sources.CommitLog
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft_fs_stream_").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_fs_stream_ck_").toString
    val mem = MemoryStream[(Long, Double)]
    val q = mem.toDF().toDF("k", "v")
      .writeStream.format(fmt)
      .option("table", "fs_spec_stream").option("root", root)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()
    mem.addData((1L, 10.0), (2L, 20.0))
    q.processAllAvailable()
    assert(CommitLog.latestVersion(root) === 1L,
      "first epoch must land as log version 1")
    mem.addData((3L, 30.0))
    q.processAllAvailable()
    assert(CommitLog.latestVersion(root) === 2L,
      "second epoch must land as log version 2")
    q.stop()
    // Epochs are time-travelable like any log table.
    def asOf(v: Long) = spark.read.format(fmt).option("table", "fs_spec_stream")
      .option("root", root).option("asOf", v.toString).load()
    assert(asOf(1L).collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    assert(asOf(2L).collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L, 3L))
    // Every streaming commit carries its txn marker <queryId>/<epochId>.
    val txn1 = CommitLog.txnOf(root, 1L)
    val txn2 = CommitLog.txnOf(root, 2L)
    assert(txn1.endsWith("/0") && txn2.endsWith("/1")
      && txn1.takeWhile(_ != '/') == txn2.takeWhile(_ != '/'),
      s"txn markers must be <queryId>/<epoch>: $txn1, $txn2")
    // REPLAY: recovery re-delivers epoch 0 under the same queryId — the
    // commit must no-op (log unchanged), not double-publish.
    val qid = txn1.stripSuffix("/0")
    graft.sources.FrameStoreEpochCommit.commitEpoch(
      root, "stage-replay", 0L, qid, truncate = false, staged = Set.empty)
    assert(CommitLog.latestVersion(root) === 2L
      && CommitLog.txnOf(root, 1L) === txn1,
      "a replayed epoch must be an idempotent no-op")
    assert(asOf(1L).count() === 2L, "replay must not disturb the snapshot")
    // FOREIGN writer at an occupied version: loud failure, never absorbed.
    intercept[IllegalStateException] {
      graft.sources.FrameStoreEpochCommit.commitEpoch(
        root, "stage-x", 0L, "another-query", truncate = false, staged = Set.empty)
    }
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
