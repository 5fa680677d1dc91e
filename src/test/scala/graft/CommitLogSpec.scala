package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** The transaction-log read protocol ([[graft.sources.CommitLog]]): as-of
  * snapshots resolve from the log's add-actions, version isolation is a
  * file-list property (not a directory convention), and the log — not the
  * directory listing — is authoritative. */
class CommitLogSpec extends SparkSpec {

  import graft.sources.CommitLog

  private def freshTable(): String = {
    val root = Files.createTempDirectory("graft_commitlog").toString
    val s0 = spark
    import s0.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .write.mode("overwrite").parquet(s"$root/g=1")
    CommitLog.commit(root, 1L, "g=1")
    Seq((2L, 22.0), (4L, 40.0)).toDF("key", "val")
      .write.mode("overwrite").parquet(s"$root/g=2")
    CommitLog.commit(root, 2L, "g=2")
    root
  }

  test("as-of file resolution: version 1 never lists (or scans) version 2's files") {
    val root = freshTable()
    val f1 = CommitLog.filesAsOf(root, 1L)
    assert(f1.nonEmpty && f1.forall(_.startsWith("g=1/")),
      s"version-1 snapshot must contain only commit-1 adds: $f1")
    val f2 = CommitLog.filesAsOf(root, 2L)
    assert(f2.toSet.size === f2.size && f2.exists(_.startsWith("g=2/")))
    // The physical scan of the v1 read must not reference any g=2 file.
    val p1 = CommitLog.readAsOf(spark, root, 1L).queryExecution.executedPlan.toString
    assert(!p1.contains("g=2"), s"version-1 scan leaked a version-2 file:\n$p1")
    // basePath keeps the partition column bound.
    assert(CommitLog.readAsOf(spark, root, 2L).columns.contains("g"),
      "partition column g must survive explicit-file reads")
  }

  test("the log is authoritative: uncommitted directory debris is invisible") {
    val root = freshTable()
    val before = CommitLog.readAsOf(spark, root, 2L).count()
    // A crashed writer leaves an orphan parquet file in the data dir
    // WITHOUT a log entry — directory-based readers would count it.
    val s0 = spark
    import s0.implicits._
    Seq((99L, 990.0)).toDF("key", "val").write.parquet(s"$root/tmp_orphan")
    val orphan = Files.list(Paths.get(s"$root/tmp_orphan")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    Files.copy(Paths.get(orphan), Paths.get(s"$root/g=1/part-orphan.snappy.parquet"))
    assert(CommitLog.readAsOf(spark, root, 2L).count() === before,
      "a data file absent from the log must not exist for readers")
  }

  test("vacuum deletes only what the log does not reference; committed reads unaffected") {
    val root = freshTable()
    val s0 = spark
    import s0.implicits._
    // Debris of both kinds: an orphan file inside a committed generation's
    // directory and a whole generation that never committed.
    Seq((50L, 500.0)).toDF("key", "val").write.parquet(s"$root/tmp_stage")
    val staged = Files.list(Paths.get(s"$root/tmp_stage")).toArray
      .map(_.toString).filter(_.endsWith(".parquet")).head
    val orphanInG1 = Paths.get(s"$root/g=1/part-orphan.snappy.parquet")
    Files.copy(Paths.get(staged), orphanInG1)
    Seq((60L, 600.0)).toDF("key", "val").write.parquet(s"$root/g=3")
    val before = CommitLog.readAsOf(spark, root, 2L).count()
    val (kept, removed) = CommitLog.vacuum(root)
    val live = CommitLog.filesAsOf(root, Long.MaxValue)
    assert(kept === live.size.toLong, "every live file survives")
    assert(removed >= 3L, s"orphans must be removed (saw $removed)") // g=1 orphan + g=3 + tmp_stage
    live.foreach(f => assert(Files.exists(Paths.get(root, f)),
      s"vacuum deleted a LIVE file: $f"))
    assert(!Files.exists(orphanInG1), "in-generation orphan must be gone")
    assert(!Files.exists(Paths.get(s"$root/g=3")), "uncommitted generation dir must be pruned")
    assert(CommitLog.readAsOf(spark, root, 2L).count() === before,
      "vacuum changed a committed read")
  }

  test("shallow clone: zero data copied; vacuum on the clone never touches source files") {
    val src = freshTable()
    val dst = Files.createTempDirectory("graft_clone").toString
    CommitLog.cloneTable(src, dst)
    val cloneFiles = CommitLog.filesAsOf(dst, Long.MaxValue)
    assert(cloneFiles.nonEmpty && cloneFiles.forall(_.startsWith(src)),
      s"clone adds must be absolute references into the source: $cloneFiles")
    // Nothing but the log exists under the clone root.
    val st = Files.list(Paths.get(dst))
    val entries = try st.toArray.map(_.toString) finally st.close()
    assert(entries.forall(_.endsWith("_log")), s"clone copied data: ${entries.toSeq}")
    // Same rows through the clone's log as through the source's.
    assert(CommitLog.readAsOf(spark, dst, Long.MaxValue).count() ===
      CommitLog.readAsOf(spark, src, Long.MaxValue).count())
    // Vacuum on the clone deletes only debris UNDER the clone root —
    // borrowed source files are outside it and survive.
    val s0 = spark
    import s0.implicits._
    Seq((7L, 70.0)).toDF("key", "val").write.parquet(s"$dst/g=9")
    val (kept, removed) = CommitLog.vacuum(dst)
    assert(removed >= 1L, "clone-root debris must be removed")
    assert(kept === 0L, "no LIVE file lives under the clone root (all borrowed)")
    CommitLog.filesAsOf(src, Long.MaxValue).foreach(f =>
      assert(Files.exists(Paths.get(src, f)),
        s"vacuum on the clone deleted a SOURCE file: $f"))
    assert(CommitLog.readAsOf(spark, dst, Long.MaxValue).count() ===
      CommitLog.readAsOf(spark, src, Long.MaxValue).count(),
      "clone reads must survive its vacuum")
  }

  test("snapshot semantics: latest-commit-wins reconstruction over the as-of set") {
    val root = freshTable()
    def snap(v: Long): Map[Long, Double] =
      CommitLog.readAsOf(spark, root, v)
        .groupBy("key").agg(max(struct(col("g"), col("val"))).as("m"))
        .select(col("key"), col("m.val"))
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(snap(1L) === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    assert(snap(2L) === Map(1L -> 10.0, 2L -> 22.0, 3L -> 30.0, 4L -> 40.0))
  }
}
