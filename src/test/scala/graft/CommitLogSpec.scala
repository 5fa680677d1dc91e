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

  test("catalog-pinned multi-table txn: a crash injected between the two " +
      "table commits cannot produce a torn read") {
    val root = Files.createTempDirectory("graft_txnm").toString
    val (a, b, cat) = (s"$root/a", s"$root/b", s"$root/cat")
    val s0 = spark
    import s0.implicits._
    Seq((1L, 10.0)).toDF("key", "val").write.parquet(s"$a/g1")
    CommitLog.commit(a, 1L, "g1")
    Seq((1L, 1L)).toDF("bucket", "n").write.parquet(s"$b/g1")
    CommitLog.commit(b, 1L, "g1")
    CommitLog.setTags(cat, 1L, Seq("a" -> 1L, "b" -> 1L))
    // Crash point 1: table a prepared, table b not — the catalog must
    // keep serving the old pair (the prepare is invisible through it).
    Seq((2L, 20.0)).toDF("key", "val").write.parquet(s"$a/g2")
    CommitLog.commit(a, 2L, "g2")
    assert(CommitLog.pinnedVersions(cat) === Map("a" -> 1L, "b" -> 1L),
      "a single-table prepare leaked through the catalog (torn read)")
    // Crash point 2: both prepared, publish not run — still the old pair.
    Seq((2L, 1L)).toDF("bucket", "n").write.parquet(s"$b/g2")
    CommitLog.commit(b, 2L, "g2")
    assert(CommitLog.pinnedVersions(cat) === Map("a" -> 1L, "b" -> 1L),
      "an unpublished txn became visible through the catalog")
    // Readers resolving via the pins see only version-1 files on both
    // sides — never a (2, 1) or (1, 2) mix.
    val pins = CommitLog.pinnedVersions(cat)
    assert(CommitLog.filesAsOf(a, pins("a")).forall(_.startsWith("g1/")))
    assert(CommitLog.filesAsOf(b, pins("b")).forall(_.startsWith("g1/")))
    // Publish: both pins flip in one atomic commit.
    CommitLog.setTags(cat, 2L, Seq("a" -> 2L, "b" -> 2L))
    assert(CommitLog.pinnedVersions(cat) === Map("a" -> 2L, "b" -> 2L))
    // Recovery idempotence: a second publish of the same txn version
    // conflicts (create-if-absent log) instead of double-applying.
    intercept[IllegalStateException] {
      CommitLog.setTags(cat, 2L, Seq("a" -> 2L, "b" -> 2L))
    }
  }

  test("streaming pin-set publish (stream_nightly's shape): a micro-batch " +
      "crash between prepare and publish cannot tear a catalog reader, and " +
      "the txn-driven re-drive recovers by publishing exactly once") {
    val root = Files.createTempDirectory("graft_snpin").toString
    val (st, ft, cat) = (s"$root/state", s"$root/features", s"$root/cat")
    val s0 = spark
    import s0.implicits._
    // Batch 0 published the pair (1, 1).
    Seq((1L, 2L, 30.0)).toDF("u", "n", "sm").write.parquet(s"$st/g=1")
    CommitLog.commit(st, 1L, "g=1")
    Seq((1L, 2L, 15.0)).toDF("u", "n", "mean_mag").write.parquet(s"$ft/g=1")
    CommitLog.commit(ft, 1L, "g=1")
    CommitLog.setTags(cat, 1L, Seq("state" -> 1L, "features" -> 1L))
    // Batch 1 (txn "snight/1") prepares BOTH tables, then CRASHES before
    // the catalog publish — exactly applyBatch's crash window.
    val txn = "snight/1"
    Seq((1L, 3L, 60.0)).toDF("u", "n", "sm").write.parquet(s"$st/g=2")
    assert(CommitLog.tryCommit(st, 2L, "g=2", txn = txn,
      removes = CommitLog.filesAsOf(st, 1L)))
    Seq((1L, 3L, 20.0)).toDF("u", "n", "mean_mag").write.parquet(s"$ft/g=2")
    assert(CommitLog.tryCommit(ft, 2L, "g=2", txn = txn,
      removes = CommitLog.filesAsOf(ft, 1L)))
    // <crash> — a reader resolving through the catalog still sees the OLD
    // pair on both sides: never (2, 1), (1, 2), or any mix of files.
    val pins = CommitLog.pinnedVersions(cat)
    assert(pins === Map("state" -> 1L, "features" -> 1L),
      "a prepared-but-unpublished micro-batch leaked through the catalog")
    assert(CommitLog.filesAsOf(st, pins("state")).forall(_.startsWith("g=1/")))
    assert(CommitLog.filesAsOf(ft, pins("features"))
      .forall(_.startsWith("g=1/")))
    // RECOVERY re-drive (the restarted stream replays batch 1): both
    // prepares are detected by their txn stamp and SKIPPED — re-preparing
    // would conflict on the create-if-absent version files...
    assert(CommitLog.txnOf(st, CommitLog.latestVersion(st)) === txn)
    assert(CommitLog.txnOf(ft, CommitLog.latestVersion(ft)) === txn)
    assert(!CommitLog.tryCommit(st, 2L, "g=2", txn = txn),
      "a re-drive that re-prepares must conflict, proving the skip is load-bearing")
    // ...and the publish runs once, flipping both pins atomically.
    CommitLog.setTags(cat, 2L, Seq("state" -> 2L, "features" -> 2L))
    assert(CommitLog.pinnedVersions(cat) ===
      Map("state" -> 2L, "features" -> 2L))
    // A second replay is a full no-op: the pin already names the prepared
    // head (applyBatch's replay guard), and a duplicate publish conflicts.
    assert(CommitLog.pinnedVersions(cat).get("state")
      .contains(CommitLog.latestVersion(st)))
    intercept[IllegalStateException] {
      CommitLog.setTags(cat, 2L, Seq("state" -> 2L, "features" -> 2L))
    }
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

  test("remove actions: a removed file leaves later snapshots by LOG action, " +
      "stays time-travelable, and survives vacuum until retention expires") {
    val root = freshTable()
    val s0 = spark
    import s0.implicits._
    // Version 3 OVERWRITES generation 1: adds g=3, removes g=1's files —
    // one atomic commit, no in-place directory rewrite.
    Seq((1L, 11.0), (3L, 33.0)).toDF("key", "val")
      .write.mode("overwrite").parquet(s"$root/g=3")
    val g1Files = CommitLog.filesAsOf(root, 2L).filter(_.startsWith("g=1/"))
    assert(g1Files.nonEmpty)
    CommitLog.commit(root, 3L, "g=3", removes = g1Files)
    // Removed files are invisible to as-of-3 readers…
    val f3 = CommitLog.filesAsOf(root, 3L)
    assert(f3.forall(!_.startsWith("g=1/")), s"removed file still live: $f3")
    assert(f3.exists(_.startsWith("g=3/")) && f3.exists(_.startsWith("g=2/")))
    // …but as-of-2 still resolves them (time travel inside retention).
    assert(CommitLog.filesAsOf(root, 2L).toSet.intersect(g1Files.toSet) === g1Files.toSet)
    // Vacuum with a retention window keeps the tombstoned files on disk…
    val (kept1, removed1) = CommitLog.vacuum(root, retainVersions = 10L)
    assert(removed1 === 0L, "retention window must protect tombstoned files")
    // `kept` counts LIVE files only: retention-protected tombstones are
    // retained on disk but are not part of the current snapshot, so they
    // must not inflate the live count.
    assert(kept1 === CommitLog.filesAsOf(root, Long.MaxValue).size.toLong,
      "vacuum's kept count must be the live set, not live + protected tombstones")
    g1Files.foreach(f => assert(Files.exists(Paths.get(root, f)),
      s"vacuum inside retention deleted tombstoned file $f"))
    assert(CommitLog.readAsOf(spark, root, 2L).count() === 5L, // g=1 (3) + g=2 (2)
      "time travel to the pre-remove version must still work inside retention")
    // …and with retention expired (default 0) they join the delete set.
    val (kept2, removed2) = CommitLog.vacuum(root)
    assert(removed2 === g1Files.size.toLong,
      s"expired tombstones must be reclaimed (removed $removed2)")
    assert(kept2 === CommitLog.filesAsOf(root, Long.MaxValue).size.toLong)
    g1Files.foreach(f => assert(!Files.exists(Paths.get(root, f))))
    // The latest snapshot never depended on the reclaimed files.
    assert(CommitLog.readAsOf(spark, root, 3L).count() === 4L) // g=2 (2) + g=3 (2)
  }

  test("checkpoint: resolution after N+k commits opens checkpoint + tail, not every commit") {
    val root = Files.createTempDirectory("graft_ckptlog").toString
    val s0 = spark
    import s0.implicits._
    val n = CommitLog.CheckpointInterval
    val k = 3
    (1 to n + k).foreach { v =>
      Seq((v.toLong, v * 10.0)).toDF("key", "val")
        .write.mode("overwrite").parquet(s"$root/g=$v")
      CommitLog.commit(root, v.toLong, s"g=$v")
    }
    assert(Files.exists(Paths.get(root, "_log", f"$n%08d.checkpoint.json")),
      s"commit $n must have written a checkpoint")
    val opened = CommitLog.logFilesForSnapshot(root, (n + k).toLong)
    assert(opened.size <= k + 1,
      s"resolution opened ${opened.size} log files (want ≤ ${k + 1}: checkpoint + $k tail)")
    // And the checkpoint-resolved snapshot equals the full-log truth.
    val live = CommitLog.filesAsOf(root, (n + k).toLong)
    assert(live.size === n + k, s"checkpoint resolution lost adds: $live")
    assert(CommitLog.readAsOf(spark, root, Long.MaxValue).count() === (n + k).toLong)
    // As-of BELOW the checkpoint still resolves (no checkpoint eligible).
    assert(CommitLog.filesAsOf(root, 2L).size === 2)
  }

  test("multi-writer arbitration: same-version race has exactly one winner; " +
      "the loser's retry lands at the next version") {
    val root = Files.createTempDirectory("graft_racelog").toString
    val s0 = spark
    import s0.implicits._
    Seq((1L, 1.0)).toDF("key", "val").write.parquet(s"$root/g=a")
    Seq((2L, 2.0)).toDF("key", "val").write.parquet(s"$root/g=b")
    import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
    val pool = Executors.newFixedThreadPool(2)
    val gate = new CountDownLatch(1)
    def racer(gen: String) =
      pool.submit(new java.util.concurrent.Callable[Boolean] {
        override def call(): Boolean = {
          gate.await(5, TimeUnit.SECONDS): Unit
          CommitLog.tryCommit(root, 1L, gen)
        }
      })
    val (fa, fb) = (racer("g=a"), racer("g=b"))
    gate.countDown()
    val (wa, wb) = (fa.get(), fb.get())
    pool.shutdown()
    assert(wa ^ wb, s"exactly one racer must win version 1 (a=$wa b=$wb)")
    // The losing writer retries optimistically and lands at version 2.
    val loserGen = if (wa) "g=b" else "g=a"
    val v = CommitLog.commitRetrying(root, loserGen)
    assert(v === 2L, s"retry must land at the next version (got $v)")
    val live = CommitLog.filesAsOf(root, Long.MaxValue)
    assert(live.exists(_.startsWith("g=a/")) && live.exists(_.startsWith("g=b/")),
      s"both writers' data must be committed after arbitration: $live")
    // No torn or temp debris is ever visible as a version.
    val logged = Files.list(Paths.get(root, "_log")).toArray.map(_.toString)
    assert(logged.forall(p => p.endsWith(".json") && !p.contains(".tmp-")))
  }

  test("log paths that would break the JSON line format are rejected at commit") {
    val root = Files.createTempDirectory("graft_badpath").toString
    val bad = Paths.get(root, """g="1"""")
    Files.createDirectories(bad)
    Files.write(bad.resolve("x.parquet"), Array[Byte](1, 2, 3))
    intercept[IllegalArgumentException] {
      CommitLog.commit(root, 1L, """g="1"""")
    }
    assert(!CommitLog.commitVersionExists(root, 1L),
      "a rejected commit must publish nothing")
  }

  test("change feed edges: version 1 is all inserts; a pure append emits no removes; " +
      "a restore surfaces as the inverse of the commit it undoes") {
    val root = freshTable() // v1 adds g=1, v2 appends g=2
    val (a1, r1) = CommitLog.changesAt(root, 1L)
    assert(a1.nonEmpty && a1.forall(_.startsWith("g=1/")) && r1.isEmpty,
      s"version 1's feed must be exactly its adds: ($a1, $r1)")
    val (a2, r2) = CommitLog.changesAt(root, 2L)
    assert(a2.forall(_.startsWith("g=2/")) && r2.isEmpty,
      "a pure append's feed must contain no removes")
    // v3 removes g=1; v4 restores it via commitFiles — the feed of the
    // restore is the inverse of the feed of the removal.
    CommitLog.commitFiles(root, 3L, adds = Nil, removes = a1)
    val (a3, r3) = CommitLog.changesAt(root, 3L)
    assert(a3.isEmpty && r3.toSet === a1.toSet)
    CommitLog.commitFiles(root, 4L, adds = a1, removes = Nil)
    val (a4, r4) = CommitLog.changesAt(root, 4L)
    assert(a4.toSet === a1.toSet && r4.isEmpty,
      "restore must re-add exactly what the removal dropped")
    assert(CommitLog.filesAsOf(root, 4L).toSet === CommitLog.filesAsOf(root, 2L).toSet)
  }

  test("conflict checker: of two concurrent compactions of the same files, " +
      "exactly one lands and the loser aborts instead of resurrecting removes") {
    val root = freshTable() // v1 adds g=1, v2 appends g=2
    val s0 = spark
    import s0.implicits._
    val readVersion = CommitLog.latestVersion(root) // both writers read v2
    val target = CommitLog.filesAsOf(root, readVersion).filter(_.startsWith("g=1/"))
    assert(target.nonEmpty)
    // Both writers stage a rewrite of g=1's files against snapshot v2.
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=3")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=4")
    // Writer A wins the race at v3.
    val vA = CommitLog.commitChecked(root, "g=3", readVersion, reads = target)
    assert(vA === 3L)
    // Writer B staged against the SAME snapshot and intends to remove the
    // SAME files A already removed — a blind retry at v4 would re-remove
    // them and add a rewrite of data that no longer exists (the
    // double-compaction resurrection). The checker must abort it.
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commitChecked(root, "g=4", readVersion, reads = target)
    }
    // Exactly one compaction landed: the snapshot holds A's output + g=2,
    // no g=4, and no g=1 resurrection.
    val live = CommitLog.filesAsOf(root, Long.MaxValue)
    assert(live.exists(_.startsWith("g=3/")) && live.exists(_.startsWith("g=2/")))
    assert(!live.exists(_.startsWith("g=4/")) && !live.exists(_.startsWith("g=1/")),
      s"loser's rewrite or a resurrected remove leaked into the snapshot: $live")
  }

  test("conflict checker: disjoint appends commute — the loser retries and " +
      "both land") {
    val root = freshTable()
    val s0 = spark
    import s0.implicits._
    val readVersion = CommitLog.latestVersion(root)
    Seq((7L, 70.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=5")
    Seq((8L, 80.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=6")
    // A pure append reads nothing and removes nothing: empty read set.
    val vA = CommitLog.commitChecked(root, "g=5", readVersion, reads = Nil)
    // B raced A (same readVersion), loses v3, re-validates — A removed
    // nothing of B's (empty) read set — and lands at the next version.
    val vB = CommitLog.commitChecked(root, "g=6", readVersion, reads = Nil)
    assert(vA === 3L && vB === 4L, s"disjoint appends must both land (got $vA, $vB)")
    val live = CommitLog.filesAsOf(root, Long.MaxValue)
    assert(live.exists(_.startsWith("g=5/")) && live.exists(_.startsWith("g=6/")))
  }

  test("conflict checker: a concurrent append does not abort a compaction of " +
      "other files (disjoint actions commute)") {
    val root = freshTable()
    val s0 = spark
    import s0.implicits._
    val readVersion = CommitLog.latestVersion(root)
    val target = CommitLog.filesAsOf(root, readVersion).filter(_.startsWith("g=1/"))
    // An append wins v3 while the compaction is staging.
    Seq((9L, 90.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=7")
    CommitLog.commit(root, 3L, "g=7")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=8")
    // The compaction read v2, loses v3 to the append, re-validates (the
    // append removed nothing), and lands at v4 with its original removes.
    val v = CommitLog.commitChecked(root, "g=8", readVersion, reads = target)
    assert(v === 4L)
    val live = CommitLog.filesAsOf(root, Long.MaxValue)
    assert(live.exists(_.startsWith("g=8/")) && live.exists(_.startsWith("g=7/"))
      && !live.exists(_.startsWith("g=1/")),
      s"append⊥compaction must both land with g=1 gone: $live")
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

  test("row-level DELETE vs concurrent compaction of a victim file: the " +
      "arbitration lands one and aborts the other — deleted rows cannot " +
      "be resurrected by the loser's rewrite") {
    val root = freshTable() // v1 adds g=1, v2 appends g=2
    val s0 = spark
    import s0.implicits._
    val readVersion = CommitLog.latestVersion(root)
    val victims = CommitLog.filesAsOf(root, readVersion).filter(_.startsWith("g=1/"))
    assert(victims.nonEmpty)
    // The DELETE stages its copy-on-write survivors (drops key=2 from g=1)
    // while a compaction stages a full rewrite of the SAME files.
    Seq((1L, 10.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=3")
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=4")
    // Delete wins the version race; the compaction read the same snapshot,
    // intends to remove the same files the delete just removed, and MUST
    // abort — landing it would re-publish the pre-delete rows (resurrect
    // the deleted key through the rewrite).
    val vDel = CommitLog.commitChecked(root, "g=3", readVersion, reads = victims)
    assert(vDel === 3L)
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commitChecked(root, "g=4", readVersion, reads = victims)
    }
    val live = CommitLog.filesAsOf(root, Long.MaxValue)
    assert(live.exists(_.startsWith("g=3/")) && !live.exists(_.startsWith("g=4/"))
      && !live.exists(_.startsWith("g=1/")),
      s"the aborted compaction leaked into the snapshot: $live")
    // And the delete is effective: key=2's g=1 row is gone.
    val keys = CommitLog.readAsOf(spark, root, Long.MaxValue)
      .where(col("g") === 3).select("key").collect().map(_.getLong(0)).sorted
    assert(keys.toSeq === Seq(1L, 3L))
  }

  test("commit timestamps: monotonic by construction, TIMESTAMP AS OF " +
      "resolves at-or-before with future clamp and pre-history error") {
    val root = freshTable() // default (wall-clock) stamps for v1, v2
    val t1 = CommitLog.timestampOf(root, 1L)
    val t2 = CommitLog.timestampOf(root, 2L)
    assert(t1 > 0L && t2 > t1, s"default stamps must be monotonic: $t1, $t2")
    // Explicit stamp must be beyond the previous commit's.
    intercept[IllegalArgumentException] {
      CommitLog.commitFiles(root, 3L, adds = Nil, removes = Nil, ts = t2)
    }
    CommitLog.commitFiles(root, 3L, adds = Nil, removes = Nil, ts = t2 + 500L)
    assert(CommitLog.timestampOf(root, 3L) === t2 + 500L)
    // Resolution: between stamps → earlier version; exact → that version;
    // future → latest; before the first commit → error.
    assert(CommitLog.versionAsOfTimestamp(root, t1) === 1L)
    assert(CommitLog.versionAsOfTimestamp(root, t2 - 1L) === 1L)
    assert(CommitLog.versionAsOfTimestamp(root, t2) === 2L)
    assert(CommitLog.versionAsOfTimestamp(root, t2 + 499L) === 2L)
    assert(CommitLog.versionAsOfTimestamp(root, Long.MaxValue) === 3L)
    intercept[IllegalArgumentException] {
      CommitLog.versionAsOfTimestamp(root, t1 - 1L)
    }
  }

  // ---- deletion vectors (merge-on-read DML) ----

  /** Two-generation table with SINGLE-FILE generations (deterministic row
    * positions): g=1 keys 1,2,3; g=2 keys 4,5. */
  private def dvTable(): String = {
    val root = Files.createTempDirectory("graft_dvspec").toString
    val s0 = spark
    import s0.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=1")
    CommitLog.commit(root, 1L, "g=1")
    Seq((4L, 40.0), (5L, 50.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=2")
    CommitLog.commit(root, 2L, "g=2")
    root
  }

  /** Write the (file, row-position) sidecar for the rows of `victims`
    * matching `pred`; returns its table-relative path. */
  private def writeDv(root: String, victims: Seq[String],
      pred: org.apache.spark.sql.Column, gen: String): String = {
    spark.read.parquet(victims.map(f => s"$root/$f"): _*)
      .where(pred)
      .select(
        expr("substring(regexp_replace(_metadata.file_path, '^file:/+', '/'), "
          + s"${root.length + 2})").as("f"),
        col("_metadata.row_index").cast("long").as("pos"))
      .coalesce(1).write.mode("overwrite").parquet(s"$root/$gen")
    Files.list(Paths.get(s"$root/$gen")).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")
        && !Paths.get(p).getFileName.toString.startsWith("."))
      .map(p => Paths.get(root).relativize(Paths.get(p)).toString)
      .sorted.head
  }

  private def keysAsOf(root: String, v: Long): Seq[Long] =
    CommitLog.readAsOf(spark, root, v)
      .select("key").collect().map(_.getLong(0)).sorted.toSeq

  test("deletion vectors: the attach is metadata-only and as-of isolated, " +
      "the MoR read subtracts positions via a broadcast anti-join with no " +
      "data-side shuffle, and a plain re-add clears the annotation") {
    val root = dvTable()
    val victims = CommitLog.filesAsOf(root, 2L).filter(_.startsWith("g=1/"))
    assert(victims.size === 1)
    val dv = writeDv(root, victims, col("key") === 2L, "dv3")
    val v3 = CommitLog.commitDVChecked(root, 2L, Map(victims.head -> dv))
    assert(v3 === 3L)
    // Metadata-only: the live FILE SET did not change, only its annotation
    // (the re-add does bump the victim's addedAt, so the scan ORDER may).
    assert(CommitLog.snapshotAsOf(root, 3L).live.toSet
      === CommitLog.snapshotAsOf(root, 2L).live.toSet)
    assert(CommitLog.snapshotAsOf(root, 3L).dvs === Map(victims.head -> dv))
    // The deleted position vanishes from v3 but STILL SERVES at v2 — the
    // annotation is versioned like any other log state.
    assert(keysAsOf(root, 3L) === Seq(1L, 3L, 4L, 5L))
    assert(keysAsOf(root, 2L) === Seq(1L, 2L, 3L, 4L, 5L))
    // Plan shape of the MoR read: broadcast anti-join on (file, position),
    // and the data side never shuffles (the only Exchange is the broadcast).
    val p = CommitLog.readAsOf(spark, root, 3L)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"MoR read must be a broadcast anti-join:\n$p")
    assert(!p.contains("Exchange hashpartitioning"),
      s"MoR read must not shuffle the data side:\n$p")
    // An add action is authoritative about its DV state: re-adding the
    // path bare (restore/compact output) starts clean.
    CommitLog.commitFiles(root, 4L, adds = victims, removes = Nil)
    assert(CommitLog.snapshotAsOf(root, 4L).dvs === Map.empty)
    assert(keysAsOf(root, 4L) === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("deletion vectors: the annotation survives checkpoint resolution, " +
      "retention protects the sidecar while its victims' tombstones serve, " +
      "and it is reclaimed once they expire") {
    val root = dvTable()
    val victims = CommitLog.filesAsOf(root, 2L).filter(_.startsWith("g=1/"))
    val dv = writeDv(root, victims, col("key") === 2L, "dv3")
    CommitLog.commitDVChecked(root, 2L, Map(victims.head -> dv))
    // Push past a checkpoint boundary with empty appends: resolution at
    // v10+ opens checkpoint + tail, and the annotation must ride it.
    (4L to 11L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    assert(CommitLog.logFilesForSnapshot(root, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")))
    assert(CommitLog.snapshotAsOf(root, 11L).dvs === Map(victims.head -> dv))
    assert(keysAsOf(root, 11L) === Seq(1L, 3L, 4L, 5L))
    // Vacuum with the file live: the referenced sidecar must survive.
    CommitLog.vacuum(root, 0L)
    assert(Files.exists(Paths.get(root, dv)), "sidecar of a LIVE file reclaimed")
    assert(keysAsOf(root, 11L) === Seq(1L, 3L, 4L, 5L))
    // Materialize: rewrite the victim applying its vector; the new add
    // carries no annotation, the victim tombstones with its dv reference.
    val s0 = spark
    import s0.implicits._
    CommitLog.readAsOf(spark, root, 11L)
      .where(col("g") === 1).select("key", "val").as[(Long, Double)]
      .toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=12")
    CommitLog.commitChecked(root, "g=12", 11L, reads = victims)
    // No LIVE file is annotated any more — the tombstoned victim's entry
    // stays in `dvs` by contract (vacuum retention still needs it).
    val snapM = CommitLog.snapshotAsOf(root, Long.MaxValue)
    assert(snapM.live.forall(f => !snapM.dvs.contains(f)))
    assert(snapM.dvs === Map(victims.head -> dv))
    // In-window tombstone (removed at 12, latest 12, retain 5): both the
    // victim and its sidecar must survive for as-of readers…
    CommitLog.vacuum(root, 5L)
    assert(Files.exists(Paths.get(root, victims.head)))
    assert(Files.exists(Paths.get(root, dv)))
    assert(keysAsOf(root, 11L) === Seq(1L, 3L, 4L, 5L))
    // …and retention 0 expires them together.
    CommitLog.vacuum(root, 0L)
    assert(!Files.exists(Paths.get(root, victims.head)))
    assert(!Files.exists(Paths.get(root, dv)), "expired sidecar not reclaimed")
    assert(keysAsOf(root, Long.MaxValue) === Seq(1L, 3L, 4L, 5L))
  }

  test("deletion vectors vs concurrent rewrite: whichever of attach and " +
      "compaction loses the version race aborts — in both orders") {
    // Order 1: compaction lands first, the late DV attach must abort (its
    // victim no longer exists; annotating it would resurrect nothing but
    // corrupt the read set).
    val rootA = dvTable()
    val victimsA = CommitLog.filesAsOf(rootA, 2L).filter(_.startsWith("g=1/"))
    val dvA = writeDv(rootA, victimsA, col("key") === 2L, "dv3")
    val s0 = spark
    import s0.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$rootA/g=3")
    assert(CommitLog.commitChecked(rootA, "g=3", 2L, reads = victimsA) === 3L)
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commitDVChecked(rootA, 2L, Map(victimsA.head -> dvA))
    }
    // Order 2: the attach lands first; a compaction that read the PRE-DV
    // snapshot must abort (it would materialize a rewrite WITHOUT the
    // delete — resurrecting the deleted rows through the swap).
    val rootB = dvTable()
    val victimsB = CommitLog.filesAsOf(rootB, 2L).filter(_.startsWith("g=1/"))
    val dvB = writeDv(rootB, victimsB, col("key") === 2L, "dv3")
    assert(CommitLog.commitDVChecked(rootB, 2L, Map(victimsB.head -> dvB)) === 3L)
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$rootB/g=3")
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commitChecked(rootB, "g=3", 2L, reads = victimsB)
    }
    assert(keysAsOf(rootB, Long.MaxValue) === Seq(1L, 3L, 4L, 5L),
      "the aborted compaction must not resurrect the deleted row")
  }

  test("MoR update (DV + adds) vs concurrent rewrite: whichever loses the " +
      "version race aborts whole — an aborted update lands NEITHER half " +
      "(no vector, no new image; the staged file is vacuum debris), and a " +
      "landed update makes the stale compaction abort") {
    val s0 = spark
    import s0.implicits._
    def stageUpd(root: String): Seq[String] = {
      Seq((2L, 21.0)).toDF("key", "val")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/g=9")
      Files.list(Paths.get(s"$root/g=9")).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")
          && !Paths.get(p).getFileName.toString.startsWith("."))
        .map(p => Paths.get(root).relativize(Paths.get(p)).toString).sorted
    }
    def valOfKey2(root: String): Seq[Double] =
      CommitLog.readAsOf(spark, root, Long.MaxValue)
        .where(col("key") === 2L).select("val")
        .collect().map(_.getDouble(0)).sorted.toSeq
    // Order 1: compaction lands first; the late update must abort WHOLE.
    val rootA = dvTable()
    val victimsA = CommitLog.filesAsOf(rootA, 2L).filter(_.startsWith("g=1/"))
    val dvA = writeDv(rootA, victimsA, col("key") === 2L, "dv3")
    val updA = stageUpd(rootA)
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$rootA/g=3")
    assert(CommitLog.commitChecked(rootA, "g=3", 2L, reads = victimsA) === 3L)
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commitDVChecked(rootA, 2L, Map(victimsA.head -> dvA),
        adds = updA)
    }
    assert(!CommitLog.filesAsOf(rootA, Long.MaxValue).exists(_.startsWith("g=9/")),
      "aborted update leaked its staged new image into the live set")
    assert(valOfKey2(rootA) === Seq(20.0),
      "aborted update must leave the old image alone (atomicity: no half-update)")
    val (_, removedA) = CommitLog.vacuum(rootA, 100L)
    assert(removedA >= 2L && !Files.exists(Paths.get(rootA, updA.head)),
      "the aborted update's staging must be vacuum-reclaimable debris")
    // Order 2: the update lands first; a compaction that read the
    // PRE-update snapshot must abort (it would drop the new image and
    // resurrect the old one through the swap).
    val rootB = dvTable()
    val victimsB = CommitLog.filesAsOf(rootB, 2L).filter(_.startsWith("g=1/"))
    val dvB = writeDv(rootB, victimsB, col("key") === 2L, "dv3")
    val updB = stageUpd(rootB)
    assert(CommitLog.commitDVChecked(rootB, 2L, Map(victimsB.head -> dvB),
      adds = updB) === 3L)
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$rootB/g=3")
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commitChecked(rootB, "g=3", 2L, reads = victimsB)
    }
    // Atomicity of the landed update: exactly the new image serves —
    // never both images, never neither.
    assert(valOfKey2(rootB) === Seq(21.0),
      "the landed MoR update must serve exactly the new image")
    assert(keysAsOf(rootB, Long.MaxValue) === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("shallow clone × deletion vectors: cloned annotations go absolute " +
      "(data file AND sidecar) and still subtract; a DV attached ON the " +
      "clone to a borrowed absolute-path file subtracts through the clone " +
      "and never touches the source") {
    // Scenario A: clone a table that ALREADY carries a DV. The clone's log
    // must reference both the victim and its sidecar by absolute path —
    // a relative sidecar would resolve under the CLONE root, miss, and
    // silently resurrect the deleted row.
    val src = dvTable()
    val victims = CommitLog.filesAsOf(src, 2L).filter(_.startsWith("g=1/"))
    val dv = writeDv(src, victims, col("key") === 2L, "dv3")
    CommitLog.commitDVChecked(src, 2L, Map(victims.head -> dv))
    val dst = Files.createTempDirectory("graft_clonedv").toString
    CommitLog.cloneTable(src, dst)
    val snapD = CommitLog.snapshotAsOf(dst, Long.MaxValue)
    assert(snapD.dvs.nonEmpty && snapD.dvs.forall { case (f, d) =>
      f.startsWith("/") && d.startsWith("/") },
      s"clone must borrow victim AND sidecar by absolute path: ${snapD.dvs}")
    assert(keysAsOf(dst, Long.MaxValue) === Seq(1L, 3L, 4L, 5L),
      "deleted row resurfaced through the clone's MoR read")
    assert(keysAsOf(dst, 2L) === Seq(1L, 2L, 3L, 4L, 5L),
      "pre-attach as-of through the clone must still serve the row")
    // The sidecar-key spelling (`dvf`) must ride checkpoint serialization:
    // push the clone past a checkpoint boundary and re-resolve from it.
    (4L to 11L).foreach(v => CommitLog.commitFiles(dst, v, Nil, Nil))
    assert(CommitLog.logFilesForSnapshot(dst, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")))
    assert(keysAsOf(dst, 11L) === Seq(1L, 3L, 4L, 5L),
      "clone dvf spelling lost through checkpoint resolution")

    // Scenario B: attach a DV ON a clone to a borrowed ABSOLUTE-path file.
    // The MoR read's URI lookup must not prefix the clone root onto the
    // absolute victim ($root//src/... never matches → silent resurrection).
    val src2 = dvTable()
    val dst2 = Files.createTempDirectory("graft_clonedv2").toString
    CommitLog.cloneTable(src2, dst2)
    val borrowed = CommitLog.filesAsOf(dst2, Long.MaxValue)
      .filter(_.contains("/g=1/"))
    assert(borrowed.nonEmpty && borrowed.forall(_.startsWith("/")))
    // Sidecar lands UNDER the clone root; its `f` keys must spell the
    // victim exactly as the clone's add actions do (absolute).
    spark.read.parquet(borrowed: _*)
      .where(col("key") === 2L)
      .select(expr("regexp_replace(_metadata.file_path, '^file:/+', '/')")
          .as("f"),
        col("_metadata.row_index").cast("long").as("pos"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dst2/dv_local")
    val dv2 = Files.list(Paths.get(s"$dst2/dv_local")).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")
        && !Paths.get(p).getFileName.toString.startsWith("."))
      .map(p => Paths.get(dst2).relativize(Paths.get(p)).toString)
      .sorted.head
    val v3 = CommitLog.commitDVChecked(dst2, 2L, Map(borrowed.head -> dv2))
    assert(v3 === 3L)
    assert(keysAsOf(dst2, Long.MaxValue) === Seq(1L, 3L, 4L, 5L),
      "DV on a borrowed absolute-path file must subtract through the clone")
    assert(keysAsOf(src2, Long.MaxValue) === Seq(1L, 2L, 3L, 4L, 5L),
      "the clone's DV must never leak into the source table")
  }

  test("check constraints: latest meta wins (drop = republish without), " +
      "UNKNOWN passes per SQL semantics, and the set survives checkpoint " +
      "resolution") {
    val root = dvTable() // v1: keys 1,2,3; v2: keys 4,5 (val = key*10)
    CommitLog.setConstraints(root, 3L, Seq("val > 15.0"))
    assert(CommitLog.constraintsAsOf(root, Long.MaxValue) === Seq("val > 15.0"))
    // v2's as-of world predates the declaration — constraints are
    // versioned state like everything else in the log.
    assert(CommitLog.constraintsAsOf(root, 2L) === Nil)
    // Enforcement: g=1 holds (1,10.0) and (2,20.0)|(3,30.0) → 1 violation.
    val g1 = CommitLog.filesAsOf(root, 2L).filter(_.startsWith("g=1/"))
    assert(CommitLog.validateAdds(spark, root, g1) === 1L)
    // UNKNOWN passes: a null-val row trips nothing under 'val > 15.0'.
    val s0 = spark
    import s0.implicits._
    Seq((9L, Option.empty[Double])).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=9")
    val g9 = Files.list(Paths.get(s"$root/g=9")).toArray.map(_.toString)
      .filter(_.endsWith(".parquet"))
      .map(p => Paths.get(root).relativize(Paths.get(p)).toString).toSeq
    assert(CommitLog.validateAdds(spark, root, g9) === 0L,
      "NULL must pass a CHECK (UNKNOWN is not a violation)")
    // Tighten + survive a checkpoint boundary: republishing the set is
    // the only mutation (latest meta wins), and resolution from
    // checkpoint + tail keeps it.
    CommitLog.setConstraints(root, 4L, Seq("val > 0.0", "key IS NOT NULL"))
    (5L to 11L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    assert(CommitLog.logFilesForSnapshot(root, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")))
    assert(CommitLog.constraintsAsOf(root, 11L)
      === Seq("val > 0.0", "key IS NOT NULL"))
    assert(CommitLog.validateAdds(spark, root, g1) === 0L,
      "the loosened set must accept g=1 again")
    // Drop everything: republish empty — enforcement ends.
    CommitLog.setConstraints(root, 12L, Nil)
    assert(CommitLog.constraintsAsOf(root, Long.MaxValue) === Nil)
  }

  test("check constraints: array-transport characters (',' '[' ']') are " +
      "rejected at write time — never silently corrupted on replay") {
    val root = dvTable()
    // The log's constraints array splits on ',' and closes at the first
    // ']'; an expression carrying either would round-trip WRONG. The
    // requireSafe discipline is reject-at-write with a clear error.
    Seq("key IN (1,2)", "arr[1] > 0", "x ]").foreach { bad =>
      val e = intercept[IllegalArgumentException] {
        CommitLog.setConstraints(root, 3L, Seq(bad))
      }
      assert(e.getMessage.contains("unsafe character in constraint"),
        s"wrong rejection message for $bad: ${e.getMessage}")
    }
    // Nothing was published by the rejected attempts.
    assert(CommitLog.constraintsAsOf(root, Long.MaxValue) === Nil)
    // The comma-free spelling of the same predicate commits and replays.
    CommitLog.setConstraints(root, 3L, Seq("key = 1 OR key = 2 OR key > 2"))
    assert(CommitLog.constraintsAsOf(root, Long.MaxValue)
      === Seq("key = 1 OR key = 2 OR key > 2"))
  }

  test("schema enforcement: as-of versioned, ordered-exact validation " +
      "(drift, extra, reorder all refuse), evolution gates the same " +
      "producer differently, and the declaration survives a checkpoint") {
    val root = dvTable() // v1/v2 predate any declaration
    // Undeclared table accepts anything (pre-enforcement behavior).
    assert(CommitLog.validateSchemaGen(spark, root, "g=1").isEmpty)
    CommitLog.setSchema(root, 3L, Seq("key" -> "bigint", "val" -> "double"))
    assert(CommitLog.schemaAsOf(root, Long.MaxValue)
      === Seq("key bigint", "val double"))
    assert(CommitLog.schemaAsOf(root, 2L) === Nil,
      "v2's as-of world must predate the declaration")
    // Conforming staging validates clean.
    assert(CommitLog.validateSchemaGen(spark, root, "g=1").isEmpty)
    val s0 = spark
    import s0.implicits._
    // Type drift refuses with the drifted type named.
    Seq((7L, "oops")).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=drift")
    assert(CommitLog.validateSchemaGen(spark, root, "g=drift")
      .exists(_.contains("val string")))
    // Column order is part of the contract (positional readers exist).
    Seq((1.0, 7L)).toDF("val", "key")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=reorder")
    assert(CommitLog.validateSchemaGen(spark, root, "g=reorder").isDefined)
    // Extra column refuses until a deliberate evolution declares it.
    Seq((7L, 70.0, 21L)).toDF("key", "val", "extra")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=wide")
    assert(CommitLog.validateSchemaGen(spark, root, "g=wide").isDefined)
    CommitLog.setSchema(root, 4L,
      Seq("key" -> "bigint", "val" -> "double", "extra" -> "bigint"))
    assert(CommitLog.validateSchemaGen(spark, root, "g=wide").isEmpty,
      "the wide staging must validate clean after evolution")
    assert(CommitLog.validateSchemaGen(spark, root, "g=drift").isDefined,
      "the drifted staging must stay refused after evolution")
    // Transport-unsafe entries are rejected at write time, like constraints.
    val e = intercept[IllegalArgumentException] {
      CommitLog.setSchema(root, 5L, Seq("a,b" -> "bigint"))
    }
    assert(e.getMessage.contains("unsafe character in schema entry"))
    // The declaration rides checkpoints: resolution from checkpoint + tail.
    (5L to 11L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    assert(CommitLog.logFilesForSnapshot(root, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")))
    assert(CommitLog.schemaAsOf(root, 11L)
      === Seq("key bigint", "val double", "extra bigint"))
  }

  test("column mapping and tags: as-of versioned, latest set wins, " +
      "orthogonal to other facets, checkpoint-carried, unsafe names " +
      "rejected at write") {
    val root = dvTable() // v1/v2 data commits
    CommitLog.setColMap(root, 3L, Seq("amount" -> "val"))
    CommitLog.setTags(root, 4L, Seq("stable" -> 1L, "candidate" -> 2L))
    assert(CommitLog.colMapAsOf(root, 2L) === Nil,
      "pre-declaration snapshots carry no mapping")
    assert(CommitLog.colMapAsOf(root, Long.MaxValue) === Seq(("amount", "val")))
    assert(CommitLog.versionOfTag(root, "stable") === 1L)
    assert(CommitLog.readAsOfMapped(spark, root, Long.MaxValue)
      .columns.contains("amount"))
    assert(!CommitLog.readAsOfMapped(spark, root, 2L)
      .columns.contains("amount"),
      "a pre-rename pinned read must keep the physical name")
    // Facets are orthogonal: a later tag republish leaves the mapping.
    CommitLog.setTags(root, 5L, Seq("stable" -> 2L))
    assert(CommitLog.colMapAsOf(root, Long.MaxValue) === Seq(("amount", "val")))
    assert(CommitLog.versionOfTag(root, "stable") === 2L)
    val eTag = intercept[IllegalArgumentException] {
      CommitLog.setTags(root, 6L, Seq("a,b" -> 1L))
    }
    assert(eTag.getMessage.contains("unsafe character in tag name"))
    val eMap = intercept[IllegalArgumentException] {
      CommitLog.setColMap(root, 6L, Seq("a b" -> "val"))
    }
    assert(eMap.getMessage.contains("unsafe character in column-mapping"))
    // Unknown tag resolution is a clear error, not a silent default.
    val eMiss = intercept[IllegalArgumentException] {
      CommitLog.versionOfTag(root, "nope")
    }
    assert(eMiss.getMessage.contains("unknown tag"))
    // Both facets ride checkpoints.
    (6L to 11L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    assert(CommitLog.logFilesForSnapshot(root, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")))
    assert(CommitLog.colMapAsOf(root, 11L) === Seq(("amount", "val")))
    assert(CommitLog.versionOfTag(root, "stable") === 2L)
  }

  test("merge-on-read with a URI-hostile table root (space, '%', '#'): " +
      "deleted positions are subtracted, never silently resurfaced") {
    // `_metadata.file_path` is a PERCENT-ENCODED file: URI; a textual
    // match against the raw path misses on these characters and the
    // anti-join silently passes deleted rows through. The read side must
    // reproduce the encoding exactly (java.io.File.toURI).
    val root = Files.createTempDirectory("graft_dv uri%41#").toString
    val s0 = spark
    import s0.implicits._
    Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=1")
    CommitLog.commit(root, 1L, "g=1")
    val victims = CommitLog.filesAsOf(root, 1L)
    assert(victims.size === 1)
    // Sidecar built driver-side (the victim's table-relative path is
    // known): positions of key=2 from the hidden row index.
    val pos = spark.read.parquet(s"$root/${victims.head}")
      .where(col("key") === 2L)
      .select(col("_metadata.row_index").cast("long"))
      .collect().map(_.getLong(0)).toSeq
    assert(pos.nonEmpty)
    pos.map(p => (victims.head, p)).toDF("f", "pos")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/dv2")
    val dv = Files.list(Paths.get(s"$root/dv2")).toArray.map(_.toString)
      .filter(p => p.endsWith(".parquet")
        && !Paths.get(p).getFileName.toString.startsWith("."))
      .map(p => Paths.get(root).relativize(Paths.get(p)).toString)
      .sorted.head
    CommitLog.commitDVChecked(root, 1L, Map(victims.head -> dv))
    assert(keysAsOf(root, 2L) === Seq(1L, 3L),
      "deleted row resurfaced under a URI-hostile root — the MoR join " +
        "missed on percent-encoding")
    assert(keysAsOf(root, 1L) === Seq(1L, 2L, 3L))
  }

  test("bloom file index: NO false negatives over every committed key, " +
      "bloom-less files are never pruned, a bloom-less re-add clears the " +
      "words, and the index survives checkpoint resolution") {
    val root = Files.createTempDirectory("graft_bloomidx").toString
    val s0 = spark
    import s0.implicits._
    // Three hash-bucketed files with interleaved (UNCLUSTERED) keys: the
    // min/max ranges all span the domain, so only the bloom can prune.
    val byFile = Map(
      "g=0" -> Seq(3L, 300L, 900L),
      "g=1" -> Seq(7L, 450L, 888L),
      "g=2" -> Seq(11L, 600L, 901L))
    def stage(gen: String, keys: Seq[Long]): String = {
      keys.map(k => (k, k * 10.0)).toDF("key", "val")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/$gen")
      Files.list(Paths.get(s"$root/$gen")).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")
          && !Paths.get(p).getFileName.toString.startsWith("."))
        .map(p => Paths.get(root).relativize(Paths.get(p)).toString).head
    }
    val files = byFile.map { case (g, ks) => g -> stage(g, ks) }
    def bloomOf(keys: Seq[Long]): String = CommitLog.bloomHexOf(
      keys.flatMap(CommitLog.bloomBitsOf)
        .groupBy(b => (b / 64L).toInt)
        .view.mapValues(_.map(b => 1L << (b % 64L).toInt).reduce(_ | _)).toMap)
    val stats = byFile.map { case (g, ks) => files(g) -> (ks.min, ks.max) }
    val blooms = byFile.map { case (g, ks) => files(g) -> bloomOf(ks) }
    CommitLog.commitFiles(root, 1L, adds = files.values.toSeq.sorted,
      removes = Nil, stats = stats, blooms = blooms)
    // THE safety law: for EVERY committed key, the file that holds it
    // survives the point prune (bloom false negatives are impossible).
    byFile.foreach { case (g, ks) =>
      ks.foreach { k =>
        val kept = CommitLog.filesAsOfPrunedPoint(root, Long.MaxValue, k)
        assert(kept.contains(files(g)),
          s"bloom pruning dropped the file holding key $k ($g)")
      }
    }
    // Pruning power: a key present in exactly one file prunes to (almost)
    // one file — and the min/max facet alone keeps all three (domains
    // overlap), which is the gap the bloom exists to close.
    assert(CommitLog.filesAsOfPruned(root, Long.MaxValue, 450L, 450L).size === 3)
    val kept450 = CommitLog.filesAsOfPrunedPoint(root, Long.MaxValue, 450L)
    assert(kept450.contains(files("g=1")) && kept450.size < 3)
    // An ABSENT mid-domain key may hit false positives but never errors;
    // with these tiny files it prunes everything (all words near-empty).
    assert(CommitLog.filesAsOfPrunedPoint(root, Long.MaxValue, 451L).size <= 1)
    // Bloom-less files are never pruned: append a file with range stats
    // but NO words — every probe keeps it.
    val f3 = stage("g=3", Seq(5000L))
    CommitLog.commitFiles(root, 2L, adds = Seq(f3), removes = Nil,
      stats = Map(f3 -> (1L, 5000L)))
    assert(CommitLog.filesAsOfPrunedPoint(root, Long.MaxValue, 450L).contains(f3),
      "a file without bloom words must be kept conservatively")
    // Checkpoint carry: push past the boundary, resolution from
    // checkpoint + tail must keep pruning (and keep the safety law).
    (3L to 11L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    assert(CommitLog.logFilesForSnapshot(root, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")))
    val keptCp = CommitLog.filesAsOfPrunedPoint(root, 11L, 450L)
    assert(keptCp.contains(files("g=1")) && !keptCp.contains(files("g=0")),
      s"bloom words lost across the checkpoint horizon: $keptCp")
    // Authority rule: a bloom-less re-add of g=1's file clears its words —
    // the file reverts to un-probeable (kept for every key), stats too.
    CommitLog.commitFiles(root, 12L, adds = Seq(files("g=1")), removes = Nil)
    assert(CommitLog.snapshotAsOf(root, 12L).blooms.get(files("g=1")).isEmpty)
    assert(CommitLog.filesAsOfPrunedPoint(root, 12L, 3L).contains(files("g=1")),
      "a bloom-less re-add must clear the stale words")
    // Malformed words are rejected at write time (requireSafe discipline).
    intercept[IllegalArgumentException] {
      CommitLog.commitFiles(root, 13L, adds = Seq(f3), removes = Nil,
        blooms = Map(f3 -> "deadbeef"))
    }
  }

  test("protocol gating: a raised minReader refuses the data read (never " +
      "misreads), pre-bump snapshots stay readable, the facet survives " +
      "checkpoints, metadata tooling keeps working, and latest-wins can " +
      "restore readability") {
    val root = freshTable() // v1, v2 data commits
    assert(CommitLog.readAsOf(spark, root, Long.MaxValue).count() === 5L)
    CommitLog.setMinReader(root, 3L, CommitLog.SupportedReaderVersion + 1L)
    intercept[UnsupportedOperationException] {
      CommitLog.readAsOf(spark, root, Long.MaxValue).count()
    }
    // As-of BEFORE the bump: the per-snapshot protocol allows the read.
    assert(CommitLog.readAsOf(spark, root, 2L).count() === 5L)
    // Metadata surfaces are NOT gated (tooling must see the table to
    // diagnose it): file listing, history, vacuum all work.
    assert(CommitLog.filesAsOf(root, Long.MaxValue).nonEmpty)
    assert(CommitLog.history(root).size === 3)
    CommitLog.vacuum(root, 100L): Unit
    // Checkpoint carry: resolution from checkpoint + tail keeps refusing.
    (4L to 11L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    assert(CommitLog.logFilesForSnapshot(root, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")))
    intercept[UnsupportedOperationException] {
      CommitLog.readAsOf(spark, root, 11L).count()
    }
    // Latest-wins: an UPGRADE of this engine (or a feature rollback by
    // the writer) republishes a supported floor and reads resume.
    CommitLog.setMinReader(root, 12L, CommitLog.SupportedReaderVersion)
    assert(CommitLog.readAsOf(spark, root, Long.MaxValue).count() === 5L)
  }

  test("writer protocol gating: a raised minWriter refuses EVERY commit " +
      "surface and vacuum (pre-bump writes worked), reads and metadata " +
      "listing stay open, the floor survives checkpoints, a stale writer " +
      "cannot restore it, and a capable writer can") {
    val root = freshTable() // v1, v2 = the pre-bump writes; they landed
    val s0 = spark
    import s0.implicits._
    // Fill to v9 so the capable writer's floor bump at v10 writes the
    // checkpoint that must carry the facet.
    (3L to 9L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    CommitLog.setMinWriter(root, 10L, CommitLog.SupportedWriterVersion + 1L,
      asWriterVersion = CommitLog.SupportedWriterVersion + 1L)
    assert(CommitLog.logFilesForSnapshot(root, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")),
      "the bump commit must have produced the checkpoint this test pins")
    // Every mutating surface this engine has refuses — commit kinds,
    // meta facets, DV attach, protocol writes, and vacuum (which deletes
    // data on the strength of its own log interpretation)…
    intercept[UnsupportedOperationException] {
      CommitLog.commit(root, 11L, "g=1")
    }
    intercept[UnsupportedOperationException] {
      CommitLog.commitFiles(root, 11L, Nil, Nil)
    }
    intercept[UnsupportedOperationException] {
      CommitLog.commitChecked(root, "g=1", 10L, reads = Nil)
    }
    intercept[UnsupportedOperationException] {
      CommitLog.commitDVChecked(root, 10L, Map("g=1/x.parquet" -> "dv/x"))
    }
    intercept[UnsupportedOperationException] {
      CommitLog.setConstraints(root, 11L, Seq("key > 0"))
    }
    intercept[UnsupportedOperationException] {
      CommitLog.setGencolDiv(root, 11L, 2L)
    }
    intercept[UnsupportedOperationException] {
      CommitLog.setMinReader(root, 11L, CommitLog.SupportedReaderVersion)
    }
    // …including a STALE writer trying to lower the floor back down.
    intercept[UnsupportedOperationException] {
      CommitLog.setMinWriter(root, 11L, CommitLog.SupportedWriterVersion)
    }
    intercept[UnsupportedOperationException] { CommitLog.vacuum(root) }
    // …and nothing landed.
    assert(CommitLog.latestVersion(root) === 10L)
    // The READ half is untouched by the writer floor: that is the point
    // of splitting the two — a stale engine still queries the table.
    assert(CommitLog.readAsOf(spark, root, Long.MaxValue).count() === 5L)
    assert(CommitLog.filesAsOf(root, Long.MaxValue).nonEmpty)
    assert(CommitLog.history(root).nonEmpty)
    // A writer may never declare a floor above its own support.
    intercept[IllegalArgumentException] {
      CommitLog.setMinWriter(root, 11L, CommitLog.SupportedWriterVersion + 2L,
        asWriterVersion = CommitLog.SupportedWriterVersion + 1L)
    }
    // Floor-restore (feature rollback) by a CAPABLE writer; this engine's
    // writes then resume.
    CommitLog.setMinWriter(root, 11L, CommitLog.SupportedWriterVersion,
      asWriterVersion = CommitLog.SupportedWriterVersion + 1L)
    Seq((9L, 90.0)).toDF("key", "val")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/g=3")
    CommitLog.commit(root, 12L, "g=3")
    assert(CommitLog.readAsOf(spark, root, Long.MaxValue).count() === 6L)
  }

  test("ANN index refit vs append arbitration: a non-consuming append whose " +
      "read set a refit retired ABORTS (incompatible geometry never lands); " +
      "a refit landing after an append atomically retires the delta too") {
    // The sim_index_log protocol reduced to its log actions: base code
    // files at v1, an 'append' = commitCheckedNonConsuming reading them,
    // a 'refit' = replace commit whose removes resolve at landing time.
    val root = Files.createTempDirectory("graft_annarb").toString
    val s0 = spark
    import s0.implicits._
    def stage(gen: String, keys: Seq[Long]): Seq[String] = {
      keys.map(k => (k, k * 1.0)).toDF("vec_id", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/$gen")
      Files.list(Paths.get(s"$root/$gen")).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")
          && !Paths.get(p).getFileName.toString.startsWith("."))
        .map(p => Paths.get(root).relativize(Paths.get(p)).toString).sorted.toSeq
    }
    val base = stage("s1", Seq(1L, 2L))
    CommitLog.commitFiles(root, 1L, adds = base, removes = Nil)
    // ORDER A: the refit lands first (replace commit, removes = live at
    // landing), then the append — whose read snapshot predates the refit —
    // must abort: its cell assignments were derived from retired geometry.
    val refitA = stage("s2", Seq(10L, 20L))
    val vA = CommitLog.commitRetrying(root, "s2",
      removesAsOf = v => CommitLog.filesAsOf(root, v - 1L),
      addsKnown = Some(refitA))
    assert(vA === 2L)
    val deltaA = stage("d1", Seq(3L))
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commitCheckedNonConsuming(root, "d1", 1L,
        reads = base, addsKnown = Some(deltaA))
    }
    // Nothing of the aborted append is visible; the refit serves alone.
    assert(CommitLog.filesAsOf(root, Long.MaxValue).toSet === refitA.toSet)
    // ORDER B: an append lands first (reads the refit-A files), then a
    // refit whose removes resolve AT LANDING retires base AND delta in
    // one atomic action list — no stale-geometry rows survive it.
    val deltaB = stage("d2", Seq(30L))
    val vB = CommitLog.commitCheckedNonConsuming(root, "d2", vA,
      reads = refitA, addsKnown = Some(deltaB))
    assert(vB === 3L)
    assert(CommitLog.filesAsOf(root, Long.MaxValue).toSet
      === (refitA ++ deltaB).toSet)
    val refitB = stage("s3", Seq(100L, 200L))
    val vC = CommitLog.commitRetrying(root, "s3",
      removesAsOf = v => CommitLog.filesAsOf(root, v - 1L),
      addsKnown = Some(refitB))
    assert(vC === 4L)
    assert(CommitLog.filesAsOf(root, Long.MaxValue).toSet === refitB.toSet,
      "an interleaved append must not survive a landing-time-resolved refit")
    // RETRY path: losing the version race to a DISJOINT commit (a
    // constraint declaration — nothing removed) must NOT abort the
    // append; it revalidates and lands ABOVE the interloper.
    CommitLog.setConstraints(root, 5L, Seq("vec_id IS NOT NULL"))
    val deltaC = stage("d3", Seq(300L))
    val vD = CommitLog.commitCheckedNonConsuming(root, "d3", 4L,
      reads = refitB, addsKnown = Some(deltaC))
    assert(vD === 6L, s"disjoint-commit retry must land above, got $vD")
    assert(CommitLog.filesAsOf(root, Long.MaxValue).toSet
      === (refitB ++ deltaC).toSet)

    // Time travel still serves every retired index version…
    assert(CommitLog.filesAsOf(root, vB).toSet === (refitA ++ deltaB).toSet)
    assert(CommitLog.filesAsOf(root, 1L).toSet === base.toSet)
    // …until vacuum reclaims the refit-retired artifacts.
    CommitLog.vacuum(root, 0L)
    base.foreach(f => assert(!Files.exists(Paths.get(root, f)),
      s"retired base file $f must be reclaimed"))
    refitB.foreach(f => assert(Files.exists(Paths.get(root, f))))
  }

  test("graph-ANN artifact refit arbitration: both race orders on the " +
      "(kind, tier, src, dst) artifact — a racing append aborts, a " +
      "landing-time refit retires base AND delta, and the pre-refit " +
      "version stays row-level time-travelable") {
    // sim_graph_ann_refit's log protocol on the actual artifact schema:
    // v1 = day-0 build, v2 = non-consuming append reading v1, v3 =
    // replace-commit refit (removes resolve at landing).
    val root = Files.createTempDirectory("graft_gannarb").toString
    val s0 = spark
    import s0.implicits._
    def stage(gen: String, rows: Seq[(String, Long, Long, Long)]): Seq[String] = {
      rows.toDF("kind", "tier", "src", "dst")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/$gen")
      Files.list(Paths.get(s"$root/$gen")).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")
          && !Paths.get(p).getFileName.toString.startsWith("."))
        .map(p => Paths.get(root).relativize(Paths.get(p)).toString).sorted.toSeq
    }
    val art1 = Seq(("node", 1L, 1L, 0L), ("edge", 0L, 1L, 2L))
    val art2 = Seq(("node", 0L, 9L, 0L), ("edge", 0L, 9L, 1L))
    val base = stage("s1", art1)
    CommitLog.commitFiles(root, 1L, adds = base, removes = Nil)
    // ORDER B first (append lands, refit retires both): the refit query's
    // own flow.
    val delta = stage("s2", art2)
    val v2 = CommitLog.commitCheckedNonConsuming(root, "s2", 1L,
      reads = base, addsKnown = Some(delta))
    assert(v2 === 2L)
    val refit = stage("s3", Seq(("node", 2L, 1L, 0L), ("node", 0L, 9L, 1L)))
    val v3 = CommitLog.commitRetrying(root, "s3",
      removesAsOf = v => CommitLog.filesAsOf(root, v - 1L),
      addsKnown = Some(refit))
    assert(v3 === 3L)
    assert(CommitLog.filesAsOf(root, v3).toSet === refit.toSet,
      "the refit must atomically retire the base AND the appended delta")
    // ORDER A: an append whose read snapshot predates the refit aborts.
    stage("s4", art2)
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commitCheckedNonConsuming(root, "s4", 1L, reads = base)
    }
    // Row-level time travel: asof v2 reproduces base ∪ delta exactly.
    val atV2 = CommitLog.readAsOf(s0, root, 2L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq.sorted
    assert(atV2 === (art1 ++ art2).sorted,
      "pre-refit artifact rows must stay reproducible at their version")
  }

  test("nightly append vs recalibration arbitration: an append calibrated " +
      "against retired history ABORTS (no mixed zero-point regimes ever " +
      "serve); a recalibration landing after a nightly atomically retires " +
      "the night rows it would mis-calibrate") {
    // pipeline_nightly's commit protocol reduced to its log actions: the
    // standing light-curve table at v1, a 'nightly' =
    // commitCheckedNonConsuming whose read set is the history its
    // zero-point was derived from, a 'recalibration' = replace commit
    // whose removes resolve at landing time.
    val root = Files.createTempDirectory("graft_nightlyarb").toString
    val s0 = spark
    import s0.implicits._
    def stage(gen: String, rows: Seq[(Long, Long, Double)]): Seq[String] = {
      rows.toDF("u", "day", "mag")
        .coalesce(1).write.mode("overwrite").parquet(s"$root/$gen")
      Files.list(Paths.get(s"$root/$gen")).toArray.map(_.toString)
        .filter(p => p.endsWith(".parquet")
          && !Paths.get(p).getFileName.toString.startsWith("."))
        .map(p => Paths.get(root).relativize(Paths.get(p)).toString).sorted.toSeq
    }
    def magsNow(): Seq[Double] =
      CommitLog.readAsOf(spark, root, Long.MaxValue)
        .select("mag").collect().map(_.getDouble(0)).sorted.toSeq
    // v1: the standing table under zero-point regime A.
    val hist = stage("h1", Seq((1L, 10L, 20.0), (2L, 10L, 21.0)))
    CommitLog.commitFiles(root, 1L, adds = hist, removes = Nil)
    // ORDER A: a recalibration (regime B, −0.5 shift) lands first as a
    // replace commit; the nightly — calibrated against regime A's files —
    // must ABORT, because appending it would mix zero-point regimes.
    val recalA = stage("h2", Seq((1L, 10L, 19.5), (2L, 10L, 20.5)))
    assert(CommitLog.commitRetrying(root, "h2",
      removesAsOf = v => CommitLog.filesAsOf(root, v - 1L),
      addsKnown = Some(recalA)) === 2L)
    val nightA = stage("n1", Seq((1L, 11L, 20.1)))
    intercept[java.util.ConcurrentModificationException] {
      CommitLog.commitCheckedNonConsuming(root, "n1", 1L,
        reads = hist, addsKnown = Some(nightA))
    }
    assert(magsNow() === Seq(19.5, 20.5),
      "an aborted nightly must leave exactly the recalibrated regime serving")
    // ORDER B: a nightly calibrated against regime B lands cleanly…
    val nightB = stage("n2", Seq((1L, 11L, 19.6)))
    assert(CommitLog.commitCheckedNonConsuming(root, "n2", 2L,
      reads = recalA, addsKnown = Some(nightB)) === 3L)
    assert(magsNow() === Seq(19.5, 19.6, 20.5))
    // …then a later full recalibration (regime C) resolves its removes AT
    // LANDING: history and the regime-B night retire in ONE atomic action
    // list — no mixed-regime row survives the swap.
    val recalC = stage("h3",
      Seq((1L, 10L, 19.0), (2L, 10L, 20.0), (1L, 11L, 19.1)))
    assert(CommitLog.commitRetrying(root, "h3",
      removesAsOf = v => CommitLog.filesAsOf(root, v - 1L),
      addsKnown = Some(recalC)) === 4L)
    assert(CommitLog.filesAsOf(root, Long.MaxValue).toSet === recalC.toSet,
      "the landing-time recalibration must retire the interleaved night too")
    assert(magsNow() === Seq(19.0, 19.1, 20.0))
    // Time travel serves each retired regime inside retention; the aborted
    // night's staging is debris vacuum reclaims.
    assert(CommitLog.filesAsOf(root, 3L).toSet === (recalA ++ nightB).toSet)
    assert(CommitLog.filesAsOf(root, 1L).toSet === hist.toSet)
    CommitLog.vacuum(root, 0L)
    nightA.foreach(f => assert(!Files.exists(Paths.get(root, f)),
      s"aborted nightly staging $f must be vacuum-reclaimed"))
    recalC.foreach(f => assert(Files.exists(Paths.get(root, f))))
  }

  test("file skipping: stat-less files are never pruned, boundaries are " +
      "inclusive, a stat-less re-add clears stats, and stats survive " +
      "checkpoint resolution") {
    val root = Files.createTempDirectory("graft_skipstats").toString
    val s0 = spark
    import s0.implicits._
    def stage(rows: Seq[(Long, Double)], gen: String): String = {
      rows.toDF("key", "val").coalesce(1).write.mode("overwrite")
        .parquet(s"$root/$gen")
      Files.list(Paths.get(s"$root/$gen")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
        .map(p => Paths.get(root).relativize(Paths.get(p)).toString).head
    }
    val fA = stage(Seq((10L, 1.0), (19L, 2.0)), "g=1") // range [10, 19]
    val fB = stage(Seq((30L, 3.0), (39L, 4.0)), "g=2") // range [30, 39]
    val fC = stage(Seq((50L, 5.0)), "g=3")             // NO stats declared
    CommitLog.commitFiles(root, 1L, adds = Seq(fA, fB, fC), removes = Nil,
      stats = Map(fA -> (10L, 19L), fB -> (30L, 39L)))
    // A disjoint probe keeps only the stat-less file (conservative).
    assert(CommitLog.filesAsOfPruned(root, Long.MaxValue, 60L, 70L) === Seq(fC),
      "a stat-less file must never be pruned")
    // Boundary inclusivity: lo == file max and hi == file min both keep.
    assert(CommitLog.filesAsOfPruned(root, Long.MaxValue, 19L, 25L).toSet
      === Set(fA, fC), "lo == smax must keep the file")
    assert(CommitLog.filesAsOfPruned(root, Long.MaxValue, 25L, 30L).toSet
      === Set(fB, fC), "hi == smin must keep the file")
    // A stat-less RE-ADD of the same path clears its stats (the add is
    // authoritative — same rule as deletion vectors).
    CommitLog.commitFiles(root, 2L, adds = Seq(fA), removes = Nil)
    assert(CommitLog.filesAsOfPruned(root, Long.MaxValue, 60L, 70L).toSet
      === Set(fA, fC), "a stat-less re-add must leave the file un-skippable")
    // Re-declare and push past a checkpoint boundary: pruning still works
    // when resolution starts from the checkpoint, not the stat commit.
    CommitLog.commitFiles(root, 3L, adds = Seq(fA), removes = Nil,
      stats = Map(fA -> (10L, 19L)))
    (4L to 11L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    assert(CommitLog.logFilesForSnapshot(root, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")))
    assert(CommitLog.filesAsOfPruned(root, 11L, 60L, 70L) === Seq(fC),
      "stats must survive checkpoint resolution")
    assert(CommitLog.filesAsOfPruned(root, 11L, 12L, 15L).toSet === Set(fA, fC),
      "an intersecting probe must keep the stat-bearing file")
  }

  test("gencol pruning: declaration is as-of versioned and orthogonal to " +
      "constraints, non-partitioned files are kept conservatively, and the " +
      "declaration survives checkpoint resolution") {
    val root = Files.createTempDirectory("graft_gencol").toString
    val s0 = spark
    import s0.implicits._
    def stage(rows: Seq[(Long, Double)], gen: String): String = {
      rows.toDF("key", "val").coalesce(1).write.mode("overwrite")
        .parquet(s"$root/$gen")
      Files.list(Paths.get(s"$root/$gen")).toArray.map(_.toString)
        .filter(_.endsWith(".parquet"))
        .map(p => Paths.get(root).relativize(Paths.get(p)).toString).head
    }
    // A file added BEFORE any declaration never prunes (no spec bound).
    val fPre = stage(Seq((5L, 0.5)), "g=0")
    CommitLog.commitFiles(root, 1L, adds = Seq(fPre), removes = Nil)
    CommitLog.setGencolDiv(root, 2L, 10L)
    assert(CommitLog.gencolDivAsOf(root, 1L) === None,
      "the declaration must be as-of versioned")
    assert(CommitLog.gencolDivAsOf(root, Long.MaxValue) === Some(10L))
    val f0 = stage(Seq((7L, 1.0)), "s1/g=0")  // keys div 10 = 0
    val f2 = stage(Seq((25L, 2.0)), "s1/g=2") // keys div 10 = 2
    val fX = stage(Seq((99L, 3.0)), "extra")  // NOT in a g= partition
    CommitLog.commitFiles(root, 3L, adds = Seq(f0, f2, fX), removes = Nil)
    // Probe keys [20, 29] -> g = 2 only; the pre-spec file and the
    // non-partitioned file stay conservatively.
    assert(CommitLog.filesAsOfGencolPruned(root, Long.MaxValue, 20L, 29L).toSet
      === Set(fPre, f2, fX),
      "s1/g=0 must prune; pre-spec and non-partitioned files must stay")
    // PARTITION-SPEC EVOLUTION: re-declare a finer width; files keep the
    // spec they were written under, new files bind the new one.
    CommitLog.setGencolDiv(root, 4L, 5L)
    val f4 = stage(Seq((22L, 4.0)), "s2/g=4") // keys div 5 = 4
    val f9 = stage(Seq((46L, 5.0)), "s2/g=9") // keys div 5 = 9
    CommitLog.commitFiles(root, 5L, adds = Seq(f4, f9), removes = Nil)
    // [20, 29]: under w=5 that is g in [4, 5] -> f4 kept, f9 pruned;
    // f2 (written under w=10, g=2 covers [20, 30)) MUST still be kept —
    // applying the latest spec to it (2 not in [4, 5]) would wrongly
    // prune a matching file.
    assert(CommitLog.filesAsOfGencolPruned(root, Long.MaxValue, 20L, 29L).toSet
      === Set(fPre, f2, fX, f4),
      "old files must prune under THEIR spec, new files under the new one")
    // Constraints are an orthogonal meta facet — declaring them must not
    // clear the gencol (and vice versa).
    CommitLog.setConstraints(root, 6L, Seq("val > 0.0"))
    assert(CommitLog.gencolDivAsOf(root, Long.MaxValue) === Some(5L),
      "a constraints meta commit must not clear the gencol declaration")
    (7L to 11L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    assert(CommitLog.logFilesForSnapshot(root, 11L).exists(
      _.getFileName.toString.endsWith(".checkpoint.json")))
    assert(CommitLog.gencolDivAsOf(root, 11L) === Some(5L),
      "the declaration must survive checkpoint resolution")
    assert(CommitLog.constraintsAsOf(root, 11L) === Seq("val > 0.0"),
      "both meta facets must ride the checkpoint")
    // The PER-FILE widths survive the checkpoint too ("gw" on the adds) —
    // replay must not rebind old files to the latest spec.
    assert(CommitLog.filesAsOfGencolPruned(root, 11L, 20L, 29L).toSet
      === Set(fPre, f2, fX, f4),
      "per-file specs must survive checkpoint resolution")
  }

  test("columnar checkpoint: every Snapshot facet is equivalent to the " +
      "JSON path, and a tail remove replays over it") {
    val root = freshTable()
    // Annotate heavily so the equivalence covers every facet: stats +
    // bloom on a re-add, dv sidecar, every meta facet, a tombstone.
    CommitLog.setConstraints(root, 3L, Seq("val > 0.0"))
    CommitLog.setSchema(root, 4L, Seq("key" -> "bigint", "val" -> "double"))
    CommitLog.setColMap(root, 5L, Seq("key" -> "k_phys"))
    CommitLog.setTags(root, 6L, Seq("rel" -> 2L))
    CommitLog.setGencolDiv(root, 7L, 10L)
    val f1 = CommitLog.filesAsOf(root, 1L).head
    val f2 = CommitLog.filesAsOf(root, 2L).filterNot(_ == f1).head
    // v8: rewrite f1 (remove + re-add at the same path is illegal; re-add
    // the OTHER file with annotations and tombstone f1).
    CommitLog.commitFiles(root, 8L, adds = Seq(f2), removes = Seq(f1),
      dvs = Map(f2 -> "dv/f2.parquet"),
      stats = Map(f2 -> (2L, 4L)), blooms = Map(f2 -> ("0" * 1020 + "00ff")))
    (9L to 10L).foreach(v => CommitLog.commitFiles(root, v, Nil, Nil))
    CommitLog.writeParquetCheckpoint(spark, root, 10L)
    // Tail past the columnar checkpoint: one more add, then a remove.
    val s0 = spark
    import s0.implicits._
    Seq((9L, 90.0)).toDF("key", "val")
      .write.mode("overwrite").parquet(s"$root/g=3")
    CommitLog.commit(root, 11L, "g=3")
    val f3 = CommitLog.filesAsOf(root, 11L).filterNot(Set(f1, f2)).head
    CommitLog.commitFiles(root, 12L, Nil, removes = Seq(f2))
    Seq(10L, 11L, 12L).foreach { v =>
      val j = CommitLog.snapshotAsOf(root, v)
      val q = CommitLog.snapshotAsOfParquet(spark, root, v)
      assert(q === j, s"columnar resolution diverged from JSON at v=$v")
    }
    val fin = CommitLog.snapshotAsOfParquet(spark, root, 12L)
    assert(!fin.live.contains(f2) && fin.live.contains(f3),
      "the tail remove must replay over the columnar checkpoint")
    assert(fin.tombstones.map(_._1).toSet === Set(f1, f2))
    assert(fin.dvs.get(f2) === Some("dv/f2.parquet"),
      "the tombstoned file's dv annotation must survive for vacuum protection")
    assert(fin.constraints === Seq("val > 0.0") &&
      fin.schemaCols.nonEmpty && fin.colmap.nonEmpty && fin.tags.nonEmpty &&
      fin.gencolDiv === Some(10L),
      "every meta facet must ride the columnar checkpoint")
    // Distributed live-set resolution: equivalent to the JSON replay, with
    // the collect bounded to the NET live rows. The checkpoint at v10
    // carries f2 as an add row and the tail removes it at v12 — that row
    // must be filtered in the executors (broadcast anti-join), never reach
    // the driver; f3 arrives via the O(tail) overlay, not the collect.
    Seq(10L, 11L, 12L).foreach { v =>
      assert(CommitLog.liveFilesAsOfParquet(spark, root, v) ===
        CommitLog.snapshotAsOf(root, v).live,
        s"distributed live resolution diverged from the JSON replay at v=$v")
    }
    val netCkptLive =
      CommitLog.snapshotAsOf(root, 10L).live.count(_ != f2)
    assert(CommitLog.lastLiveResolveCollected === netCkptLive,
      "the v12 resolve must collect exactly the checkpointed-live-minus-" +
        "tail-removed rows (f2's row filters executor-side; f3 arrives " +
        "via the tail overlay, not the collect)")
    val ckAddRows = spark.read.parquet(
        CommitLog.parquetCheckpointDir(root, 10L))
      .where(org.apache.spark.sql.functions.col("kind") === "add").count()
    assert(ckAddRows > 0 && CommitLog.lastLiveResolveCollected < ckAddRows,
      "the full checkpoint add set reached the driver")
    assert(CommitLog.lastLiveResolvePlan.contains("PushedFilters") &&
      CommitLog.lastLiveResolvePlan.contains("EqualTo(kind,add)"),
      "the kind filter must push into the checkpoint parquet scan")
    assert(CommitLog.lastLiveResolvePlan.contains("LeftAnti"),
      "tail removes must anti-join in the executors, not on the driver")
  }

  test("WAP publish vs a concurrent direct commit: the fast-forward loses the " +
      "version race cleanly and re-publishes at the next version") {
    val main = freshTable() // versions 1..2 exist
    val br = Files.createTempDirectory("graft_wap_race_br").toString
    // Branch from main@2, stage version 3 on the branch.
    CommitLog.cloneTable(main, br)
    val s0 = spark
    import s0.implicits._
    Seq((5L, 50.0), (6L, 60.0)).toDF("key", "val")
      .write.mode("overwrite").parquet(s"$br/g=3")
    CommitLog.commit(br, 3L, "g=3")
    val staged = CommitLog.changesAt(br, 3L)._1
      .map(f => if (f.startsWith("/")) f else s"$br/$f")
    // A concurrent writer lands main@3 FIRST.
    Seq((9L, 90.0)).toDF("key", "val")
      .write.mode("overwrite").parquet(s"$main/g=3")
    CommitLog.commit(main, 3L, "g=3")
    // The publish at the stale version must fail whole — never clobber.
    intercept[IllegalStateException] {
      CommitLog.commitFiles(main, 3L, staged, Nil)
    }
    val after = CommitLog.readAsOf(spark, main, 3L)
      .select("key").as[Long].collect().toSet
    assert(after === Set(1L, 2L, 3L, 4L, 9L),
      "a losing WAP publish mutated the concurrent writer's snapshot")
    // Retry against the new head: the branch files are still audited and
    // still on disk — publish lands at version 4 by reference.
    CommitLog.commitFiles(main, 4L, staged, Nil)
    val head = CommitLog.readAsOf(spark, main, 4L)
      .select("key").as[Long].collect().toSet
    assert(head === Set(1L, 2L, 3L, 4L, 5L, 6L, 9L),
      "the re-published audit branch did not land whole at the next version")
  }

  test("matview refresh replay: re-committing a view version is a conflict " +
      "no-op — the maintained view cannot double-apply a fact commit") {
    val view = Files.createTempDirectory("graft_mvj_replay").toString
    val s0 = spark
    import s0.implicits._
    Seq((1L, 10.0)).toDF("key", "val")
      .write.mode("overwrite").parquet(s"$view/m=a")
    CommitLog.commit(view, 1L, "m=a")
    Seq((2L, 20.0)).toDF("key", "val")
      .write.mode("overwrite").parquet(s"$view/m=b")
    CommitLog.commit(view, 2L, "m=b")
    val adds2 = CommitLog.changesAt(view, 2L)._1
    // A replayed refresh of fact version 2 re-attempts the same commit.
    intercept[IllegalStateException] {
      CommitLog.commitFiles(view, 2L, adds2, Nil)
    }
    // The view is exactly the once-applied state.
    assert(CommitLog.readAsOf(spark, view, Long.MaxValue)
      .select("key").as[Long].collect().sorted.toSeq === Seq(1L, 2L),
      "a replayed refresh double-applied a fact commit")
  }
}
