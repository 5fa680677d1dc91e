package graft.sources

import java.nio.file.{FileAlreadyExistsException, Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transaction-log protocol for the lakehouse maintenance family
  * (`table_merge` / `table_scd2` / `table_compact` / `table_timetravel`) —
  * the Delta/Iceberg commit shape reduced to its essentials:
  *
  *  - `_log/00000001.json`, `00000002.json`, … — one file per committed
  *    version, JSON actions one-per-line (a `commitInfo` header followed by
  *    one `add` per data file the commit published and one `remove` per
  *    file it logically deleted — an overwrite is adds + removes in ONE
  *    atomic commit).
  *  - A snapshot AS OF version v applies adds and removes in version order:
  *    live files are the adds not yet removed; removed files stay on disk
  *    as TOMBSTONES (so older as-of reads still resolve) until VACUUM's
  *    retention expires them. The LOG is authoritative: a data file present
  *    in the directory but absent from the log does not exist (uncommitted
  *    writer debris is invisible — the isolation guarantee directory
  *    listing cannot give), and an as-of-1 reader never opens version 2's
  *    files at any scale.
  *  - Every `_log` publish is ATOMIC and CONFLICT-DETECTING: actions are
  *    written to a hidden temp file and hard-linked to the version name
  *    (`Files.createLink` = atomic create-if-absent on a POSIX fs, the
  *    rename-without-overwrite primitive Delta requires of its LogStore).
  *    A crash mid-write leaves only an ignored temp file, never a torn
  *    version; two writers racing the same version see exactly one winner
  *    and the loser retries at the next version ([[commitRetrying]]).
  *  - Every [[CheckpointInterval]]-th commit also writes
  *    `%08d.checkpoint.json` — the compacted live set + carried tombstones
  *    — so snapshot resolution opens checkpoint + tail instead of every
  *    commit since version 1 (O(interval), not O(commits); the Delta
  *    checkpoint shape). CommitLogSpec pins the open-file count.
  *  - The log is METADATA: a few KB per commit, read on the driver exactly
  *    like Delta's snapshot resolution. The DATA read stays fully
  *    distributed — the resolved file list feeds one parquet scan with
  *    `basePath` so partition columns (`g=…`) still bind.
  */
object CommitLog {

  /** A compacted checkpoint is written at every version divisible by this.
    * Small so the fixture-scale specs exercise it; production tunes it to
    * commit rate (Delta's default is 10 as well). */
  val CheckpointInterval = 10

  private def logDir(root: String): Path = Paths.get(root, "_log")

  private def withList[A](p: Path)(f: Iterator[Path] => A): A = {
    val st = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      f(st.iterator().asScala)
    } finally st.close()
  }

  /** Paths ride inside single-line JSON string literals and (for clones)
    * through a textual rewrite; rather than escape, REJECT the characters
    * that would break either — a quote, a backslash, or a control char in a
    * data-file path is writer error, not data. */
  private def requireSafe(path: String): Unit =
    require(path.forall(c => c >= 0x20 && c != '"' && c != '\\'),
      s"unsafe character in log path (quote/backslash/control): $path")

  /** Version-file names are strictly `%08d.json`; checkpoints are
    * `%08d.checkpoint.json`; anything else in `_log` (temp files of
    * in-flight commits) is ignored by readers. */
  private val CommitName = """(\d{8})\.json""".r
  private val CheckpointName = """(\d{8})\.checkpoint\.json""".r

  private def listLog(root: String): (Seq[(Long, Path)], Seq[(Long, Path)]) =
    if (!Files.isDirectory(logDir(root))) (Nil, Nil)
    else withList(logDir(root)) { it =>
      val (cs, ks) = (Vector.newBuilder[(Long, Path)], Vector.newBuilder[(Long, Path)])
      it.foreach { p =>
        p.getFileName.toString match {
          case CommitName(v)     => cs += (v.toLong -> p)
          case CheckpointName(v) => ks += (v.toLong -> p)
          case _                 => ()
        }
      }
      (cs.result().sortBy(_._1), ks.result().sortBy(_._1))
    }

  /** Highest committed version (0 when the table has no log yet). */
  def latestVersion(root: String): Long =
    listLog(root)._1.lastOption.map(_._1).getOrElse(0L)

  /** Atomic publish of one `_log` entry: write hidden temp, hard-link to
    * the final name (fails atomically if the name exists), drop the temp.
    * Returns false when the version was already taken — the multi-writer
    * conflict signal. A reader can never observe a torn file: the final
    * name appears only after its bytes are fully on disk. */
  private def publishLogFile(root: String, name: String, json: String): Boolean = {
    Files.createDirectories(logDir(root))
    val tmp = Files.createTempFile(logDir(root), ".tmp-", ".json")
    try {
      Files.write(tmp, json.getBytes("UTF-8"))
      try { Files.createLink(logDir(root).resolve(name), tmp); true }
      catch { case _: FileAlreadyExistsException => false }
    } finally Files.deleteIfExists(tmp): Unit
  }

  private def commitJson(version: Long, adds: Seq[String],
      removes: Seq[String], ts: Long, txn: String = "",
      dvs: Map[String, String] = Map.empty,
      stats: Map[String, (Long, Long)] = Map.empty,
      blooms: Map[String, String] = Map.empty): String = {
    (adds ++ removes ++ dvs.values).foreach(requireSafe)
    if (txn.nonEmpty) requireSafe(txn)
    blooms.values.foreach(requireBloomHex)
    val txnField = if (txn.isEmpty) "" else s""","txn":"$txn""""
    def dvField(p: String) =
      dvs.get(p).map(d => s""","dv":"$d"""").getOrElse("")
    def statField(p: String) =
      stats.get(p).map { case (mn, mx) => s""","smin":$mn,"smax":$mx""" }
        .getOrElse("")
    def bloomField(p: String) =
      blooms.get(p).map(b => s""","bloom":"$b"""").getOrElse("")
    (s"""{"commitInfo":{"version":$version,"timestamp":$ts$txnField,"adds":${adds.size},"removes":${removes.size}}}""" +:
      (adds.map(a => s"""{"add":{"path":"$a","addedAt":$version${dvField(a)}${statField(a)}${bloomField(a)}}}""") ++
        removes.map(r => s"""{"remove":{"path":"$r","removedAt":$version}}""")))
      .mkString("", "\n", "\n")
  }

  // ---- FILE-LEVEL BLOOM INDEX (point-lookup skipping) -------------------
  //
  // Min/max stats prune RANGE predicates on clustered layouts; they are
  // blind to an equality probe on a high-NDV UNCLUSTERED key (every file's
  // range spans the domain — the classic needle-in-100-TB lookup). The
  // production answer (Delta's bloom file index) is a per-file bloom
  // filter persisted in the add-action stats and consulted at planning
  // time: k hash bits per key, a probe keeps only the files whose words
  // have ALL the probe's bits set. False positives cost a wasted file
  // scan; false NEGATIVES are impossible by construction (the writer sets
  // every key's bits in its file's words), which is the safety law
  // CommitLogSpec pins. The words ride the log exactly like smin/smax —
  // checkpoint carry included — so pruning works from checkpoint + tail.
  //
  // The k=2 multiplicative family is THE SAME arithmetic join_bloom uses
  // (Joins.scala); writer-side SQL and prober-side Scala are both derived
  // from the constants below so they cannot desynchronize.
  private[graft] val BloomBits = 4096L // 64 words · 64 bits = 1024 hex chars
  private[graft] val BloomWords = (BloomBits / 64L).toInt
  private[graft] val BloomC1 = 2654435761L
  private[graft] val BloomC2a = 40503L
  private[graft] val BloomC2b = 17L
  /** Writer-side hash SQL over a BIGINT column `keyCol` — one expression
    * per hash, each yielding a bit position in [0, BloomBits). */
  private[graft] def bloomHashSql(keyCol: String): Seq[String] = Seq(
    s"pmod($keyCol * ${BloomC1}L, ${BloomBits}L)",
    s"pmod($keyCol * ${BloomC2a}L + ${BloomC2b}L, ${BloomBits}L)")
  /** Prober-side bit positions for `key` — the same arithmetic (Java Long
    * overflow wraps identically in Spark SQL and Scala). */
  private[graft] def bloomBitsOf(key: Long): Seq[Long] = Seq(
    Math.floorMod(key * BloomC1, BloomBits),
    Math.floorMod(key * BloomC2a + BloomC2b, BloomBits))
  /** Serialize per-file words (index → or-ed bits) to the fixed-width hex
    * transport the add action carries. */
  private[graft] def bloomHexOf(words: Map[Int, Long]): String =
    (0 until BloomWords).map(i => f"${words.getOrElse(i, 0L)}%016x").mkString
  private def requireBloomHex(hex: String): Unit =
    require(hex.length == BloomWords * 16 && hex.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"malformed bloom words (need ${BloomWords * 16} lowercase hex chars): " +
        s"${hex.take(32)}…")
  /** Membership probe: may the file behind `hex` contain `key`? */
  private[graft] def bloomMightContain(hex: String, key: Long): Boolean =
    bloomBitsOf(key).forall { bit =>
      val w = java.lang.Long.parseUnsignedLong(
        hex.substring((bit / 64L).toInt * 16, (bit / 64L).toInt * 16 + 16), 16)
      ((w >>> (bit % 64L).toInt) & 1L) == 1L
    }

  /** Stage `genDir`'s parquet files as the add-set of version `version`;
    * `removes` are table-relative (or absolute, for clones) paths this
    * commit logically deletes — an OVERWRITE commits the new files and
    * removes the old in one atomic action list. Returns false on a version
    * conflict (another writer won the name). In production the writer knows
    * its own add-list transactionally; listing the just-written directory
    * here is the local-FS stand-in — a writer that DOES know its manifest
    * (the V2 sink, whose task commit messages carry it) passes `addsKnown`
    * and no listing happens, so a straggler file landing in `genDir`
    * between the writer's validation and this commit can never ride into
    * the published version. */
  /** Every commit carries a MONOTONIC timestamp in its `commitInfo` —
    * the resolution key `TIMESTAMP AS OF` needs. `ts = -1` (the default)
    * stamps with `max(wall clock, previous commit's stamp + 1)`, so the
    * version order and the timestamp order can never disagree even under
    * clock skew (the Delta in-commit-timestamp guarantee); an explicit
    * `ts` must itself be monotonic (deterministic fixtures pass 1000,
    * 2000, … — `require`d to keep as-of-time resolution well-defined). */
  private def stampFor(root: String, ts: Long): Long = {
    val prev = timestampOf(root, latestVersion(root))
    if (ts >= 0L) {
      require(prev < ts, s"non-monotonic explicit commit timestamp $ts " +
        s"(previous commit stamped $prev) under $root")
      ts
    } else math.max(System.currentTimeMillis(), prev + 1L)
  }

  def tryCommit(root: String, version: Long, genDir: String,
      removes: Seq[String] = Nil,
      addsKnown: Option[Seq[String]] = None,
      ts: Long = -1L,
      txn: String = "",
      stats: Map[String, (Long, Long)] = Map.empty): Boolean = {
    requireWritable(root)
    val adds = addsKnown.map(_.sorted).getOrElse(withList(Paths.get(root, genDir)) {
      _.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .toSeq.sorted
        .map(n => s"$genDir/$n")
    })
    val won = publishLogFile(root, f"$version%08d.json",
      commitJson(version, adds, removes, stampFor(root, ts), txn, stats = stats))
    if (won && version % CheckpointInterval == 0) writeCheckpoint(root, version)
    won
  }

  private val TxnField = (""""txn"\s*:\s*"([^"]+)"""").r.unanchored

  /** Writer-transaction marker of `version`'s commit ("" when absent) —
    * the Delta `txn` action reduced to a commitInfo field: a streaming
    * writer stamps `<queryId>/<epochId>` so a REPLAYED epoch after
    * failure recovery can be distinguished from a foreign writer's
    * commit at the same version (no-op vs loud error). */
  def txnOf(root: String, version: Long): String = {
    val p = logDir(root).resolve(f"$version%08d.json")
    if (version <= 0L || !Files.exists(p)) ""
    else new String(Files.readAllBytes(p), "UTF-8")
      .linesIterator.take(1).toSeq.headOption match {
        case Some(TxnField(t)) => t
        case _                 => ""
      }
  }

  /** PROTOCOL VERSION GATING (Delta's protocol action reduced to the
    * reader half): a table may RAISE its minimum reader version when a
    * commit starts using log features an older reader would silently
    * misinterpret (the alternative to refusal is wrong results — a reader
    * that ignores deletion vectors resurrects rows; one that ignores
    * per-file specs prunes wrongly). The declaration is a latest-wins
    * meta facet like constraints/gencol, as-of versioned (a snapshot
    * BEFORE the bump stays readable forever) and checkpoint-carried.
    * Enforcement sits on the DATA READ surface ([[readAsOf]]) — metadata
    * listing stays harmless for tooling. */
  val SupportedReaderVersion = 2L
  def setMinReader(root: String, version: Long, minReader: Long,
      ts: Long = -1L): Unit = {
    requireWritable(root)
    val json =
      (s"""{"commitInfo":{"version":$version,"timestamp":${stampFor(root, ts)},"adds":0,"removes":0}}""" +
        "\n" + s"""{"meta":{"protocol":{"minReader":$minReader}}}""" + "\n")
    if (!publishLogFile(root, f"$version%08d.json", json))
      throw new IllegalStateException(
        s"commit conflict: version $version already exists under $root/_log")
    if (version % CheckpointInterval == 0) writeCheckpoint(root, version)
  }
  private[graft] def requireReadable(snap: Snapshot, root: String): Unit =
    snap.minReader.filter(_ > SupportedReaderVersion).foreach { need =>
      throw new UnsupportedOperationException(
        s"table $root requires reader protocol $need; this engine supports " +
          s"$SupportedReaderVersion — refusing to read rather than risk " +
          "misinterpreting newer log features")
    }

  /** WRITER-HALF PROTOCOL GATING (Delta's `minWriterVersion`): a stale
    * writer committing to a table whose log features it does not
    * understand corrupts the log for everyone — it may drop meta facets
    * its checkpoints don't serialize, violate invariants (constraints,
    * DVs, specs) it cannot see, or compact away files a newer feature
    * still references. Refusal is O(1) metadata; the alternative is log
    * corruption. The floor is a latest-wins meta facet like `minReader`,
    * checkpoint-carried, and enforced on every LOG-PUBLISHING surface and
    * on VACUUM (which deletes data on the strength of its own log
    * interpretation) — but never on reads or metadata listing: a stale
    * engine can still QUERY a writer-gated table, which is the entire
    * point of splitting the two halves. `asWriterVersion` lets a NEWER
    * engine act through this code path (raise the floor for a feature it
    * owns, or restore it on feature rollback); a writer may never declare
    * a floor above its own support. */
  val SupportedWriterVersion = 3L
  def setMinWriter(root: String, version: Long, minWriter: Long,
      ts: Long = -1L,
      asWriterVersion: Long = SupportedWriterVersion): Unit = {
    require(asWriterVersion >= minWriter,
      s"a writer supporting $asWriterVersion cannot declare floor $minWriter " +
        "above its own support")
    requireWritable(root, asWriterVersion)
    val json =
      (s"""{"commitInfo":{"version":$version,"timestamp":${stampFor(root, ts)},"adds":0,"removes":0}}""" +
        "\n" + s"""{"meta":{"protocol":{"minWriter":$minWriter}}}""" + "\n")
    if (!publishLogFile(root, f"$version%08d.json", json))
      throw new IllegalStateException(
        s"commit conflict: version $version already exists under $root/_log")
    if (version % CheckpointInterval == 0) writeCheckpoint(root, version)
  }
  private[graft] def requireWritable(root: String,
      asWriterVersion: Long = SupportedWriterVersion): Unit =
    snapshotAsOf(root, Long.MaxValue).minWriter
      .filter(_ > asWriterVersion).foreach { need =>
        throw new UnsupportedOperationException(
          s"table $root requires writer protocol $need; this writer supports " +
            s"$asWriterVersion — refusing to commit rather than risk " +
            "corrupting a log whose features it does not understand")
      }

  private val AddsCount = (""""adds"\s*:\s*(\d+)""").r.unanchored
  private val RemovesCount = (""""removes"\s*:\s*(\d+)""").r.unanchored

  /** DESCRIBE HISTORY: one row per commit in version order — version,
    * in-commit timestamp, action counts, and the txn marker when one was
    * stamped. O(commits) driver-side metadata reads of the commitInfo head
    * lines only (never the action lists) — exactly Delta's DESCRIBE
    * HISTORY shape, and why the audit surface of a 100 TB table costs KB:
    * every answer is already summarized in the line the writer published. */
  def history(root: String): Seq[(Long, Long, Long, Long, String)] = {
    val (commits, _) = listLog(root)
    commits.map { case (v, p) =>
      val head = new String(Files.readAllBytes(p), "UTF-8")
        .linesIterator.find(_.contains("\"commitInfo\"")).getOrElse("")
      (v,
        head match { case TsField(t) => t.toLong; case _ => -1L },
        head match { case AddsCount(a) => a.toLong; case _ => 0L },
        head match { case RemovesCount(r) => r.toLong; case _ => 0L },
        head match { case TxnField(t) => t; case _ => "" })
    }
  }

  /** Single-writer commit: version conflicts are protocol violations. */
  def commit(root: String, version: Long, genDir: String,
      removes: Seq[String] = Nil, ts: Long = -1L): Unit =
    if (!tryCommit(root, version, genDir, removes, ts = ts))
      throw new IllegalStateException(
        s"commit conflict: version $version already exists under $root/_log")

  /** Commit an EXPLICIT manifest — the production shape (a writer knows
    * its add-list transactionally; no directory listing) and the one
    * metadata-only operations need: RESTORE re-adds an old snapshot's
    * files and removes the current ones without touching a byte of data. */
  def commitFiles(root: String, version: Long, adds: Seq[String],
      removes: Seq[String], ts: Long = -1L,
      dvs: Map[String, String] = Map.empty,
      stats: Map[String, (Long, Long)] = Map.empty,
      blooms: Map[String, String] = Map.empty): Unit = {
    requireWritable(root)
    val won = publishLogFile(root, f"$version%08d.json",
      commitJson(version, adds, removes, stampFor(root, ts), dvs = dvs,
        stats = stats, blooms = blooms))
    if (!won)
      throw new IllegalStateException(
        s"commit conflict: version $version already exists under $root/_log")
    if (version % CheckpointInterval == 0) writeCheckpoint(root, version)
  }

  private val TsField = (""""timestamp"\s*:\s*(\d+)""").r.unanchored

  /** Commit timestamp of `version` (millis; -1 when the version does not
    * exist or predates timestamped commits). O(1): reads one log file. */
  def timestampOf(root: String, version: Long): Long = {
    val p = logDir(root).resolve(f"$version%08d.json")
    if (version <= 0L || !Files.exists(p)) -1L
    else new String(Files.readAllBytes(p), "UTF-8")
      .linesIterator.take(1).toSeq.headOption match {
        case Some(TsField(t)) => t.toLong
        case _                => -1L
      }
  }

  /** `TIMESTAMP AS OF` resolution: the LATEST version whose commit
    * timestamp is <= `ts` — the form users actually type; a time after
    * the last commit clamps to the latest snapshot (Delta's read
    * semantics). Errors when `ts` predates the first commit: there is no
    * snapshot to serve. O(commits) driver-side metadata — the same walk
    * snapshot resolution already does; a production deployment binary-
    * searches the commit range. */
  def versionAsOfTimestamp(root: String, ts: Long): Long = {
    val versions = listLog(root)._1.map(_._1)
    val hit = versions.foldLeft(-1L) { (best, v) =>
      val t = timestampOf(root, v)
      if (t >= 0L && t <= ts) v else best
    }
    require(hit > 0L,
      s"timestamp $ts predates the first commit under $root — no snapshot to serve")
    hit
  }

  /** The file-level CHANGE FEED of `version`: (added files, removed files)
    * vs the previous snapshot — resolved purely from the log, the
    * CDC-from-snapshots read (Delta's change-data-feed without per-row
    * tracking: a rewritten file surfaces as delete-of-old + insert-of-new,
    * which is exactly what a downstream incremental consumer replays).
    * O(log tail) metadata; the row reads the caller makes from these file
    * lists touch only the CHANGED files, never the table. */
  def changesAt(root: String, version: Long): (Seq[String], Seq[String]) = {
    val prev = filesAsOf(root, version - 1L).toSet
    val cur = filesAsOf(root, version).toSet
    ((cur -- prev).toSeq.sorted, (prev -- cur).toSeq.sorted)
  }

  /** Multi-writer commit: race for latest+1, on loss re-read and retry at
    * the next version — optimistic concurrency, the Delta arbitration loop.
    * Returns the version actually won. `removes` is re-resolved per attempt
    * via `removesAsOf` so a loser's removal set reflects the winner's
    * commit (replace-style writers pass `v => filesAsOf(root, v - 1)`). */
  def commitRetrying(root: String, genDir: String,
      removesAsOf: Long => Seq[String] = _ => Nil,
      maxAttempts: Int = 64,
      addsKnown: Option[Seq[String]] = None): Long = {
    var v = latestVersion(root) + 1L
    var attempts = 0
    while (attempts < maxAttempts) {
      if (tryCommit(root, v, genDir, removesAsOf(v), addsKnown)) return v
      attempts += 1
      v = math.max(v + 1L, latestVersion(root) + 1L)
    }
    throw new IllegalStateException(
      s"commit on $root lost $maxAttempts straight races — giving up")
  }

  /** Idempotence guard for replayed writers (a restarted streaming query
    * re-delivers its last micro-batch; batchId-keyed versions make the
    * re-commit a no-op — the exactly-once recipe foreachBatch documents). */
  def commitVersionExists(root: String, version: Long): Boolean =
    Files.exists(logDir(root).resolve(f"$version%08d.json"))

  /** Files REMOVED by commits in `(since, until]` — the winning writers'
    * remove actions a losing optimistic transaction must re-validate its
    * read set against. O(tail) metadata: reads only the commit files of
    * the raced window, never a checkpoint or the data. */
  private[graft] def removedBetween(root: String, since: Long,
      until: Long): Set[String] = {
    val (commits, _) = listLog(root)
    val out = Set.newBuilder[String]
    commits.foreach { case (v, p) =>
      if (v > since && v <= until)
        new String(Files.readAllBytes(p), "UTF-8").linesIterator.foreach {
          case l @ RemoveLine() =>
            val PathField(path) = l: @unchecked
            out += path
          case _ => ()
        }
    }
    out.result()
  }

  /** Snapshot-isolation commit with LOGICAL CONFLICT CHECKING — the Delta/
    * Iceberg conflict-checker step [[commitRetrying]] deliberately lacks
    * (that loop re-resolves removes per attempt, which is CORRECT for
    * complete-mode replace writers whose every batch is a full
    * recomputation — last-writer-wins IS the semantics — but would let two
    * concurrent compactions both land, the second resurrecting files the
    * first removed).
    *
    * The transaction declares the snapshot version it READ (`readVersion`)
    * and the files it read and intends to logically delete (`reads` — for
    * a compaction/rewrite this is exactly its remove-set). On losing the
    * version race it does NOT blindly retry: it first re-reads the winning
    * commit(s) in `(readVersion, lost..]` and ABORTS with
    * [[java.util.ConcurrentModificationException]] if any winner removed a
    * file in the transaction's read/remove set — the winner invalidated
    * this transaction's input, and re-committing would publish a rewrite
    * of files that no longer exist (double-compaction resurrection).
    * Winners whose actions are DISJOINT (a concurrent append, a rewrite of
    * other files) commute, and the retry lands at the next version with
    * the SAME action list. Returns the version won. */
  def commitChecked(root: String, genDir: String, readVersion: Long,
      reads: Seq[String], maxAttempts: Int = 64,
      addsKnown: Option[Seq[String]] = None): Long = {
    val readSet = reads.toSet
    var v = readVersion + 1L
    var attempts = 0
    while (attempts < maxAttempts) {
      if (tryCommit(root, v, genDir, removes = reads, addsKnown = addsKnown))
        return v
      // Lost the race for `v`: someone committed it (and possibly more).
      // Re-validate before retrying above them.
      val latest = latestVersion(root)
      val conflicting = removedBetween(root, readVersion, latest)
        .intersect(readSet)
      if (conflicting.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"commit on $root read snapshot $readVersion but concurrent " +
            s"commits (through $latest) removed ${conflicting.size} file(s) " +
            s"of its read set (e.g. ${conflicting.toSeq.sorted.head}) — " +
            "aborting instead of resurrecting rewritten files")
      attempts += 1
      v = math.max(v + 1L, latest + 1L)
    }
    throw new IllegalStateException(
      s"commit on $root lost $maxAttempts straight races — giving up")
  }

  /** [[commitChecked]] with a NON-CONSUMING read set — the optimistic-
    * transaction shape for a commit whose adds are only VALID while the
    * files it read stay live, without removing them: an ANN delta assigned
    * against the standing index's frozen geometry appends alongside the
    * base code files it read, but must ABORT if a concurrent refit
    * replaced them (its cell assignments would land in incompatible
    * geometry — silent wrong neighbors, not a crash). Same arbitration as
    * [[commitChecked]]: lose the version race, re-validate that nothing
    * in the read set was removed between the read snapshot and the
    * current tip, retry above; the refit side needs no special handling —
    * a replace commit whose removes resolve AT LANDING TIME
    * ([[commitRetrying]] with `removesAsOf`) atomically retires any
    * interleaved append along with the base (CommitLogSpec pins both
    * orders). */
  def commitCheckedNonConsuming(root: String, genDir: String,
      readVersion: Long, reads: Seq[String],
      addsKnown: Option[Seq[String]] = None, maxAttempts: Int = 64,
      stats: Map[String, (Long, Long)] = Map.empty): Long = {
    val readSet = reads.toSet
    var v = readVersion + 1L
    var attempts = 0
    while (attempts < maxAttempts) {
      // Validate BEFORE the attempt too: winning the next version number
      // must not publish a delta whose geometry a landed refit already
      // retired.
      val latest = latestVersion(root)
      val conflicting = removedBetween(root, readVersion, latest)
        .intersect(readSet)
      if (conflicting.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"non-consuming commit on $root read snapshot $readVersion but " +
            s"concurrent commits (through $latest) removed " +
            s"${conflicting.size} file(s) of its read set (e.g. " +
            s"${conflicting.toSeq.sorted.head}) — the adds were derived " +
            "from retired state, aborting")
      if (tryCommit(root, v, genDir, removes = Nil, addsKnown = addsKnown,
          stats = stats))
        return v
      attempts += 1
      v = math.max(v + 1L, latestVersion(root) + 1L)
    }
    throw new IllegalStateException(
      s"commit on $root lost $maxAttempts straight races — giving up")
  }

  /** CHECK-constraint metadata (Delta's table constraints reduced to the
    * log essentials): a commit may carry ONE `meta` line declaring the
    * table's FULL active constraint set (SQL boolean expressions over the
    * row schema; the LATEST meta line wins, so dropping a constraint is
    * republishing the set without it). Writers are expected to validate
    * their adds against the active set BEFORE publishing ([[validateAdds]])
    * — the log records the contract, the writer enforces it at write time,
    * exactly Delta's split. Expressions are transported inside the
    * single-line JSON without escaping, so the same requireSafe character
    * discipline applies as for paths — EXTENDED here to the array-syntax
    * characters: the replay parser splits the constraints array on ','
    * and closes it at the first ']', so an expression like `key IN (1,2)`
    * or `arr[1] > 0` would round-trip silently corrupted. Reject-at-write
    * (the requireSafe philosophy: a clear error at the writer, never a
    * silent wrong replay) — spell such predicates without the characters
    * (`key = 1 OR key = 2`, `element_at(arr, 1) > 0`). */
  def setConstraints(root: String, version: Long, exprs: Seq[String],
      ts: Long = -1L): Unit = {
    requireWritable(root)
    exprs.foreach(requireSafe)
    exprs.foreach(e => require(!e.exists(c => c == ',' || c == '[' || c == ']'),
      s"unsafe character in constraint expression (',' '[' ']' break the " +
        s"log's array transport — rewrite without them): $e"))
    val arr = exprs.map(e => s""""$e"""").mkString("[", ",", "]")
    val json =
      (s"""{"commitInfo":{"version":$version,"timestamp":${stampFor(root, ts)},"adds":0,"removes":0}}""" +
        "\n" + s"""{"meta":{"constraints":$arr}}""" + "\n")
    if (!publishLogFile(root, f"$version%08d.json", json))
      throw new IllegalStateException(
        s"commit conflict: version $version already exists under $root/_log")
    if (version % CheckpointInterval == 0) writeCheckpoint(root, version)
  }

  /** Active constraint set AS OF `v` (empty when none declared). */
  def constraintsAsOf(root: String, v: Long): Seq[String] =
    snapshotAsOf(root, v).constraints

  /** SCHEMA declaration (Delta's schema-enforcement metadata reduced to
    * the demo essentials): a metadata-only commit declares the table's
    * column list as ordered `"name type"` entries. Writers validate their
    * staged files against the ACTIVE declaration before publishing
    * ([[validateSchemaGen]]) — schema-on-WRITE, the lakehouse guarantee
    * that distinguishes a table from a directory of parquet files (a
    * drifted producer is refused at commit time, never discovered by a
    * reader's cast error three jobs downstream). Latest declaration wins
    * per facet and is checkpoint-carried, so legal EVOLUTION is one more
    * metadata commit — after which previously-refused wider files can
    * land, while the drifted ones stay refused. */
  def setSchema(root: String, version: Long, cols: Seq[(String, String)],
      ts: Long = -1L): Unit = {
    requireWritable(root)
    require(cols.nonEmpty, "a schema declaration needs at least one column")
    cols.foreach { case (n, t) =>
      require((n + t).forall(c => c != ',' && c != '[' && c != ']' &&
          c != '"' && !c.isWhitespace),
        s"unsafe character in schema entry ($n, $t) — ',' '[' ']' '\"' and " +
          "whitespace break the log's array transport")
    }
    val arr = cols.map { case (n, t) => s""""$n $t"""" }.mkString("[", ",", "]")
    val json =
      (s"""{"commitInfo":{"version":$version,"timestamp":${stampFor(root, ts)},"adds":0,"removes":0}}""" +
        "\n" + s"""{"meta":{"schema":$arr}}""" + "\n")
    if (!publishLogFile(root, f"$version%08d.json", json))
      throw new IllegalStateException(
        s"commit conflict: version $version already exists under $root/_log")
    if (version % CheckpointInterval == 0) writeCheckpoint(root, version)
  }

  /** Active schema declaration AS OF `v` as `"name type"` entries (empty
    * when never declared — an undeclared table accepts any layout, the
    * pre-enforcement behavior every other op relies on). */
  def schemaAsOf(root: String, v: Long): Seq[String] =
    snapshotAsOf(root, v).schemaCols

  /** COLUMN MAPPING (Delta's column-mapping rename reduced to the demo
    * essentials): a metadata-only commit declares `logical physical` name
    * pairs; physical parquet schemas NEVER change (writers keep staging
    * under the stable physical names), and mapped reads project logical
    * names over every file — old and new alike — so a RENAME is O(1) log
    * metadata instead of a table rewrite. Latest declaration wins,
    * checkpoint-carried; entries use the same transport-safe discipline
    * as [[setSchema]]. */
  def setColMap(root: String, version: Long,
      pairs: Seq[(String, String)], ts: Long = -1L): Unit = {
    requireWritable(root)
    require(pairs.nonEmpty, "a column mapping needs at least one pair")
    pairs.foreach { case (l, ph) =>
      require((l + ph).forall(c => c != ',' && c != '[' && c != ']' &&
          c != '"' && !c.isWhitespace),
        s"unsafe character in column-mapping entry ($l, $ph)")
    }
    val arr = pairs.map { case (l, ph) => s""""$l $ph"""" }
      .mkString("[", ",", "]")
    val json =
      (s"""{"commitInfo":{"version":$version,"timestamp":${stampFor(root, ts)},"adds":0,"removes":0}}""" +
        "\n" + s"""{"meta":{"colmap":$arr}}""" + "\n")
    if (!publishLogFile(root, f"$version%08d.json", json))
      throw new IllegalStateException(
        s"commit conflict: version $version already exists under $root/_log")
    if (version % CheckpointInterval == 0) writeCheckpoint(root, version)
  }

  /** Active column mapping AS OF `v` as (logical, physical) pairs. */
  def colMapAsOf(root: String, v: Long): Seq[(String, String)] =
    snapshotAsOf(root, v).colmap.map { e =>
      val Array(l, ph) = e.split(" ", 2); (l, ph)
    }

  /** MAPPED READ: [[readAsOf]] with the column mapping active AT `v`
    * projected on top — physical columns surface under their logical
    * names. Reads pinned to a pre-rename version keep serving the old
    * names: the mapping is as-of versioned state like everything else. */
  def readAsOfMapped(s: SparkSession, root: String, v: Long): DataFrame =
    colMapAsOf(root, v).foldLeft(readAsOf(s, root, v)) {
      case (df, (l, ph)) => df.withColumnRenamed(ph, l)
    }

  /** NAMED REFS (Iceberg tags): a metadata-only commit declares
    * `name version` pairs — human-readable, immutable-by-convention
    * pointers into the version history ("release-2026q3" → v17). Latest
    * declaration wins (re-tagging = republishing the full set),
    * checkpoint-carried. Resolution is O(snapshot metadata). */
  /** CATALOG-LEVEL version pins: the tags facet of `catalogRoot`'s latest
    * snapshot parsed as (table-name → pinned version). The multi-table
    * transaction shape (Iceberg REST-catalog style): participant tables
    * PREPARE by committing to their own logs (invisible to catalog
    * readers), then one [[setTags]] commit on the catalog publishes the
    * whole pin-set atomically — a reader that resolves versions through
    * here can never observe the pair torn, because the pair changes in
    * exactly one file-create. */
  def pinnedVersions(catalogRoot: String): Map[String, Long] =
    snapshotAsOf(catalogRoot, Long.MaxValue).tags.flatMap { t =>
      t.split(' ') match {
        case Array(n, v) => v.toLongOption.map(n -> _)
        case _           => None
      }
    }.toMap

  def setTags(root: String, version: Long,
      pairs: Seq[(String, Long)], ts: Long = -1L): Unit = {
    requireWritable(root)
    require(pairs.nonEmpty, "a tag declaration needs at least one entry")
    pairs.foreach { case (n, _) =>
      require(n.nonEmpty && n.forall(c => c != ',' && c != '[' && c != ']' &&
          c != '"' && !c.isWhitespace),
        s"unsafe character in tag name $n")
    }
    val arr = pairs.map { case (n, tv) => s""""$n $tv"""" }
      .mkString("[", ",", "]")
    val json =
      (s"""{"commitInfo":{"version":$version,"timestamp":${stampFor(root, ts)},"adds":0,"removes":0}}""" +
        "\n" + s"""{"meta":{"tags":$arr}}""" + "\n")
    if (!publishLogFile(root, f"$version%08d.json", json))
      throw new IllegalStateException(
        s"commit conflict: version $version already exists under $root/_log")
    if (version % CheckpointInterval == 0) writeCheckpoint(root, version)
  }

  /** Resolve a tag to its target version (as of the latest snapshot). */
  def versionOfTag(root: String, name: String): Long = {
    val hit = snapshotAsOf(root, Long.MaxValue).tags.collectFirst {
      case e if e.startsWith(name + " ") => e.stripPrefix(name + " ").toLong
    }
    require(hit.isDefined, s"unknown tag '$name' under $root")
    hit.get
  }

  /** Writer-side SCHEMA enforcement: compare a staged generation's
    * parquet schema against the declaration active at the current
    * snapshot. Returns None on conformance, Some(reason) on refusal — the
    * writer publishes only on None, leaving refused staging as
    * vacuum-reclaimable debris exactly like a failed CHECK. The
    * comparison is ORDERED and exact on (name, type): a missing column,
    * an extra column, a reordering, or a type drift all refuse — schema
    * EVOLUTION is a deliberate [[setSchema]] commit, never an accidental
    * side effect of whatever a producer happened to write. Cost: ONE
    * footer read of the staged files (schema only, zero data rows) —
    * O(staged), never O(table). */
  def validateSchemaGen(s: SparkSession, root: String,
      genDir: String): Option[String] = {
    val declared = schemaAsOf(root, Long.MaxValue)
    if (declared.isEmpty) return None
    val staged = s.read.parquet(s"$root/$genDir").schema.fields
      .map(f => s"${f.name} ${f.dataType.simpleString}").toSeq
    if (staged == declared) None
    else Some(s"schema mismatch: staged [${staged.mkString(", ")}] vs " +
      s"declared [${declared.mkString(", ")}]")
  }

  /** GENERATED-COLUMN declaration (Delta's generated partition columns
    * reduced to the demo essentials): a metadata-only commit declares that
    * the table's `g=` partition values are `key div width` — a MONOTONE
    * transform of the key — so a key-range predicate prunes partitions BY
    * CONSTRUCTION, with no per-file stats required. The complement to
    * per-file min/max skipping: stats must be measured per file (a fresh
    * append is un-skippable until stats'd), the declared transform prunes
    * every file the moment it lands in its partition. */
  def setGencolDiv(root: String, version: Long, width: Long,
      ts: Long = -1L): Unit = {
    requireWritable(root)
    require(width > 0L, s"gencol width must be positive, got $width")
    val json =
      (s"""{"commitInfo":{"version":$version,"timestamp":${stampFor(root, ts)},"adds":0,"removes":0}}""" +
        "\n" + s"""{"meta":{"gencolDiv":$width}}""" + "\n")
    if (!publishLogFile(root, f"$version%08d.json", json))
      throw new IllegalStateException(
        s"commit conflict: version $version already exists under $root/_log")
    if (version % CheckpointInterval == 0) writeCheckpoint(root, version)
  }

  /** Declared gencol width AS OF `v` (None when never declared). */
  def gencolDivAsOf(root: String, v: Long): Option[Long] =
    snapshotAsOf(root, v).gencolDiv

  private val GenPart = ("""g=(\d+)/""").r.unanchored

  /** PARTITION PRUNING by the declared transform — PER-FILE SPEC (Iceberg
    * partition-spec evolution): each live file prunes under the width
    * that was ACTIVE WHEN IT WAS ADDED, never the latest one. A table can
    * re-partition (coarse → fine) without rewriting a byte: old files
    * keep answering under their own spec, new files under the new one,
    * and a probe applies the right arithmetic to each. A file kept: its
    * `g=` value lies in [lo div w_f, hi div w_f] for ITS width w_f; files
    * added before any declaration, or outside a `g=` directory, are kept
    * conservatively. O(live files) path arithmetic, zero stats, zero data
    * reads — and unlike stats skipping it applies to a file the commit it
    * lands, which is what makes it the fresh-append answer. */
  def filesAsOfGencolPruned(root: String, v: Long, lo: Long, hi: Long): Seq[String] = {
    val snap = snapshotAsOf(root, v)
    snap.live.filter { p =>
      (snap.gencolAtAdd.get(p), p) match {
        case (Some(w), GenPart(g)) =>
          g.toLong >= math.floorDiv(lo, w) && g.toLong <= math.floorDiv(hi, w)
        case _ => true
      }
    }
  }

  /** Writer-side CHECK enforcement: evaluate the constraint set active at
    * the CURRENT snapshot against the staged files and return the number
    * of violating rows — a writer publishes only on 0 (the abort branch
    * leaves the staging as vacuum-reclaimable debris, invisible to every
    * reader; the same isolation any crashed writer gets). The validation
    * is ONE distributed scan of the STAGED files only — cost O(staged
    * data), never O(table), which is why constraint checks stay cheap on
    * a 100 TB table taking MB-sized appends. */
  def validateAdds(s: SparkSession, root: String, staged: Seq[String]): Long = {
    val exprs = constraintsAsOf(root, Long.MaxValue)
    if (exprs.isEmpty || staged.isEmpty) return 0L
    val df = s.read.option("basePath", root)
      .parquet(staged.map(f => s"$root/$f"): _*)
    // SQL-standard CHECK semantics: a row violates when the expression is
    // FALSE; UNKNOWN (null) passes — same as ANSI and Delta.
    val violating = exprs
      .map(e => org.apache.spark.sql.functions.expr(e))
      .map(c => !org.apache.spark.sql.functions.coalesce(c,
        org.apache.spark.sql.functions.lit(true)))
      .reduce(_ || _)
    df.where(violating).count()
  }

  private val PathField = (""""path"\s*:\s*"([^"]+)"""").r.unanchored

  /** Table-relative key of a scan-emitted `_metadata.file_path`. The
    * metadata column is the file's PERCENT-ENCODED `file:` URI (space →
    * %20, '%' → %25, '#' → %23 …), so raw substring arithmetic on it
    * throws or silently mis-keys whenever the table root contains such a
    * character. Parse the URI — `getPath` percent-DECODES — and strip the
    * root's decoded absolute path: the exact inverse of the
    * `java.io.File.toURI` construction the MoR read path uses. */
  def relToRoot(root: String, fileUri: String): String = {
    val p = new java.net.URI(fileUri).getPath
    val prefix = new java.io.File(root).getAbsolutePath.stripSuffix("/") + "/"
    require(p.startsWith(prefix), s"scan file outside table root $root: $fileUri")
    p.substring(prefix.length)
  }
  private val AddLine = (""""add"\s*:""").r.unanchored
  private val RemoveLine = (""""remove"\s*:""").r.unanchored
  private val RemovedAt = (""""removedAt"\s*:\s*(\d+)""").r.unanchored
  private val AddedAt = (""""addedAt"\s*:\s*(\d+)""").r.unanchored
  private val DvRef = (""""dv"\s*:\s*"([^"]+)"""").r.unanchored
  // Sidecar key spelling: the path string under which the deletion-vector
  // sidecar's `f` column spells this file. Defaults to the add's own
  // `path`; diverges ONLY when a clone absolutizes a borrowed add whose
  // inherited (zero-copy) sidecar still spells the source-relative path.
  private val DvfField = (""""dvf"\s*:\s*"([^"]+)"""").r.unanchored
  private val MetaLine = (""""meta"\s*:""").r.unanchored
  private val ConstraintsField = (""""constraints"\s*:\s*\[([^\]]*)\]""").r.unanchored
  private val SchemaField = (""""schema"\s*:\s*\[([^\]]*)\]""").r.unanchored
  private val ColmapField = (""""colmap"\s*:\s*\[([^\]]*)\]""").r.unanchored
  private val TagsField = (""""tags"\s*:\s*\[([^\]]*)\]""").r.unanchored
  private val BloomField = (""""bloom"\s*:\s*"([0-9a-f]+)"""").r.unanchored
  private val SMinField = (""""smin"\s*:\s*(-?\d+)""").r.unanchored
  private val SMaxField = (""""smax"\s*:\s*(-?\d+)""").r.unanchored
  private val GencolField = (""""gencolDiv"\s*:\s*(\d+)""").r.unanchored
  private val MinReaderField = (""""minReader"\s*:\s*(\d+)""").r.unanchored
  private val MinWriterField = (""""minWriter"\s*:\s*(\d+)""").r.unanchored
  private val GwField = (""""gw"\s*:\s*(\d+)""").r.unanchored

  /** Resolved snapshot: live data files in (addedAt, path) order, plus the
    * tombstones — files removed at some version ≤ the as-of version, still
    * on disk for older readers until retention expires them — plus the
    * DELETION-VECTOR annotations (`dvs`: data-file path → sidecar path,
    * covering live files AND tombstoned ones whose annotation the log
    * still carries; readers apply only the live subset, vacuum's retention
    * protection needs the tombstoned ones too) — plus the ACTIVE
    * CHECK-constraint set (latest `meta` line wins). */
  final case class Snapshot(live: Seq[String], tombstones: Seq[(String, Long)],
      dvs: Map[String, String] = Map.empty,
      constraints: Seq[String] = Nil,
      stats: Map[String, (Long, Long)] = Map.empty,
      gencolDiv: Option[Long] = None,
      gencolAtAdd: Map[String, Long] = Map.empty,
      blooms: Map[String, String] = Map.empty,
      minReader: Option[Long] = None,
      dvKeys: Map[String, String] = Map.empty,
      minWriter: Option[Long] = None,
      schemaCols: Seq[String] = Nil,
      colmap: Seq[String] = Nil,
      tags: Seq[String] = Nil)

  /** The log files a snapshot AS OF `v` resolves from: the newest
    * checkpoint at or below `v` (if any) plus the commit tail after it —
    * NOT every commit since version 1. Exposed so CommitLogSpec can pin the
    * O(tail) bound. */
  private[graft] def logFilesForSnapshot(root: String, v: Long): Seq[Path] = {
    val (commits, checkpoints) = listLog(root)
    val cp = checkpoints.filter(_._1 <= v).lastOption
    val floor = cp.map(_._1).getOrElse(0L)
    cp.map(_._2).toSeq ++
      commits.collect { case (cv, p) if cv > floor && cv <= v => p }
  }

  private def applyLog(files: Seq[Path]): Snapshot =
    applyLogUnits(files.map { p =>
      (new String(Files.readAllBytes(p), "UTF-8").linesIterator.toVector,
        p.getFileName.toString.endsWith(".checkpoint.json"))
    })

  /** One replay unit = one log file's lines + whether it is a checkpoint
    * (exact snapshot serialization). Factored from [[applyLog]] so the
    * COLUMNAR checkpoint path ([[snapshotAsOfParquet]]) can feed its
    * reconstructed action lines through the same parser instead of
    * duplicating the replay semantics. */
  private def applyLogUnits(units: Seq[(Vector[String], Boolean)]): Snapshot = {
    // (path -> addedAt) in insertion order; a re-add after a remove
    // resurrects the file (drops its tombstone), as in Delta. Within ONE
    // log file removes apply BEFORE adds: the only same-path overlap the
    // protocol produces is a deletion-vector attach (remove + re-add with
    // "dv" in one atomic commit — the Delta DV-update action shape), and
    // there the add must win with the file staying live. Across files the
    // version order governs as before.
    val live = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val tombs = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    val dvs = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val dvKeys = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val stats = scala.collection.mutable.LinkedHashMap.empty[String, (Long, Long)]
    val blooms = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val gencolAt = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    var constraints: Seq[String] = Nil
    var schemaCols: Seq[String] = Nil
    var colmap: Seq[String] = Nil
    var tags: Seq[String] = Nil
    var gencolDiv: Option[Long] = None
    var minReader: Option[Long] = None
    var minWriter: Option[Long] = None
    units.foreach { case (lines, isCheckpoint) =>
      // A checkpoint is an EXACT snapshot serialization: its adds carry
      // their own per-file spec ("gw") when one was bound, so an absent
      // gw there means "no spec at add" — never "bind the latest meta".
      lines.foreach {
        case l @ MetaLine() =>
          // Latest meta line wins: the commit declares the FULL active set.
          l match {
            case ConstraintsField(body) =>
              constraints =
                if (body.trim.isEmpty) Nil
                else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
            case _ => ()
          }
          l match {
            case SchemaField(body) =>
              schemaCols =
                if (body.trim.isEmpty) Nil
                else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
            case _ => ()
          }
          l match {
            case ColmapField(body) =>
              colmap =
                if (body.trim.isEmpty) Nil
                else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
            case _ => ()
          }
          l match {
            case TagsField(body) =>
              tags =
                if (body.trim.isEmpty) Nil
                else body.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))
            case _ => ()
          }
          // Orthogonal meta facets: a gencol declaration neither clears
          // nor is cleared by a constraint set (each "latest wins" rule
          // applies per facet).
          l match {
            case GencolField(w) => gencolDiv = Some(w.toLong)
            case _              => ()
          }
          l match {
            case MinReaderField(v) => minReader = Some(v.toLong)
            case _                 => ()
          }
          l match {
            case MinWriterField(v) => minWriter = Some(v.toLong)
            case _                 => ()
          }
        case _ => ()
      }
      lines.foreach {
        case l @ RemoveLine() =>
          val PathField(path) = l: @unchecked
          val at = l match { case RemovedAt(v) => v.toLong; case _ => 0L }
          live.remove(path): Unit
          tombs.put(path, at): Unit
          // A checkpointed tombstone carries its dv annotation forward so
          // retention protection still sees it; a remove never CLEARS one.
          l match { case DvRef(d) => dvs.put(path, d): Unit; case _ => () }
        case _ => ()
      }
      lines.foreach {
        case l @ AddLine() =>
          val PathField(path) = l: @unchecked
          val at = l match { case AddedAt(v) => v.toLong; case _ => 0L }
          live.put(path, at): Unit
          tombs.remove(path): Unit
          // The add action is AUTHORITATIVE about its file's DV state:
          // annotation present = those positions are deleted, absent =
          // the whole file is live (so a plain re-add — restore, compact
          // output — starts clean rather than inheriting a stale vector).
          l match {
            case DvRef(d) => dvs.put(path, d): Unit
            case _        => dvs.remove(path): Unit
          }
          // The sidecar key spelling follows the same add-authority rule.
          l match {
            case DvfField(k) => dvKeys.put(path, k): Unit
            case _           => dvKeys.remove(path): Unit
          }
          // Same authority rule for the skipping stats: an add carrying
          // (smin, smax) declares its file's key range; an add without
          // them leaves the file UN-skippable (read conservatively) —
          // stats never survive a stat-less re-add of the same path.
          (l, l) match {
            case (SMinField(mn), SMaxField(mx)) =>
              stats.put(path, (mn.toLong, mx.toLong)): Unit
            case _ => stats.remove(path): Unit
          }
          // Bloom words follow the stats authority rule exactly: an add
          // carrying them declares its file's key membership; a bloom-less
          // re-add leaves the file un-probeable (kept conservatively).
          l match {
            case BloomField(hex) => blooms.put(path, hex): Unit
            case _               => blooms.remove(path): Unit
          }
          // PARTITION-SPEC EVOLUTION: a file binds the gencol width active
          // WHEN IT IS ADDED (its commit's meta lines were applied above,
          // so a commit declaring-and-adding binds its own spec). A
          // checkpointed add carries its width explicitly ("gw"), because
          // checkpoint replay sees only the LATEST declaration.
          l match {
            case GwField(w)           => gencolAt.put(path, w.toLong): Unit
            case _ if isCheckpoint    => gencolAt.remove(path): Unit
            case _ => gencolDiv match {
              case Some(w) => gencolAt.put(path, w): Unit
              case None    => gencolAt.remove(path): Unit
            }
          }
        case _ => ()
      }
    }
    val liveSeq = live.toSeq.sortBy { case (p, at) => (at, p) }.map(_._1)
    Snapshot(liveSeq, tombs.toSeq, dvs.toMap, constraints, stats.toMap,
      gencolDiv, gencolAt.toMap.view.filterKeys(live.contains).toMap,
      blooms.toMap, minReader, dvKeys.toMap, minWriter, schemaCols,
      colmap, tags)
  }

  def snapshotAsOf(root: String, v: Long): Snapshot =
    applyLog(logFilesForSnapshot(root, v))

  /** Table-relative data files live in the snapshot AS OF `v`. */
  def filesAsOf(root: String, v: Long): Seq[String] = snapshotAsOf(root, v).live

  /** DATA SKIPPING: the live files AS OF `v` whose declared key range
    * intersects [lo, hi] — the Delta/Iceberg file-level min/max pruning,
    * resolved ENTIRELY from log metadata before any data file opens. A
    * file whose add carried no stats is always kept (conservative: absent
    * stats mean "range unknown", never "no rows match"), so skipping can
    * only subtract files it can PROVE disjoint. O(live files) metadata
    * arithmetic; the payoff at 100 TB is the scan that follows touching
    * only the intersecting files. */
  def filesAsOfPruned(root: String, v: Long, lo: Long, hi: Long): Seq[String] = {
    val snap = snapshotAsOf(root, v)
    snap.live.filter { p =>
      snap.stats.get(p) match {
        case Some((mn, mx)) => mx >= lo && mn <= hi
        case None           => true
      }
    }
  }

  /** POINT-LOOKUP SKIPPING: the live files AS OF `v` that may contain
    * `key`, consulting BOTH stat facets the add actions carry — the
    * min/max range (cheap, but blind to an equality probe on an
    * UNCLUSTERED high-NDV key where every file's range spans the domain)
    * and the per-file bloom words (which prune exactly that case). A file
    * missing a facet is kept by that facet (conservative — absent
    * metadata never claims "no rows match"), so the composite can only
    * subtract files it can PROVE disjoint: no false negatives, the law
    * CommitLogSpec pins. O(live files · k) driver-side bit arithmetic;
    * the payoff at 100 TB is a needle lookup that opens a handful of
    * files instead of the table. */
  def filesAsOfPrunedPoint(root: String, v: Long, key: Long): Seq[String] = {
    val snap = snapshotAsOf(root, v)
    snap.live.filter { p =>
      val rangeMay = snap.stats.get(p) match {
        case Some((mn, mx)) => key >= mn && key <= mx
        case None           => true
      }
      val bloomMay = snap.blooms.get(p) match {
        case Some(hex) => bloomMightContain(hex, key)
        case None      => true
      }
      rangeMay && bloomMay
    }
  }

  /** Compact the state at `version` into a checkpoint file. Carried
    * content: the live add-set AND the accumulated tombstones (vacuum's
    * retention decisions need removedAt even after the tail commits are
    * past the checkpoint horizon). Published with the same atomic
    * create-if-absent as commits — two writers checkpointing the same
    * version produce identical bytes, so the loser just drops out. */
  private def writeCheckpoint(root: String, version: Long): Unit = {
    val files = {
      // Resolve from the PREVIOUS checkpoint + tail, not from scratch.
      val (commits, checkpoints) = listLog(root)
      val cp = checkpoints.filter(_._1 < version).lastOption
      val floor = cp.map(_._1).getOrElse(0L)
      cp.map(_._2).toSeq ++
        commits.collect { case (cv, p) if cv > floor && cv <= version => p }
    }
    val snap = applyLog(files)
    // addedAt is lost from Snapshot.live's projection; re-derive it by
    // re-reading — cheap (the same files are hot) and keeps Snapshot's
    // public shape minimal.
    val addedAt = {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      files.foreach { p =>
        new String(Files.readAllBytes(p), "UTF-8").linesIterator.foreach {
          case l @ AddLine() =>
            val PathField(path) = l: @unchecked
            val at = l match { case AddedAt(v) => v.toLong; case _ => 0L }
            m.put(path, at): Unit
          case _ => ()
        }
      }
      m
    }
    // DV annotations ride the checkpoint too — on the add for live files,
    // on the remove (tombstone) for removed ones — so resolution from
    // checkpoint + tail loses neither reader application nor vacuum
    // protection once the attaching commit is past the checkpoint horizon.
    def dvField(p: String) =
      snap.dvs.get(p).map(d => s""","dv":"$d"""").getOrElse("") +
        snap.dvKeys.get(p).map(k => s""","dvf":"$k"""").getOrElse("")
    // Skipping stats ride the checkpoint on their live adds, so file
    // pruning keeps working once the stat-bearing commit is past the
    // checkpoint horizon.
    def statField(p: String) =
      snap.stats.get(p).map { case (mn, mx) => s""","smin":$mn,"smax":$mx""" }
        .getOrElse("")
    // Bloom words ride the checkpoint on their live adds like the min/max
    // stats, so point-lookup pruning keeps working once the bloom-bearing
    // commit is past the checkpoint horizon.
    def bloomField(p: String) =
      snap.blooms.get(p).map(b => s""","bloom":"$b"""").getOrElse("")
    // Per-file gencol width rides the checkpointed add explicitly — replay
    // sees only the latest declaration, which after an evolution is the
    // WRONG spec for older files.
    def gwField(p: String) =
      snap.gencolAtAdd.get(p).map(w => s""","gw":$w""").getOrElse("")
    // The active constraint set rides the checkpoint as its meta line, so
    // resolution from checkpoint + tail keeps enforcing it once the
    // declaring commit is past the horizon.
    val metaLines = metaLinesOf(snap)
    val json =
      (s"""{"checkpoint":{"version":$version,"adds":${snap.live.size},"tombstones":${snap.tombstones.size}}}""" +:
        (metaLines ++
          snap.live.map(p => s"""{"add":{"path":"$p","addedAt":${addedAt.getOrElse(p, 0L)}${dvField(p)}${statField(p)}${bloomField(p)}${gwField(p)}}}""") ++
          snap.tombstones.map { case (p, at) =>
            s"""{"remove":{"path":"$p","removedAt":$at${dvField(p)}}}""" }))
        .mkString("", "\n", "\n")
    publishLogFile(root, f"$version%08d.checkpoint.json", json): Unit
  }

  /** The snapshot's active meta facets serialized as checkpoint meta
    * lines — shared by the JSON checkpoint writer and the columnar
    * checkpoint's meta rows (one facet per line, latest-wins on replay). */
  private def metaLinesOf(snap: Snapshot): Seq[String] =
    (if (snap.constraints.isEmpty) Seq.empty[String]
     else Seq(s"""{"meta":{"constraints":${
       snap.constraints.map(e => s""""$e"""").mkString("[", ",", "]")}}}""")) ++
      (if (snap.schemaCols.isEmpty) Seq.empty[String]
       else Seq(s"""{"meta":{"schema":${
         snap.schemaCols.map(e => s""""$e"""").mkString("[", ",", "]")}}}""")) ++
      (if (snap.colmap.isEmpty) Seq.empty[String]
       else Seq(s"""{"meta":{"colmap":${
         snap.colmap.map(e => s""""$e"""").mkString("[", ",", "]")}}}""")) ++
      (if (snap.tags.isEmpty) Seq.empty[String]
       else Seq(s"""{"meta":{"tags":${
         snap.tags.map(e => s""""$e"""").mkString("[", ",", "]")}}}""")) ++
      snap.gencolDiv.map(w => s"""{"meta":{"gencolDiv":$w}}""").toSeq ++
      snap.minReader.map(v => s"""{"meta":{"protocol":{"minReader":$v}}}""").toSeq ++
      snap.minWriter.map(v => s"""{"meta":{"protocol":{"minWriter":$v}}}""").toSeq

  // ---- COLUMNAR CHECKPOINT (the Delta `checkpoint.parquet` shape) ----
  //
  // The JSON checkpoint is O(live files) of TEXT parsed line-by-line on
  // the driver — fine at thousands of files, a resolution bottleneck at
  // the millions a 100 TB table carries. The columnar checkpoint stores
  // the SAME action set as one typed parquet table under
  // `_log/%08d.checkpoint.parquet/` (a directory of parts — Delta's
  // multi-part checkpoint), so (a) writing it is a distributed job, and
  // (b) metadata queries PUSH DOWN: a stats-pruned probe filters
  // smin/smax in the parquet scan and only matching action rows ever
  // reach the driver. Replay semantics are IDENTICAL by construction:
  // resolution reconstructs each row's action line and feeds the same
  // parser as the JSON path ([[applyLogUnits]]), with the explicit `seq`
  // ordinal pinning replay order across part files.

  /** One columnar-checkpoint action row. `kind` ∈ add | remove | meta;
    * `at` = addedAt / removedAt; meta rows carry their serialized line
    * verbatim (facet grammar unchanged); per-file annotations (dv
    * sidecar, sidecar key, skipping stats, bloom words, bound gencol
    * width) ride as typed nullable columns. */
  final case class CkptRow(seq: Long, kind: String, path: String, at: Long,
      dv: Option[String], dvf: Option[String], smin: Option[Long],
      smax: Option[Long], bloom: Option[String], gw: Option[Long],
      meta: Option[String])

  private val ParquetCheckpointName = """(\d{8})\.checkpoint\.parquet""".r

  def parquetCheckpointDir(root: String, v: Long): String =
    logDir(root).resolve(f"$v%08d.checkpoint.parquet").toString

  /** Versions holding a columnar checkpoint, ascending. */
  def parquetCheckpoints(root: String): Seq[Long] =
    if (!Files.isDirectory(logDir(root))) Nil
    else withList(logDir(root)) { it =>
      it.flatMap(p => p.getFileName.toString match {
        case ParquetCheckpointName(v) => Some(v.toLong)
        case _                        => None
      }).toVector.sorted
    }

  /** Write the snapshot AS OF `version` as a columnar checkpoint: a
    * distributed parquet write of the action table, published atomically
    * by directory rename (a reader never sees a partial part set). */
  def writeParquetCheckpoint(s: SparkSession, root: String,
      version: Long): Unit = {
    val files = logFilesForSnapshot(root, version)
    val snap = applyLog(files)
    val addedAt = {
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      files.foreach { p =>
        new String(Files.readAllBytes(p), "UTF-8").linesIterator.foreach {
          case l @ AddLine() =>
            val PathField(path) = l: @unchecked
            val at = l match { case AddedAt(v) => v.toLong; case _ => 0L }
            m.put(path, at): Unit
          case _ => ()
        }
      }
      m
    }
    val rows =
      metaLinesOf(snap).zipWithIndex.map { case (l, i) =>
        CkptRow(i.toLong, "meta", "", 0L, None, None, None, None, None,
          None, Some(l))
      } ++
        snap.live.zipWithIndex.map { case (p, i) =>
          CkptRow(1000000L + i, "add", p, addedAt.getOrElse(p, 0L),
            snap.dvs.get(p), snap.dvKeys.get(p),
            snap.stats.get(p).map(_._1), snap.stats.get(p).map(_._2),
            snap.blooms.get(p), snap.gencolAtAdd.get(p), None)
        } ++
        snap.tombstones.zipWithIndex.map { case ((p, at), i) =>
          // Tombstones carry their dv annotation forward so vacuum's
          // retention protection survives the checkpoint horizon.
          CkptRow(2000000L + i, "remove", p, at, snap.dvs.get(p), None,
            None, None, None, None, None)
        }
    import s.implicits._
    val tmp = logDir(root).resolve(
      s".tmp-ckpt-${java.util.UUID.randomUUID().toString.take(8)}")
    s.createDataset(rows).repartition(2)
      .write.mode("overwrite").parquet(tmp.toString)
    Files.move(tmp, Paths.get(parquetCheckpointDir(root, version))): Unit
  }

  /** Snapshot resolution through the newest columnar checkpoint ≤ `v`
    * plus the JSON commit tail — the same replay as [[snapshotAsOf]]
    * (each checkpoint row reconstructs its action line and runs through
    * the shared parser), falling back to the JSON path when no columnar
    * checkpoint exists. */
  def snapshotAsOfParquet(s: SparkSession, root: String, v: Long): Snapshot =
    parquetCheckpoints(root).filter(_ <= v).lastOption match {
      case None => snapshotAsOf(root, v)
      case Some(cv) =>
        import s.implicits._
        val rows = s.read.parquet(parquetCheckpointDir(root, cv))
          .as[CkptRow].collect().sortBy(_.seq)
        val lines = rows.map(ckptRowLine).toVector
        val (commits, _) = listLog(root)
        val tail = commits.collect { case (tv, p) if tv > cv && tv <= v => p }
        applyLogUnits((lines, true) +: tail.map { p =>
          (new String(Files.readAllBytes(p), "UTF-8").linesIterator.toVector,
            false)
        })
    }

  /** Row count the last [[liveFilesAsOfParquet]] call collected from the
    * columnar checkpoint, and the executed plan of that collect —
    * CommitLogSpec pins the count to the NET live size (tombstones, meta
    * rows, and tail-superseded adds must stay in the executors) and the
    * plan to a pushed kind-filter + broadcast anti-join. */
  @volatile private[graft] var lastLiveResolveCollected: Int = -1
  @volatile private[graft] var lastLiveResolvePlan: String = ""

  /** The live file list AS OF `v`, resolved DISTRIBUTED through the
    * newest columnar checkpoint ≤ `v`: the checkpoint scan keeps only
    * `kind = 'add'` rows (the filter pushes into the parquet scan, so
    * tombstone/meta row groups never deserialize) anti-joined against the
    * BROADCAST set of paths the JSON tail removes — the driver collects
    * exactly the net live rows, never the full checkpoint. The O(tail)
    * overlay (tail adds, re-adds) then replays driver-side over the
    * collected net set. This is the READ path's resolution: a reader
    * needs the live list, not the full Snapshot; vacuum/maintenance keep
    * [[snapshotAsOfParquet]], whose result (live + every tombstone +
    * retained annotations) is inherently O(snapshot). At 100 TB the
    * difference is millions of action rows filtered where they live
    * instead of shipped to one driver heap. Falls back to the JSON path
    * when no columnar checkpoint exists. */
  def liveFilesAsOfParquet(s: SparkSession, root: String, v: Long)
      : Seq[String] =
    parquetCheckpoints(root).filter(_ <= v).lastOption match {
      case None => snapshotAsOf(root, v).live
      case Some(cv) =>
        import org.apache.spark.sql.functions.{broadcast, col}
        val (commits, _) = listLog(root)
        val tailLines = commits.collect {
          case (tv, p) if tv > cv && tv <= v =>
            new String(Files.readAllBytes(p), "UTF-8")
              .linesIterator.toVector
        }
        // Tail overlay in replay order; within one commit removes apply
        // before adds (the DV-attach shape), mirroring [[applyLogUnits]].
        val overlay: Seq[Either[String, (String, Long)]] =
          tailLines.flatMap { lines =>
            lines.collect { case l @ RemoveLine() =>
              val PathField(p) = l: @unchecked
              Left(p): Either[String, (String, Long)]
            } ++
              lines.collect { case l @ AddLine() =>
                val PathField(p) = l: @unchecked
                val at = l match { case AddedAt(a) => a.toLong; case _ => 0L }
                Right(p -> at): Either[String, (String, Long)]
              }
          }
        val tailRemoved = overlay.collect { case Left(p) => p }.distinct
        val ckAdds = s.read.parquet(parquetCheckpointDir(root, cv))
          .where(col("kind") === "add").select(col("path"), col("at"))
        val net =
          if (tailRemoved.isEmpty) ckAdds
          else {
            import s.implicits._
            ckAdds.join(
              broadcast(s.createDataset(tailRemoved).toDF("rpath")),
              col("path") === col("rpath"), "left_anti")
          }
        lastLiveResolvePlan = net.queryExecution.executedPlan.toString
        val collected = net.collect().map(r => r.getString(0) -> r.getLong(1))
        lastLiveResolveCollected = collected.length
        val state =
          scala.collection.mutable.LinkedHashMap.from(collected)
        overlay.foreach {
          case Left(p)        => state.remove(p): Unit
          case Right((p, at)) => state.put(p, at): Unit
        }
        state.toSeq.sortBy { case (p, at) => (at, p) }.map(_._1)
    }

  private def ckptRowLine(r: CkptRow): String = r.kind match {
    case "meta" => r.meta.getOrElse("""{"meta":{}}""")
    case "add" =>
      val opt = r.dv.map(d => s""","dv":"$d"""").getOrElse("") +
        r.dvf.map(k => s""","dvf":"$k"""").getOrElse("") +
        (for { mn <- r.smin; mx <- r.smax }
          yield s""","smin":$mn,"smax":$mx""").getOrElse("") +
        r.bloom.map(b => s""","bloom":"$b"""").getOrElse("") +
        r.gw.map(w => s""","gw":$w""").getOrElse("")
      s"""{"add":{"path":"${r.path}","addedAt":${r.at}$opt}}"""
    case _ =>
      val dv = r.dv.map(d => s""","dv":"$d"""").getOrElse("")
      s"""{"remove":{"path":"${r.path}","removedAt":${r.at}$dv}}"""
  }

  /** The snapshot AS OF `v` as a DataFrame: log-resolved file list into one
    * distributed parquet scan. Add paths are root-relative for files this
    * table owns and ABSOLUTE for files referenced across tables (shallow
    * clones); `basePath` (⇒ `g=…` partition columns) applies only in the
    * single-root case — a cloned table spans roots, so its generation
    * column must ride IN the rows, not the directory names. */
  def readAsOf(s: SparkSession, root: String, v: Long): DataFrame = {
    val snap = snapshotAsOf(root, v)
    requireReadable(snap, root)
    val fs = snap.live
    val paths = fs.map(f => if (f.startsWith("/")) f else s"$root/$f")
    val rdr =
      if (fs.forall(!_.startsWith("/"))) s.read.option("basePath", root)
      else s.read
    // mergeSchema: commits may EVOLVE the schema (add columns); the
    // snapshot schema is the union across its file set, with absent
    // columns null in older files — the lakehouse read contract. For
    // same-schema tables this only costs extra footer reads at planning.
    val base = rdr.option("mergeSchema", "true").parquet(paths: _*)
    val liveDvs = fs.filter(snap.dvs.contains)
    if (liveDvs.isEmpty) base
    else {
      // MERGE-ON-READ: subtract deletion-vector positions AT SCAN TIME.
      // The scan carries the hidden parquet metadata columns (file path +
      // row index — the same row addressing Delta's DV read uses) and
      // anti-joins the BROADCAST sidecar set on (file, position): one
      // distributed scan, zero shuffle of the data side, files without a
      // vector pass through the same plan untouched. Sidecar protocol:
      // parquet with `f` = table-relative data-file path, `pos` = BIGINT
      // row position. At 100 TB the sidecars are a few MB of positions
      // (that is the point of MoR — deletes cost O(deleted rows), not
      // O(table rewrite)); production engines compress them to roaring
      // bitmaps, which this broadcast anti-join is the relational shape of.
      import org.apache.spark.sql.functions.{broadcast, col}
      import s.implicits._
      val cols = base.columns.map(col)
      val dvPaths = liveDvs.map(snap.dvs).distinct
        .map(d => if (d.startsWith("/")) d else s"$root/$d")
      // `_metadata.file_path` is the file's PERCENT-ENCODED `file:` URI
      // (space → %20, '%' → %25, '#' → %23 …), so a textual comparison
      // against s"$root/$f" silently misses on any such character and the
      // deleted rows RESURFACE. Rather than decode the scan column
      // (url_decode is form-decoding — it also rewrites '+', a legal path
      // char), reproduce the encoding EXACTLY on the log-derived side:
      // the annotated file set is known driver-side and small (it is the
      // broadcast side), and java.io.File.toURI yields the same
      // single-slash `file:/…` encoding Spark's metadata column carries
      // (pinned in CommitLogSpec with a root containing ' ', '%', '#').
      // Clone-borrowed files carry ABSOLUTE add paths (see `paths` above);
      // prefixing those with root would produce a `$root//src/...` URI that
      // never matches and silently resurfaces the deleted rows. The JOIN
      // key against the sidecar's `f` column is the sidecar's OWN spelling
      // of the victim (`dvf`, diverging from `path` only for inherited
      // clone annotations — the sidecar is zero-copy, so its contents
      // still spell the source-relative path).
      val uriLookup = liveDvs
        .map { f =>
          val p = if (f.startsWith("/")) f else s"$root/$f"
          (snap.dvKeys.getOrElse(f, f), new java.io.File(p).toURI.toString)
        }
        .toDF("__dv_f", "__dv_uri")
      val dv = s.read.parquet(dvPaths: _*)
        .select(col("f"), col("pos").cast("long").as("__dv_pos"))
        .join(broadcast(uriLookup), col("f") === col("__dv_f"))
        .select(col("__dv_uri").as("__dv_file"), col("__dv_pos"))
      val withPos = base.select(cols
        :+ col("_metadata.file_path").as("__file")
        :+ col("_metadata.row_index").cast("long").as("__pos"): _*)
      withPos.join(broadcast(dv),
          withPos("__file") === dv("__dv_file") && withPos("__pos") === dv("__dv_pos"),
          "left_anti")
        .select(cols: _*)
    }
  }

  /** MERGE-ON-READ DELETE COMMIT: attach deletion vectors to live data
    * files — for each `(dataFile -> sidecar)` entry the commit carries a
    * remove + re-add of the SAME path with the `dv` annotation (the Delta
    * DV-update action shape), atomically and conflict-checked exactly like
    * [[commitChecked]]: the transaction read `readVersion` and its read
    * set is the victim files, so a concurrent compaction/rewrite of a
    * victim aborts this attach (and, symmetrically, the attach's remove
    * lines make a later conflicting rewrite abort). NO data file moves:
    * the commit is O(victims) metadata plus the sidecar — the merge-on-
    * read bargain vs copy-on-write's rewrite. A re-attach to an already
    * annotated file REPLACES the vector, so the writer must pass the
    * merged position set (Delta semantics).
    *
    * `adds` makes this the MERGE-ON-READ UPDATE commit: the matched rows'
    * OLD images die by deletion vector while their NEW images land as
    * freshly appended files — one atomic metadata commit (Delta's
    * DV-update transaction: remove+re-add-with-dv of each victim PLUS the
    * plain adds), so no reader ever sees both images or neither. The
    * update costs O(matched rows) sidecar + appended data + O(victims)
    * metadata — never a victim-file rewrite, which is the entire point at
    * 100 TB: a point update of k rows in a TB-sized file is KBs of delta. */
  def commitDVChecked(root: String, readVersion: Long,
      dvs: Map[String, String], maxAttempts: Int = 64,
      adds: Seq[String] = Nil): Long = {
    requireWritable(root)
    require(dvs.nonEmpty, "DV attach with no vectors")
    val victims = dvs.keys.toSeq.sorted
    val readSet = victims.toSet
    var v = readVersion + 1L
    var attempts = 0
    while (attempts < maxAttempts) {
      val won = publishLogFile(root, f"$v%08d.json",
        commitJson(v, adds = victims ++ adds.sorted, removes = victims,
          ts = stampFor(root, -1L), dvs = dvs))
      if (won) {
        if (v % CheckpointInterval == 0) writeCheckpoint(root, v)
        return v
      }
      val latest = latestVersion(root)
      val conflicting = removedBetween(root, readVersion, latest)
        .intersect(readSet)
      if (conflicting.nonEmpty)
        throw new java.util.ConcurrentModificationException(
          s"DV attach on $root read snapshot $readVersion but concurrent " +
            s"commits (through $latest) removed ${conflicting.size} file(s) " +
            s"of its victim set (e.g. ${conflicting.toSeq.sorted.head}) — " +
            "aborting instead of annotating rewritten files")
      attempts += 1
      v = math.max(v + 1L, latest + 1L)
    }
    throw new IllegalStateException(
      s"commit on $root lost $maxAttempts straight races — giving up")
  }

  /** SHALLOW CLONE: create `dstRoot` as a new table whose log references
    * `srcRoot`'s data files BY ABSOLUTE PATH — zero data copied, the
    * Delta/Iceberg shallow-clone shape, and the payoff of a log that
    * resolves files by reference: an experiment fork of a 100 TB table is
    * a few KB of metadata. The clone's subsequent commits land under its
    * own root and diverge; the source is never touched. VACUUM on the
    * clone is safe by construction — it deletes only unreferenced files
    * UNDER the clone's root, and the borrowed absolute references point
    * outside it (CommitLogSpec pins this). Checkpoints are cloned with the
    * same rewrite, so the clone inherits the source's resolution bound. */
  def cloneTable(srcRoot: String, dstRoot: String): Unit = {
    requireSafe(srcRoot)
    Files.createDirectories(logDir(dstRoot))
    val entries = withList(logDir(srcRoot)) {
      _.filter { p =>
        p.getFileName.toString match {
          case CommitName(_) | CheckpointName(_) => true
          case _                                 => false
        }
      }.toVector
    }
    entries.foreach { p =>
      val rewritten = new String(Files.readAllBytes(p), "UTF-8")
        .linesIterator.map { l0 =>
          // Both the data-file reference AND its deletion-vector sidecar
          // reference must go absolute: a relative `dv` on the clone would
          // resolve under the CLONE root, miss, and resurface deleted rows.
          val (l1, origRelPath) = l0 match {
            case l @ PathField(path) if !path.startsWith("/") =>
              (l.replace(s""""path":"$path"""", s""""path":"$srcRoot/$path""""),
                Some(path))
            case l => (l, None)
          }
          l1 match {
            case l @ DvRef(d) if !d.startsWith("/") =>
              // The borrowed sidecar's CONTENTS still spell the victim by
              // its source-relative path; record that spelling as `dvf` on
              // the absolutized add (unless an earlier clone hop already
              // declared one) so the MoR join key survives the clone.
              val abs = l.replace(s""""dv":"$d"""", s""""dv":"$srcRoot/$d"""")
              val alreadyKeyed = DvfField.findFirstIn(l).isDefined
              origRelPath match {
                case Some(rel) if !alreadyKeyed =>
                  abs.replace(s""""dv":"$srcRoot/$d"""",
                    s""""dv":"$srcRoot/$d","dvf":"$rel"""")
                case _ => abs
              }
            case l => l
          }
        }.mkString("", "\n", "\n")
      Files.write(logDir(dstRoot).resolve(p.getFileName.toString),
        rewritten.getBytes("UTF-8")): Unit
    }
  }

  /** VACUUM: delete every data file under `root` that the log does not
    * keep alive — crashed-writer debris, duplicated task attempts, aborted
    * overwrites, and TOMBSTONED files whose retention has expired. A file
    * removed at version r is protected while `latest - r < retainVersions`
    * (older as-of readers inside the retention window still resolve it);
    * once expired it joins the delete set and as-of reads older than the
    * removal stop being servable — exactly Delta's VACUUM trade, with
    * version-count retention standing in for wall-clock retention (the
    * fixture protocol is deterministic; production keys this on commit
    * timestamps). Default 0 = reclaim immediately, the demo-friendly
    * setting; CommitLogSpec exercises a real window. Returns (live files
    * kept, files removed): the first element counts files of the CURRENT
    * snapshot present under this root — retention-protected tombstones are
    * retained but deliberately NOT counted as live (they serve only
    * in-window as-of readers), and a clone's absolute references live
    * outside the root. Driver-side metadata + file ops; on a cluster the
    * deletes fan out, but the decision set is still log-vs-listing. Empty
    * directories left behind are pruned too (`_log` never touched). */
  def vacuum(root: String, retainVersions: Long = 0L): (Long, Long) = {
    // VACUUM deletes data on the strength of this engine's own log
    // interpretation — a newer feature may reference files in ways this
    // reader does not parse, so the writer floor gates it (Delta does the
    // same); read-only metadata listing stays open.
    requireWritable(root)
    val rootP = Paths.get(root)
    val latest = latestVersion(root)
    val snap = snapshotAsOf(root, Long.MaxValue)
    val live = snap.live.toSet
    val protectedTombs = snap.tombstones.collect {
      case (p, at) if latest - at < retainVersions => p
    }.toSet
    val st = Files.walk(rootP)
    val all = try {
      import scala.jdk.CollectionConverters._
      st.iterator().asScala
        .filter(p => Files.isRegularFile(p))
        // Hidden/marker files (_SUCCESS, .crc) are exempt, as in Delta's
        // VACUUM — they are bookkeeping, not data, and never logged.
        .filterNot { p =>
          val n = p.getFileName.toString
          n.startsWith("_") || n.startsWith(".")
        }
        .map(p => rootP.relativize(p).toString)
        .filterNot(_.startsWith("_log"))
        .toVector
    } finally st.close()
    // Deletion-vector sidecars are live exactly as long as a data file
    // that references them is servable (current snapshot or a
    // retention-protected tombstone); a compaction that materialized its
    // DVs into rewritten files leaves the sidecar unreferenced → it
    // expires with its victims' tombstones and is reclaimed here.
    val protectedDvs = snap.dvs.collect {
      case (p, d) if live(p) || protectedTombs(p) => d
    }.toSet
    val dead = all.filterNot(f => live(f) || protectedTombs(f) || protectedDvs(f))
    dead.foreach(f => Files.deleteIfExists(rootP.resolve(f)))
    // Prune data dirs the deletes emptied — "empty" meaning no real files
    // left (hidden bookkeeping like .crc shadows of deleted parquet goes
    // with the directory).
    val ds = Files.list(rootP)
    try {
      import scala.jdk.CollectionConverters._
      ds.iterator().asScala
        .filter(p => Files.isDirectory(p) && p.getFileName.toString != "_log")
        .foreach { d =>
          val c = Files.list(d)
          val entries = try c.iterator().asScala.toVector finally c.close()
          val prunable = entries.forall { e =>
            Files.isRegularFile(e) && {
              val n = e.getFileName.toString
              n.startsWith("_") || n.startsWith(".")
            }
          }
          if (prunable) {
            entries.foreach(Files.deleteIfExists(_))
            Files.deleteIfExists(d): Unit
          }
        }
    } finally ds.close()
    (all.count(live).toLong, dead.size.toLong)
  }
}
