package graft.sources

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Minimal transaction-log protocol for the lakehouse maintenance family
  * (`table_merge` / `table_scd2` / `table_compact` / `table_timetravel`) —
  * the Delta/Iceberg commit shape reduced to its read-side essentials:
  *
  *  - `_log/00000001.json`, `00000002.json`, … — one file per committed
  *    version, JSON actions one-per-line (a `commitInfo` header followed by
  *    one `add` per data file the commit published).
  *  - A snapshot AS OF version v is the union of `add`s with version ≤ v.
  *    The LOG is authoritative: a data file present in the directory but
  *    absent from the log does not exist (uncommitted writer debris is
  *    invisible — the isolation guarantee directory listing cannot give),
  *    and an as-of-1 reader never opens version 2's files at any scale.
  *  - The log is METADATA: a few KB per commit, read on the driver exactly
  *    like Delta's snapshot resolution. The DATA read stays fully
  *    distributed — the resolved file list feeds one parquet scan with
  *    `basePath` so partition columns (`g=…`) still bind.
  *
  * Production deltas not modeled (single-writer assumed): atomic
  * rename-based commit arbitration, checkpoints of compacted log state,
  * `remove` actions. The read protocol — the part `table_timetravel`
  * demonstrates — is the real one.
  */
object CommitLog {

  private def logDir(root: String): Path = Paths.get(root, "_log")

  private def withList[A](p: Path)(f: Iterator[Path] => A): A = {
    val st = Files.list(p)
    try {
      import scala.jdk.CollectionConverters._
      f(st.iterator().asScala)
    } finally st.close()
  }

  /** Publish `genDir`'s parquet files as version `version`. In production
    * the writer knows its own add-list transactionally; listing the
    * just-written directory here is the local-FS stand-in. */
  def commit(root: String, version: Long, genDir: String): Unit = {
    val adds = withList(Paths.get(root, genDir)) {
      _.map(_.getFileName.toString)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
        .toSeq.sorted
        .map(n => s"$genDir/$n")
    }
    Files.createDirectories(logDir(root))
    val json = (s"""{"commitInfo":{"version":$version,"adds":${adds.size}}}""" +:
      adds.map(a => s"""{"add":{"path":"$a"}}""")).mkString("", "\n", "\n")
    Files.write(logDir(root).resolve(f"$version%08d.json"), json.getBytes("UTF-8")): Unit
  }

  /** Idempotence guard for replayed writers (a restarted streaming query
    * re-delivers its last micro-batch; batchId-keyed versions make the
    * re-commit a no-op — the exactly-once recipe foreachBatch documents). */
  def commitVersionExists(root: String, version: Long): Boolean =
    Files.exists(logDir(root).resolve(f"$version%08d.json"))

  private val AddPath = """"add"\s*:\s*\{\s*"path"\s*:\s*"([^"]+)"""".r.unanchored

  /** Table-relative data files live in the snapshot AS OF `v`. */
  def filesAsOf(root: String, v: Long): Seq[String] = {
    val versions = withList(logDir(root)) {
      _.filter(_.getFileName.toString.endsWith(".json"))
        .map(p => p.getFileName.toString.stripSuffix(".json").toLong -> p)
        .filter(_._1 <= v)
        .toSeq.sortBy(_._1)
    }
    versions.flatMap { case (_, p) =>
      new String(Files.readAllBytes(p), "UTF-8").linesIterator.collect {
        case AddPath(path) => path
      }
    }
  }

  /** The snapshot AS OF `v` as a DataFrame: log-resolved file list into one
    * distributed parquet scan. Add paths are root-relative for files this
    * table owns and ABSOLUTE for files referenced across tables (shallow
    * clones); `basePath` (⇒ `g=…` partition columns) applies only in the
    * single-root case — a cloned table spans roots, so its generation
    * column must ride IN the rows, not the directory names. */
  def readAsOf(s: SparkSession, root: String, v: Long): DataFrame = {
    val fs = filesAsOf(root, v)
    val paths = fs.map(f => if (f.startsWith("/")) f else s"$root/$f")
    val rdr =
      if (fs.forall(!_.startsWith("/"))) s.read.option("basePath", root)
      else s.read
    // mergeSchema: commits may EVOLVE the schema (add columns); the
    // snapshot schema is the union across its file set, with absent
    // columns null in older files — the lakehouse read contract. For
    // same-schema tables this only costs extra footer reads at planning.
    rdr.option("mergeSchema", "true").parquet(paths: _*)
  }

  /** SHALLOW CLONE: create `dstRoot` as a new table whose log references
    * `srcRoot`'s data files BY ABSOLUTE PATH — zero data copied, the
    * Delta/Iceberg shallow-clone shape, and the payoff of a log that
    * resolves files by reference: an experiment fork of a 100 TB table is
    * a few KB of metadata. The clone's subsequent commits land under its
    * own root and diverge; the source is never touched. VACUUM on the
    * clone is safe by construction — it deletes only unreferenced files
    * UNDER the clone's root, and the borrowed absolute references point
    * outside it (CommitLogSpec pins this). */
  def cloneTable(srcRoot: String, dstRoot: String): Unit = {
    Files.createDirectories(logDir(dstRoot))
    val versions = withList(logDir(srcRoot)) {
      _.filter(_.getFileName.toString.endsWith(".json")).toVector
    }
    versions.foreach { p =>
      val rewritten = new String(Files.readAllBytes(p), "UTF-8")
        .linesIterator.map {
          case l @ AddPath(path) if !path.startsWith("/") =>
            l.replace(s""""path":"$path"""", s""""path":"$srcRoot/$path"""")
          case l => l
        }.mkString("", "\n", "\n")
      Files.write(logDir(dstRoot).resolve(p.getFileName.toString),
        rewritten.getBytes("UTF-8")): Unit
    }
  }

  /** VACUUM: delete every data file under `root` that no commit references
    * — crashed-writer debris, duplicated task attempts, aborted overwrites.
    * Returns (live kept, orphans removed). Driver-side metadata + file ops,
    * exactly Delta's VACUUM; on a cluster the deletes fan out, but the
    * decision set is still log-vs-listing. This log records only `add`s
    * (overwrites rewrite their generation dir in place), so every committed
    * file is live at the max version and retention reduces to
    * "referenced by the log or not"; with `remove` actions modeled,
    * retention-expired removed files would join the delete set. Empty
    * directories left behind are pruned too ( `_log` never touched). */
  def vacuum(root: String): (Long, Long) = {
    val rootP = Paths.get(root)
    val live = filesAsOf(root, Long.MaxValue).toSet
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
    val dead = all.filterNot(live)
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
    (all.size.toLong - dead.size.toLong, dead.size.toLong)
  }
}
