package graft.sources

import java.nio.file.{Files, Paths}
import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HadoopPath}
import org.apache.parquet.hadoop.ParquetWriter
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.spark.paths.SparkPath
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.datasources.parquet.{ParquetFileFormat, ParquetWriteSupport}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** [EXT] The connector surface's WRITE half — `SupportsWrite` / BATCH_WRITE
  * with the full two-phase commit protocol, completing what
  * [[FrameCatalogSource]] (read path: filter/column/aggregate pushdown)
  * deliberately left out:
  *
  *  - Each write task gets its own [[DataWriter]] (parallelism = input
  *    partitions), which STREAMS its rows into a parquet file under the
  *    job's staging directory as they arrive — no task-side buffering, no
  *    rows in memory beyond the open writer's row group. Staged files are
  *    PROVISIONAL: nothing a task writes is visible to any reader before
  *    the driver-side commit.
  *  - The task's [[WriterCommitMessage]] carries a FILE MANIFEST — staged
  *    path, row count, byte size — never the rows themselves (cf.
  *    [[CommitLog]]'s add actions; FrameStoreSpec pins that no
  *    `InternalRow` rides a commit message), so the commit stays O(tasks)
  *    driver-side metadata at any data size: the shape that survives a
  *    1000-executor job writing terabytes.
  *  - [[BatchWrite.commit]] receives every task's manifest and publishes
  *    the new snapshot ATOMICALLY (one map swap per table version);
  *    `abort` (task- or job-level) deletes the staged files and publishes
  *    nothing. An APPEND whose schema differs from the committed snapshot
  *    FAILS AT COMMIT (ACCEPT_ANY_SCHEMA admits the write plan, but the
  *    store never reinterprets previously committed files under a new
  *    schema — the staged files are cleaned up and the commit throws).
  *  - `overwrite` arrives as [[SupportsTruncate]] (Spark plans
  *    OverwriteByExpression with a true predicate): the truncate flag rides
  *    the Write and the commit swaps the manifest instead of appending —
  *    still atomic, still invisible until commit. Replaced files are
  *    reclaimed eagerly (the single-JVM stand-in for tombstone-then-vacuum
  *    retention, which [[CommitLog]] models in full).
  *  - The same table is readable back (BATCH_READ): the committed manifest
  *    plans one input partition per staged file and each
  *    [[PartitionReader]] re-reads its parquet file ON THE EXECUTOR via
  *    Spark's own row-based parquet reader — data never transits the
  *    driver in either direction.
  *
  * Registered by class name: `df.write.format("graft.sources.FrameStoreSink")
  * .option("table", t)`. Options: `table` (store key, required); `root`
  * (optional — see below); `asOf` (optional snapshot version, log mode).
  *
  * **Log-backed mode** (`option("root", dir)`): instead of the in-memory
  * manifest metastore, commits publish THROUGH [[CommitLog]] — tasks stage
  * parquet under `root/stage-<uuid>/` and the driver-side commit writes one
  * atomic `_log` version (append: adds only; overwrite: adds + removes of
  * the previous snapshot in one action list, arbitrated by
  * [[CommitLog.commitRetrying]] under concurrent writers). A V2-written
  * table is then a first-class log table: time-travelable
  * (`option("asOf", v)` on read — resolved from the log, never a directory
  * listing), shallow-clonable, restorable, and vacuumable exactly like the
  * `table_*` family; uncommitted staging debris is invisible to every
  * reader and reclaimed by [[CommitLog.vacuum]]. Schema evolution across
  * commits follows the log's read contract (mergeSchema union, absent
  * columns null) rather than the in-memory store's strict append check.
  */
class FrameStoreSink extends TableProvider {
  // Reads see the committed schema; a first WRITE arrives before the table
  // exists, so fall back to empty (ACCEPT_ANY_SCHEMA lets the write schema
  // through — the noop-sink pattern; the real schema binds at commit).
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val t = FrameStoreSink.tableName(options)
    FrameStoreSink.rootOf(options) match {
      case Some(root) =>
        val asOf = FrameStoreSink.asOfOf(options)
        val files = CommitLog.filesAsOf(root, asOf)
        if (files.isEmpty) new StructType()
        else SparkSession.active.read.option("mergeSchema", "true")
          .parquet(files.map(f =>
            if (f.startsWith("/")) f else s"$root/$f"): _*).schema
      case None => FrameStore.schemaIfExists(t).getOrElse(new StructType())
    }
  }
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val t = properties.get("table") match {
      case null => throw new IllegalArgumentException(
        "graft.sources.FrameStoreSink requires option 'table'")
      case t => t
    }
    new FrameStoreTable(t, schema, Option(properties.get("root")),
      Option(properties.get("asOf")).map(_.toLong).getOrElse(Long.MaxValue))
  }
}

object FrameStoreSink {
  private[sources] def tableName(options: CaseInsensitiveStringMap): String =
    options.get("table") match {
      case null => throw new IllegalArgumentException(
        "graft.sources.FrameStoreSink requires option 'table'")
      case t => t
    }
  private[sources] def rootOf(options: CaseInsensitiveStringMap): Option[String] =
    Option(options.get("root"))
  private[sources] def asOfOf(options: CaseInsensitiveStringMap): Long =
    Option(options.get("asOf")).map(_.toLong).getOrElse(Long.MaxValue)
}

/** One staged data file in a committed manifest: where it is, how many rows
  * it holds (so `rowCount` is a metadata sum), how many bytes. */
private[graft] final case class StagedFile(path: String, rows: Long, bytes: Long)

/** The backing store: committed manifests per table name — (schema, staged
  * parquet files), a few hundred bytes per table version regardless of data
  * size. Single-JVM by design (local[32]); a cluster deployment swaps this
  * object for a shared metastore holding exactly the same manifests. */
object FrameStore {
  import scala.collection.concurrent.TrieMap
  private val tables = TrieMap.empty[String, (StructType, Vector[StagedFile])]
  // Files a truncate REPLACED, per table: tombstoned (kept on disk) rather
  // than eagerly deleted, so a scan already planned over the prior snapshot
  // keeps reading — readers-never-affected, the snapshot-isolation property
  // the log-backed mode gets from CommitLog's retention. Retention is ONE
  // generation: the next truncate reclaims the previous truncate's
  // tombstones (see publish), and drop reclaims everything — the
  // single-JVM stand-in for vacuum's retention expiry, without the
  // unbounded growth an expiry-free map would have under repeated
  // overwrites of one table.
  private val tombstones = TrieMap.empty[String, Vector[StagedFile]]

  private def schemaShape(s: StructType) = s.fields.map(f => (f.name, f.dataType)).toSeq

  /** Delete a staged file (and the hidden `.crc` shadow Hadoop's local FS
    * writes beside it), then prune its staging directory if that left it
    * empty — staging dirs must not outlive the last file they held (a long
    * dev loop would otherwise accumulate empty `graft_fstore_stage_` dirs
    * that the AGE-based tmp sweep misses, because pruning here keeps them
    * from ever going stale). `File.delete` on a non-empty dir is a no-op. */
  private[sources] def reclaim(files: Iterable[StagedFile]): Unit =
    files.foreach { f =>
      val p = Paths.get(f.path)
      Files.deleteIfExists(p): Unit
      Option(p.getParent).foreach { d =>
        Files.deleteIfExists(d.resolve(s".${p.getFileName}.crc")): Unit
        d.toFile.delete(): Unit
      }
    }

  /** Driver-side atomic publish — the second phase of the protocol.
    * Truncate swaps the manifest and TOMBSTONES the files it replaced
    * (in-flight readers of the prior snapshot keep resolving; reclamation
    * is deferred to [[drop]]); append validates the incoming schema against
    * the committed one FIRST — committed files are never reinterpreted
    * under a different shape. Throws (= fails the commit) on mismatch; the
    * caller cleans up its staged files before rethrowing. */
  private[sources] def publish(name: String, schema: StructType,
      files: Vector[StagedFile], truncate: Boolean): Unit = synchronized {
    // One lock around validate → swap → tombstone: two commits racing the
    // same table must serialize, or an append could validate against a
    // snapshot a concurrent truncate is about to replace (check-then-act)
    // and land files of the wrong shape on the new manifest. Commit is
    // O(tasks) metadata, so the driver-side lock costs nothing.
    tables.get(name) match {
      case Some((committed, _)) if !truncate
          && schemaShape(committed) != schemaShape(schema) =>
        throw new IllegalArgumentException(
          s"append schema mismatch on FrameStore table '$name': committed " +
            s"${committed.simpleString} vs incoming ${schema.simpleString}")
      case _ => ()
    }
    val replaced = tables.get(name) match {
      case Some((_, old)) if truncate => old
      case _                          => Vector.empty
    }
    tables.updateWith(name) {
      case Some((committed, old)) if !truncate => Some((committed, old ++ files))
      case _                                   => Some((schema, files))
    }: Unit
    if (replaced.nonEmpty) {
      // SINGLE-GENERATION tombstone retention: this truncate's replaced
      // files become the retained set, and the PREVIOUS generation's
      // tombstones (whose readers planned two truncates ago) are reclaimed
      // now — the in-memory analog of CommitLog.vacuum's bounded retention.
      // Without an expiry, a session repeatedly overwriting one table keeps
      // every replaced snapshot on disk and in the map until drop().
      tombstones.put(name, replaced).foreach(reclaim)
    }
  }

  private[graft] def snapshot(name: String): Vector[StagedFile] =
    tables.get(name).map(_._2).getOrElse(Vector.empty)
  private[graft] def tombstonesOf(name: String): Vector[StagedFile] =
    tombstones.getOrElse(name, Vector.empty)
  def schemaIfExists(name: String): Option[StructType] = tables.get(name).map(_._1)
  def schemaOf(name: String): StructType =
    schemaIfExists(name).getOrElse(throw new IllegalArgumentException(
      s"FrameStore table '$name' does not exist (nothing committed yet)"))
  /** Metadata answer — the manifest's row counts, no file opened. */
  def rowCount(name: String): Long = snapshot(name).map(_.rows).sum
  def drop(name: String): Unit = {
    tables.remove(name).foreach { case (_, files) => reclaim(files) }
    tombstones.remove(name).foreach(reclaim)
  }

  /** Commits that reached phase two — the spec's protocol observable. */
  val commitsCompleted = new java.util.concurrent.atomic.AtomicInteger(0)
  val abortsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
  /** The staging directory of the most recent write job (spec observable:
    * after an abort, nothing of it remains on disk). */
  val lastStagingDir = new java.util.concurrent.atomic.AtomicReference[String]("")

  /** Staging dirs a JOB-level rollback has condemned. A task-level abort
    * that sees its dir here abandons its writer WITHOUT a footer-flushing
    * close — the close is what could recreate a directory the rollback
    * already wiped (straggler race). Same-JVM visibility is exactly the
    * scope of the race (local mode runs tasks in driver threads); on a
    * cluster the job-level delete-until-stable loop plus log-authoritative
    * visibility cover stragglers on other hosts. Entries are never reused
    * (UUID-suffixed dirs), so the set only grows by one small string per
    * aborted job — negligible. */
  private val condemnedStaging =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[sources] def isCondemned(dir: String): Boolean =
    condemnedStaging.contains(dir)

  /** Staging dirs whose rollback delete did NOT converge (a straggler kept
    * recreating files past the probe budget). They are already condemned —
    * no task can write into them again — and log-authoritative visibility
    * means they are invisible debris, so the right disposition is retry,
    * not throw: every new write job re-sweeps this list before staging. */
  private val pendingSweep =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private[sources] def sweepPending(): Unit =
    pendingSweep.toArray(Array.empty[String]).foreach { d =>
      val f = new java.io.File(d)
      if (f.exists()) graft.FsUtil.deleteRecursively(f)
      if (!f.exists()) pendingSweep.remove(d): Unit
    }

  /** Job-level rollback deletion of a staging dir: condemn it first (so
    * racing task-level aborts go footer-free and cannot recreate it), then
    * delete-and-reprobe until the dir stays absent for 3 consecutive
    * probes — a single delete can lose to a straggler's in-flight file or
    * `.crc` flush, which is exactly how the "nothing remains after abort"
    * contract used to break under full-suite load. Bounded (~1 s worst
    * case). Every caller is a rollback path (BatchWrite/StreamingWrite
    * abort, or a commit-validation failure about to rethrow), so a
    * non-converging delete must NOT throw — that would replace or mask the
    * original task/validation failure under exactly the straggler load
    * this routine exists to absorb. Instead the dir is queued on
    * [[pendingSweep]] (retried by the next write job) and, when the caller
    * passes the failure it is about to rethrow, recorded on it as a
    * suppressed exception so the diagnosis rides the real error. */
  private[sources] def deleteStagingStable(dir: String,
      suppressTo: Throwable = null): Unit = {
    condemnedStaging.add(dir): Unit
    val f = new java.io.File(dir)
    var stable = 0
    var probes = 0
    while (stable < 3 && probes < 120) {
      if (f.exists()) { graft.FsUtil.deleteRecursively(f); stable = 0 }
      else stable += 1
      probes += 1
      if (stable < 3) Thread.sleep(8L)
    }
    if (f.exists()) {
      pendingSweep.add(dir): Unit
      val e = new IllegalStateException(
        s"rollback could not remove staging dir $dir after $probes probes " +
          "(condemned + queued for re-sweep by the next write job)")
      if (suppressTo != null) suppressTo.addSuppressed(e)
      else System.err.println(s"[graft] ${e.getMessage}")
    }
  }
}

/** Executor-side parquet staging and the driver-built distributed read
  * function — both on Spark's OWN parquet machinery, so staged files are
  * ordinary parquet readable by any engine. */
private[sources] object FrameStoreStaging {

  /** Hadoop conf with the keys [[ParquetWriteSupport]] requires; the
    * writer runs inside a task, so the conf is built locally rather than
    * inherited from a session. */
  private def writeConf(schema: StructType): Configuration = {
    import org.apache.spark.sql.internal.SQLConf
    val conf = new Configuration(false)
    ParquetWriteSupport.setSchema(schema, conf)
    // ParquetWriteSupport.init asserts these are present; pin the stock
    // defaults (via the SQLConf entries, so key renames can't drift) plus
    // CORRECTED rebase — staged files carry modern timestamp semantics.
    Seq(SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE)
      .foreach(e => conf.set(e.key, e.defaultValueString))
    conf.set(SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf.set(SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key, "CORRECTED")
    conf
  }

  private class RowWriterBuilder(path: HadoopPath, schema: StructType)
      extends ParquetWriter.Builder[InternalRow, RowWriterBuilder](path) {
    override def self(): RowWriterBuilder = this
    override def getWriteSupport(conf: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport
  }

  /** Open a streaming parquet writer for `path` (task-side). */
  def openWriter(path: String, schema: StructType): ParquetWriter[InternalRow] =
    new RowWriterBuilder(new HadoopPath(path), schema)
      .withConf(writeConf(schema))
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()

  /** Build (on the driver, at scan planning) the serializable
    * file → row-iterator function the partition readers execute — Spark's
    * own parquet reader in row mode (the vectorized reader hands back
    * ColumnarBatch behind the InternalRow interface, which a V2
    * PartitionReader must not leak, so it is scoped off for the build). */
  def buildReadFunc(schema: StructType): PartitionedFile => Iterator[InternalRow] = {
    // The vectorized flag can only be scoped through the session conf, so
    // the set → build → restore window is serialized (two FrameStore scans
    // planning concurrently must not capture each other's restore), and the
    // returned function defensively unrolls a ColumnarBatch anyway — the
    // vectorized reader hands batches through the InternalRow interface,
    // which a V2 PartitionReader must never leak.
    val rawFunc = synchronized {
      val session = SparkSession.active
      val key = "spark.sql.parquet.enableVectorizedReader"
      val prev = session.conf.get(key)
      session.conf.set(key, "false")
      try new ParquetFileFormat().buildReaderWithPartitionValues(
        session, schema, new StructType(), schema, Nil, Map.empty,
        session.sessionState.newHadoopConf())
      finally session.conf.set(key, prev)
    }
    file => rawFunc(file).flatMap { (out: Any) =>
      out match {
        case cb: org.apache.spark.sql.vectorized.ColumnarBatch =>
          import scala.jdk.CollectionConverters._
          cb.rowIterator().asScala
        case row: InternalRow => Iterator.single(row)
      }
    }
  }
}

private class FrameStoreTable(tname: String, writeSchema: StructType,
    root: Option[String], asOf: Long)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String =
    root.fold(s"graft_store($tname)")(r => s"graft_store($tname@$r)")
  override def schema(): StructType =
    if (writeSchema.nonEmpty) writeSchema
    else root match {
      case Some(_) => writeSchema // read path resolved it via inferSchema
      case None => FrameStore.schemaIfExists(tname).getOrElse(new StructType())
    }
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = root match {
        case Some(r) => new FrameStoreLogScan(tname, r, asOf, schema())
        case None    => new FrameStoreScan(tname)
      }
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FrameStoreWriteBuilder(tname, info.schema(), root, info.queryId())
}

private class FrameStoreWriteBuilder(tname: String, schema: StructType,
    root: Option[String], queryId: String, truncate: Boolean = false)
    extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new FrameStoreWriteBuilder(tname, schema, root, queryId, truncate = true)
  override def build(): Write = new Write {
    override def description(): String =
      s"GraftFrameStoreWrite table=$tname truncate=$truncate" +
        root.fold("")(r => s" root=$r")
    override def toBatch: BatchWrite = root match {
      case Some(r) => new FrameStoreLogBatchWrite(r, schema, truncate)
      case None    => new FrameStoreBatchWrite(tname, schema, truncate)
    }
    // STREAMING_WRITE rides the log-backed mode only: per-epoch staging,
    // batchId-keyed versions, txn-stamped idempotent commits — the
    // in-memory manifest store has no durable identity to key a replayed
    // epoch against, so it declines rather than fake exactly-once.
    override def toStreaming: StreamingWrite = root match {
      case Some(r) => new FrameStoreLogStreamingWrite(r, schema, queryId, truncate)
      case None => throw new UnsupportedOperationException(
        "graft_store streaming write requires option 'root' (log-backed mode)")
    }
  }
}

/** Phase-two commit message: the staged file's MANIFEST — path, row count,
  * bytes — never rows (`path` is None for an empty task, which staged
  * nothing). FrameStoreSpec pins by reflection that no field can carry an
  * `InternalRow`. */
private[graft] case class FrameStoreCommit(path: Option[String], rows: Long,
    bytes: Long) extends WriterCommitMessage

private class FrameStoreBatchWrite(tname: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  // Per-job staging root, SUFFIXED with the applicationId (the runTmpPath
  // convention): committed manifests keep referencing their staging dirs
  // for the life of this JVM, so the stale-dir sweep must only ever be
  // able to select OTHER JVMs' leftovers (>1h old, different app token).
  // Without the token, a write in a >1h-old session would sweep its own
  // earlier committed files out from under their still-live manifests.
  private val appToken = SparkSession.active.sparkContext
    .applicationId.replaceAll("[^A-Za-z0-9]", "_")
  graft.FsUtil.sweepStaleTmp("graft_fstore_stage_", exclude = appToken)
  FrameStore.sweepPending()
  private val stagingDir =
    Files.createTempDirectory(s"graft_fstore_stage_${appToken}_").toString
  FrameStore.lastStagingDir.set(stagingDir)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FrameStoreWriterFactory(schema, stagingDir)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val files = messages.iterator.collect {
      case FrameStoreCommit(Some(p), n, b) => StagedFile(p, n, b)
      case FrameStoreCommit(None, _, _) => null // empty task: nothing staged
      case other => throw new IllegalStateException(s"foreign commit message $other")
    }.filter(_ != null).toVector
    try FrameStore.publish(tname, schema, files, truncate)
    catch {
      case e: IllegalArgumentException =>
        // Failed validation: staged files are debris; same stable rollback
        // as abort (speculative task duplicates may still be cleaning up).
        // A non-converging delete rides `e` as a suppressed exception —
        // the validation failure is the diagnosis, never masked.
        FrameStore.deleteStagingStable(stagingDir, suppressTo = e)
        throw e
    }
    FrameStore.commitsCompleted.incrementAndGet(): Unit
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // Nothing was published; removing the staging directory (which also
    // covers tasks that died before producing a message) IS the rollback.
    // Condemn-then-delete-until-stable: see FrameStore.deleteStagingStable.
    FrameStore.deleteStagingStable(stagingDir)
    FrameStore.abortsSeen.incrementAndGet(): Unit
  }
}

private class FrameStoreWriterFactory(schema: StructType, stagingDir: String)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val path =
        s"$stagingDir/part-$partitionId-$taskId-${java.util.UUID.randomUUID().toString.take(8)}.snappy.parquet"
      private var rows = 0L
      private var writer: ParquetWriter[InternalRow] = null
      override def write(row: InternalRow): Unit = {
        if (writer == null) {
          // The factory's staging dir exists for the life of the job; if
          // it is condemned or gone the driver already aborted — fail fast
          // rather than let the parquet writer recreate the directory and
          // resurrect staged debris the abort claims to have wiped
          // (straggler-task race).
          if (FrameStore.isCondemned(stagingDir) ||
              !Files.isDirectory(Paths.get(stagingDir)))
            throw new IllegalStateException(
              s"write after job abort: staging dir $stagingDir is gone")
          writer = FrameStoreStaging.openWriter(path, schema)
        }
        writer.write(row)
        rows += 1L
      }
      override def commit(): WriterCommitMessage =
        if (writer == null) FrameStoreCommit(None, 0L, 0L)
        else {
          writer.close() // seals the footer; the file is now complete
          writer = null
          FrameStoreCommit(Some(path), rows, Files.size(Paths.get(path)))
        }
      override def abort(): Unit = {
        // Closing flushes the footer, which can RECREATE the staging dir a
        // job-level abort already wiped (straggler race). If the job has
        // CONDEMNED this staging dir, abandon the writer WITHOUT close —
        // nothing further reaches disk and the leaked stream dies with the
        // task, so recreation is impossible by construction. Otherwise
        // (task-only failure, job still live) close normally, then remove
        // the file, its .crc shadow, and re-prune the dir (no-op if other
        // tasks' files remain; the last straggler out leaves nothing).
        if (writer != null) {
          if (!FrameStore.isCondemned(stagingDir)) writer.close()
          writer = null
        }
        val p = Paths.get(path)
        Files.deleteIfExists(p): Unit
        Option(p.getParent).foreach { d =>
          Files.deleteIfExists(d.resolve(s".${p.getFileName}.crc")): Unit
          d.toFile.delete(): Unit
        }
      }
      override def close(): Unit =
        if (writer != null) { writer.close(); writer = null }
    }
}

/** The LOG-BACKED BatchWrite: same executor-side parquet staging as the
  * in-memory protocol (the [[FrameStoreWriterFactory]] is shared verbatim),
  * but phase two publishes ONE atomic [[CommitLog]] version instead of a
  * manifest-map swap. Staging lives under `root/stage-<uuid>/` — inside the
  * table root so the committed files are table-relative log paths, yet
  * INVISIBLE until commit because the log (not the directory listing) is
  * authoritative; an aborted job's staging is deleted immediately and
  * would be vacuum-reclaimed debris even if the driver died first. An
  * overwrite commits adds + removes-of-previous-snapshot in one action
  * list, with the remove set re-resolved per retry attempt
  * ([[CommitLog.commitRetrying]] — last-writer-wins replace semantics);
  * an append commits adds only, so concurrent appends arbitrate and both
  * land. */
private class FrameStoreLogBatchWrite(root: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  private val stageName =
    "stage-" + java.util.UUID.randomUUID().toString.take(8)
  private val stagingDir = {
    FrameStore.sweepPending()
    val p = Paths.get(root, stageName)
    Files.createDirectories(p)
    p.toString
  }
  FrameStore.lastStagingDir.set(stagingDir)

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FrameStoreWriterFactory(schema, stagingDir)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.iterator.collect {
      case FrameStoreCommit(Some(p), _, _) => p
      case FrameStoreCommit(None, _, _)    => null
      case other => throw new IllegalStateException(s"foreign commit message $other")
    }.filter(_ != null).toSet
    // Validate the staged manifest against the staging dir BEFORE anything
    // is published: a mismatch means a straggler task wrote after its
    // commit message, and it must abort with NOTHING in the log — the old
    // order (publish, then compare) left the bad version committed and
    // visible with no compensating remove. The commit itself then carries
    // the VALIDATED manifest explicitly (addsKnown), so a file landing in
    // the dir between this check and the log write can never ride in.
    val onDisk = {
      import scala.jdk.CollectionConverters._
      val dir = Paths.get(stagingDir)
      if (!Files.isDirectory(dir)) Set.empty[String]
      else {
        val s = Files.list(dir)
        try s.iterator().asScala.map(_.getFileName.toString)
          .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
          .map(n => s"$stagingDir/$n").toSet
        finally s.close()
      }
    }
    if (onDisk != staged) {
      val e = new IllegalStateException(
        s"staged manifest (${staged.size} files) != staging dir contents " +
          s"(${onDisk.size}) under $stagingDir — aborted before publish")
      FrameStore.deleteStagingStable(stagingDir, suppressTo = e)
      throw e
    }
    val manifest = staged.toSeq.map(p => p.stripPrefix(s"$root/")).sorted
    val version = CommitLog.commitRetrying(root, stageName,
      removesAsOf =
        if (truncate) v => CommitLog.filesAsOf(root, v - 1L) else _ => Nil,
      addsKnown = Some(manifest))
    // Invariant (cannot fire spuriously now that adds are explicit): the
    // published version's add set IS the validated manifest.
    val committed = CommitLog.filesAsOf(root, version)
      .filter(_.startsWith(s"$stageName/")).map(f => s"$root/$f").toSet
    if (committed != staged)
      throw new IllegalStateException(
        s"committed add set (${committed.size} files) diverged from the " +
          s"validated manifest (${staged.size}) for version $version under $root")
    FrameStore.commitsCompleted.incrementAndGet(): Unit
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // Nothing reached the log, so nothing was ever visible; removing the
    // staging dir (covering tasks that died before messaging) is the whole
    // rollback — condemn-then-delete-until-stable so a straggler task's
    // footer flush cannot resurrect it (FrameStore.deleteStagingStable).
    // Had the driver died before this ran, the orphaned staging would
    // still be invisible (log-authoritative) and vacuum's job.
    FrameStore.deleteStagingStable(stagingDir)
    FrameStore.abortsSeen.incrementAndGet(): Unit
  }
}

/** The connector's STREAMING write half — exactly-once micro-batch commits
  * into the transaction log, INSIDE the connector (the recipe
  * `stream_exactly_once` runs through foreachBatch, promoted to the V2
  * `StreamingWrite` surface so `df.writeStream.format(...)` gets it for
  * free): each epoch's tasks stage parquet under
  * `root/<stage>/e<epochId>/` with the SAME [[FrameStoreWriterFactory]]
  * as batch writes, and the driver-side epoch commit publishes version
  * `epochId + 1` stamped with the txn marker `<queryId>/<epochId>`.
  * A REPLAYED epoch (Structured Streaming's at-least-once re-delivery
  * after failure recovery — the streaming queryId is stable across
  * restarts via the checkpoint) finds its version already committed with
  * ITS OWN txn and no-ops, dropping the re-staged duplicate files; a
  * version held by a FOREIGN txn fails loudly — never silently absorbed.
  * Complete-mode output arrives as truncate: each epoch commit carries
  * removes of the previous snapshot (replace semantics), append mode
  * commits adds only. At 100 TB each epoch commit is O(files-in-batch)
  * metadata and the table is readable/time-travelable mid-stream like
  * any log table. */
private class FrameStoreLogStreamingWrite(root: String, schema: StructType,
    queryId: String, truncate: Boolean) extends StreamingWrite {
  private val stageName =
    "stage-" + java.util.UUID.randomUUID().toString.take(8)

  override def createStreamingWriterFactory(
      info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new FrameStoreStreamingWriterFactory(schema, root, stageName)

  override def commit(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.iterator.collect {
      case FrameStoreCommit(Some(p), _, _) => p
      case FrameStoreCommit(None, _, _)    => null
      case other => throw new IllegalStateException(s"foreign commit message $other")
    }.filter(_ != null).toSet
    FrameStoreEpochCommit.commitEpoch(root, stageName, epochId, queryId,
      truncate, staged)
  }
  override def abort(epochId: Long,
      messages: Array[WriterCommitMessage]): Unit = {
    FrameStore.deleteStagingStable(
      Paths.get(root, stageName, s"e$epochId").toString)
    FrameStore.abortsSeen.incrementAndGet(): Unit
  }
}

private class FrameStoreStreamingWriterFactory(schema: StructType,
    root: String, stageName: String) extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
      epochId: Long): DataWriter[InternalRow] = {
    // Per-epoch staging subdir; the task-level writer (provisional files,
    // manifest-bearing commit messages, condemned-dir abort semantics) is
    // the batch factory's, reused verbatim.
    val dir = Paths.get(root, stageName, s"e$epochId")
    Files.createDirectories(dir)
    new FrameStoreWriterFactory(schema, dir.toString)
      .createWriter(partitionId, taskId)
  }
}

/** Driver-side epoch commit — factored out so FrameStoreSpec can drive the
  * replay path directly (commit the same epoch twice and pin the no-op). */
private[graft] object FrameStoreEpochCommit {
  def commitEpoch(root: String, stageName: String, epochId: Long,
      queryId: String, truncate: Boolean, staged: Set[String]): Unit = {
    val version = epochId + 1L
    val txn = s"$queryId/$epochId"
    val genDir = s"$stageName/e$epochId"
    if (CommitLog.commitVersionExists(root, version)) {
      // Version already in the log: OUR txn = replayed epoch (recovery
      // re-delivery) → idempotent no-op, reclaim the duplicate staging;
      // anyone else's txn = a foreign writer owns this version → loud
      // failure, never a silent absorb.
      val existing = CommitLog.txnOf(root, version)
      if (existing != txn)
        throw new IllegalStateException(
          s"streaming epoch $epochId maps to version $version, which is " +
            s"held by foreign txn '$existing' (ours: '$txn') under $root — " +
            "this table has another writer")
      graft.FsUtil.deleteRecursively(
        new java.io.File(Paths.get(root, genDir).toString))
    } else {
      // First delivery: validate the staged manifest against the epoch
      // dir BEFORE publishing (straggler check, as the batch commit), then
      // commit the explicit manifest under the batchId-keyed version.
      val onDisk = {
        import scala.jdk.CollectionConverters._
        val dir = Paths.get(root, genDir)
        if (!Files.isDirectory(dir)) Set.empty[String]
        else {
          val st = Files.list(dir)
          try st.iterator().asScala.map(_.getFileName.toString)
            .filter(n => n.endsWith(".parquet") && !n.startsWith("."))
            .map(n => Paths.get(root, genDir, n).toString).toSet
          finally st.close()
        }
      }
      if (onDisk != staged) {
        val e = new IllegalStateException(
          s"epoch $epochId staged manifest (${staged.size} files) != staging " +
            s"dir contents (${onDisk.size}) under $root/$genDir — aborted " +
            "before publish")
        FrameStore.deleteStagingStable(Paths.get(root, genDir).toString,
          suppressTo = e)
        throw e
      }
      val manifest = staged.toSeq.map(_.stripPrefix(s"$root/")).sorted
      val removes =
        if (truncate) CommitLog.filesAsOf(root, version - 1L) else Nil
      if (!CommitLog.tryCommit(root, version, genDir, removes,
          addsKnown = Some(manifest), txn = txn))
        throw new IllegalStateException(
          s"streaming epoch $epochId lost the version race at $version under " +
            s"$root — a concurrent writer owns this table")
      FrameStore.commitsCompleted.incrementAndGet(): Unit
    }
  }
}

/** Log-backed read: the snapshot AS OF the requested version, resolved from
  * [[CommitLog]] at scan-planning time (repeatable reads; uncommitted
  * staging is invisible), one input partition per live file, rows read
  * executor-side by the same parquet machinery as the in-memory scan. */
private class FrameStoreLogScan(tname: String, root: String, asOf: Long,
    schema: StructType) extends Scan with Batch {
  // STRICT binding at scan construction (= planning), like FrameStoreScan:
  // a lazy val would bind at first access — possibly execution — so a
  // commit landing between build() and planInputPartitions would shift the
  // read. Long.MaxValue resolves to the concrete latest version NOW for
  // the same reason.
  private val resolvedAsOf: Long =
    if (asOf == Long.MaxValue) CommitLog.latestVersion(root) else asOf
  private val files: Seq[String] =
    CommitLog.filesAsOf(root, resolvedAsOf)
      .map(f => if (f.startsWith("/")) f else s"$root/$f")
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftFrameStoreLogScan table=$tname root=$root asOf=$resolvedAsOf files=${files.size}"
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f =>
      FrameStoreFilePartition(f, Files.size(Paths.get(f))): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FrameStoreReaderFactory(FrameStoreStaging.buildReadFunc(readSchema()))
}

private class FrameStoreScan(tname: String) extends Scan with Batch {
  // Bind the snapshot at scan CONSTRUCTION (= query planning): repeatable
  // reads within a query, and a truncate that lands between planning and
  // execution cannot swap files out from under the reader — its replaced
  // files are tombstoned, not deleted, precisely so this binding stays
  // servable (FrameStoreSpec pins it).
  private val snap = FrameStore.snapshot(tname)
  // The SCHEMA is part of the snapshot: a truncate that changes the shape
  // between planning and execution must not make the in-flight reader
  // decode the tombstoned old-snapshot parquet under the NEW schema
  // (silent wrong results) — so it is captured here, with the files.
  private val snapSchema = FrameStore.schemaOf(tname)
  override def readSchema(): StructType = snapSchema
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftFrameStoreScan table=$tname files=${snap.size} rows=${snap.map(_.rows).sum}"
  override def planInputPartitions(): Array[InputPartition] =
    snap.map(f => FrameStoreFilePartition(f.path, f.bytes): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FrameStoreReaderFactory(FrameStoreStaging.buildReadFunc(readSchema()))
}

private case class FrameStoreFilePartition(path: String, bytes: Long)
    extends InputPartition

private class FrameStoreReaderFactory(
    readFunc: PartitionedFile => Iterator[InternalRow])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val FrameStoreFilePartition(path, bytes) = p: @unchecked
    new PartitionReader[InternalRow] {
      private val it = readFunc(PartitionedFile(
        InternalRow.empty, SparkPath.fromPathString(path), 0L, bytes,
        Array.empty, 0L, bytes))
      private var row: InternalRow = null
      override def next(): Boolean =
        if (it.hasNext) { row = it.next(); true } else false
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}
