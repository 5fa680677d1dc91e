package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** [EXT] The connector surface's WRITE half — `SupportsWrite` / BATCH_WRITE
  * with the full two-phase commit protocol, completing what
  * [[FrameCatalogSource]] (read path: filter/column/aggregate pushdown)
  * deliberately left out:
  *
  *  - Each write task gets its own [[DataWriter]] (parallelism = input
  *    partitions). Written rows are PROVISIONAL: they buffer in the task
  *    and travel to the driver inside its [[WriterCommitMessage]] — nothing
  *    a task writes is visible to any reader before the driver-side commit.
  *  - [[BatchWrite.commit]] receives every task's message and publishes
  *    them ATOMICALLY (one volatile swap per table version); `abort` (task-
  *    or job-level) discards without a trace. This is exactly the contract
  *    a production sink implements — there the messages carry FILE
  *    MANIFESTS (the written parquet paths, cf. [[CommitLog]]'s add
  *    actions) rather than the rows themselves, so commit stays O(tasks)
  *    metadata at any data size; carrying the rows is the single-JVM
  *    stand-in that keeps the protocol observable in a spec.
  *  - `overwrite` arrives as [[SupportsTruncate]] (Spark plans
  *    OverwriteByExpression with a true predicate): the truncate flag rides
  *    the Write and the commit swaps instead of appending — still atomic,
  *    still invisible until commit.
  *  - The same table is readable back (BATCH_READ) with the committed
  *    snapshot split into input partitions, so write → read → aggregate
  *    round-trips inside one query plan.
  *
  * Registered by class name: `df.write.format("graft.sources.FrameStoreSink")
  * .option("table", t)`. Options: `table` (store key, required).
  */
class FrameStoreSink extends TableProvider {
  // Reads see the committed schema; a first WRITE arrives before the table
  // exists, so fall back to empty (ACCEPT_ANY_SCHEMA lets the write schema
  // through — the noop-sink pattern; the real schema binds at commit).
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameStore.schemaIfExists(FrameStoreSink.tableName(options))
      .getOrElse(new StructType())
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FrameStoreTable(properties.get("table") match {
      case null => throw new IllegalArgumentException(
        "graft.sources.FrameStoreSink requires option 'table'")
      case t => t
    }, schema)
}

object FrameStoreSink {
  private[sources] def tableName(options: CaseInsensitiveStringMap): String =
    options.get("table") match {
      case null => throw new IllegalArgumentException(
        "graft.sources.FrameStoreSink requires option 'table'")
      case t => t
    }
}

/** The backing store: committed snapshots per table name. Single-JVM by
  * design (local[32]); a cluster deployment swaps this object for the real
  * store the commit messages' manifests point into. */
object FrameStore {
  import scala.collection.concurrent.TrieMap
  private val tables = TrieMap.empty[String, (StructType, Vector[InternalRow])]

  /** Driver-side atomic publish — the second phase of the protocol. */
  private[sources] def publish(name: String, schema: StructType,
      rows: Vector[InternalRow], truncate: Boolean): Unit =
    tables.updateWith(name) {
      case Some((_, old)) if !truncate => Some((schema, old ++ rows))
      case _                          => Some((schema, rows))
    }: Unit

  private[sources] def snapshot(name: String): Vector[InternalRow] =
    tables.get(name).map(_._2).getOrElse(Vector.empty)
  def schemaIfExists(name: String): Option[StructType] = tables.get(name).map(_._1)
  def schemaOf(name: String): StructType =
    schemaIfExists(name).getOrElse(throw new IllegalArgumentException(
      s"FrameStore table '$name' does not exist (nothing committed yet)"))
  def rowCount(name: String): Long = snapshot(name).size.toLong
  def drop(name: String): Unit = tables.remove(name): Unit

  /** Commits that reached phase two — the spec's protocol observable. */
  val commitsCompleted = new java.util.concurrent.atomic.AtomicInteger(0)
  val abortsSeen = new java.util.concurrent.atomic.AtomicInteger(0)
}

private class FrameStoreTable(tname: String, writeSchema: StructType)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft_store($tname)"
  override def schema(): StructType =
    if (writeSchema.nonEmpty) writeSchema
    else FrameStore.schemaIfExists(tname).getOrElse(new StructType())
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.ACCEPT_ANY_SCHEMA)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new FrameStoreScan(tname)
    }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new FrameStoreWriteBuilder(tname, info.schema())
}

private class FrameStoreWriteBuilder(tname: String, schema: StructType,
    truncate: Boolean = false) extends WriteBuilder with SupportsTruncate {
  override def truncate(): WriteBuilder =
    new FrameStoreWriteBuilder(tname, schema, truncate = true)
  override def build(): Write = new Write {
    override def description(): String =
      s"GraftFrameStoreWrite table=$tname truncate=$truncate"
    override def toBatch: BatchWrite = new FrameStoreBatchWrite(tname, schema, truncate)
  }
}

/** Phase-two commit messages: in production these carry file manifests;
  * here they carry the buffered rows themselves (see class doc). */
private case class FrameStoreCommit(rows: Array[InternalRow])
    extends WriterCommitMessage

private class FrameStoreBatchWrite(tname: String, schema: StructType,
    truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new FrameStoreWriterFactory(schema)
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val rows = messages.iterator.flatMap {
      case FrameStoreCommit(rs) => rs
      case other => throw new IllegalStateException(s"foreign commit message $other")
    }.toVector
    FrameStore.publish(tname, schema, rows, truncate)
    FrameStore.commitsCompleted.incrementAndGet(): Unit
  }
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // Nothing was published; dropping the messages IS the rollback.
    FrameStore.abortsSeen.incrementAndGet(): Unit
  }
}

private class FrameStoreWriterFactory(schema: StructType)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = Vector.newBuilder[InternalRow]
      // copy(): the incoming InternalRow is a reused mutable buffer.
      override def write(row: InternalRow): Unit = buf += row.copy()
      override def commit(): WriterCommitMessage =
        FrameStoreCommit(buf.result().toArray)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}

private class FrameStoreScan(tname: String) extends Scan with Batch {
  // Bind the snapshot at scan-planning time (repeatable reads within a query).
  private lazy val snap = FrameStore.snapshot(tname)
  override def readSchema(): StructType = FrameStore.schemaOf(tname)
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftFrameStoreScan table=$tname rows=${snap.size}"
  override def planInputPartitions(): Array[InputPartition] = {
    val slice = math.max(1, snap.size / 8)
    snap.grouped(slice).map(FrameStorePartition(_): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FrameStoreReaderFactory
}

private case class FrameStorePartition(rows: Vector[InternalRow])
    extends InputPartition

private class FrameStoreReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val FrameStorePartition(rows) = p: @unchecked
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      override def next(): Boolean = it.hasNext
      override def get(): InternalRow = it.next()
      override def close(): Unit = ()
    }
  }
}
