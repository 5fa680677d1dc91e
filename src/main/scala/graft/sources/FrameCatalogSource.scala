package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** [EXT] Custom DataSourceV2 connector — the extension surface the
  * UDF/UDAF/UDTF family (operators/Extensibility.scala) does not cover: a
  * TABLE provider with real scan planning. The table is a deterministic
  * synthetic frame catalog (every column pure arithmetic of `frame_id`, so
  * a DuckDB `generate_series` reproduces it exactly — the cross-engine
  * oracle rule), but the CONNECTOR mechanics are the production shape a
  * library-owned store plugs into Spark with:
  *
  *  - **Filter pushdown** ([[SupportsPushDownFilters]]): range/equality
  *    predicates on `frame_id` narrow the scan's [lo, hi) id window at
  *    PLANNING time and are removed from Spark's post-scan filter.
  *  - **Partition pruning by construction**: [[Batch.planInputPartitions]]
  *    slices the REMAINING window into contiguous `slice`-sized input
  *    partitions — ids outside the pushed range get no partition and no
  *    reader at all (the `readersCreated` counter proves it; at 100 TB
  *    this is the difference between touching 5 shards and 13).
  *  - **Column pruning** ([[SupportsPushDownRequiredColumns]]): the reader
  *    materializes only the projected fields.
  *
  * Options: `frames` (table row count), `slice` (rows per input
  * partition). Registered by class name:
  * `spark.read.format("graft.sources.FrameCatalogSource")`.
  */
class FrameCatalogSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameCatalogSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FrameCatalogTable(
      properties.getOrDefault("frames", "100000").toLong,
      properties.getOrDefault("slice", "8192").toLong)
}

object FrameCatalogSource {
  val schema: StructType = StructType(Seq(
    StructField("frame_id", LongType, nullable = false),
    StructField("band", StringType, nullable = false),
    StructField("mjd", DoubleType, nullable = false),
    StructField("exptime", LongType, nullable = false),
    StructField("zp_milli", LongType, nullable = false)))

  private val Bands = Array("u", "g", "r", "i", "z").map(UTF8String.fromString)

  /** Column generators — pure arithmetic of the id (engine-reproducible). */
  private[sources] def value(field: String, id: Long): Any = field match {
    case "frame_id" => id
    case "band"     => Bands((id % 5L).toInt)
    case "mjd"      => 60000.0 + id * 0.02
    case "exptime"  => 30L + (id % 7L) * 15L
    // (id * 2654435761) % 500 computed overflow-free: reduce both factors
    // mod 500 first (2654435761 % 500 = 261). Identical to the direct form
    // for every id where the multiply does not wrap, and — unlike the
    // direct form — still matches a HUGEINT oracle for id >= ~3.47e9 where
    // Long multiplication would go negative.
    case "zp_milli" => 25000L + ((id % 500L) * 261L) % 500L
    case other => throw new IllegalArgumentException(
      s"FrameCatalogSource has no column '$other' (schema: ${schema.fieldNames.mkString(", ")})")
  }

  /** Readers actually constructed (≡ partitions actually scanned). Local-
    * mode observable for the pruning spec; a cluster uses scan metrics. */
  val readersCreated = new AtomicInteger(0)
}

private class FrameCatalogTable(frames: Long, slice: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft_frames($frames)"
  override def schema(): StructType = FrameCatalogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FrameCatalogScanBuilder(frames, slice)
}

private class FrameCatalogScanBuilder(frames: Long, slice: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = frames
  private var pushed = Array.empty[Filter]
  private var required: StructType = FrameCatalogSource.schema

  // Accept (and fully absorb) id-range predicates; everything else stays
  // with Spark. Absorbing means Spark drops its post-scan re-check for
  // these filters — the connector CONTRACTUALLY guarantees the bound.
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThanOrEqual("frame_id", _: java.lang.Long) => true
      case GreaterThan("frame_id", _: java.lang.Long)        => true
      case LessThan("frame_id", _: java.lang.Long)           => true
      case LessThanOrEqual("frame_id", _: java.lang.Long)    => true
      case EqualTo("frame_id", _: java.lang.Long)            => true
      case _                                                 => false
    }
    accepted.foreach {
      case GreaterThanOrEqual(_, v: java.lang.Long) => lo = math.max(lo, v)
      case GreaterThan(_, v: java.lang.Long)        => lo = math.max(lo, v + 1L)
      case LessThan(_, v: java.lang.Long)           => hi = math.min(hi, v)
      case LessThanOrEqual(_, v: java.lang.Long)    => hi = math.min(hi, v + 1L)
      case EqualTo(_, v: java.lang.Long) =>
        lo = math.max(lo, v); hi = math.min(hi, v + 1L)
      case _ => ()
    }
    pushed = accepted
    rejected
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan =
    new FrameCatalogScan(lo, math.max(lo, hi), slice, required)
}

private class FrameCatalogScan(lo: Long, hi: Long, slice: Long,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // Shown verbatim in the physical plan — the plan-shape pin reads the
  // pushed window and the pruned column list from here.
  override def description(): String =
    s"GraftFrameCatalogScan lo=$lo hi=$hi cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] =
    Iterator.range(lo, hi, slice)
      .map(s => FramePartition(s, math.min(s + slice, hi)): InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FrameReaderFactory(required.fieldNames)
}

private case class FramePartition(start: Long, end: Long) extends InputPartition

private class FrameReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    FrameCatalogSource.readersCreated.incrementAndGet()
    val FramePartition(start, end) = p: @unchecked
    new PartitionReader[InternalRow] {
      private var id = start - 1L
      override def next(): Boolean = { id += 1L; id < end }
      override def get(): InternalRow =
        new GenericInternalRow(
          fields.map(f => FrameCatalogSource.value(f, id)).toArray[Any])
      override def close(): Unit = ()
    }
  }
}
