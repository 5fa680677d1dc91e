package graft.sources

import java.util
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Literal, NamedReference, SortDirection, SortOrder, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{AggregateFunc, Aggregation, Count, CountStar, Max, Min}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
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
      properties.getOrDefault("slice", "8192").toLong,
      properties.getOrDefault("partition_by", "") == "band",
      properties.getOrDefault("arrive", "8192").toLong)
}

object FrameCatalogSource {
  val schema: StructType = StructType(Seq(
    StructField("frame_id", LongType, nullable = false),
    StructField("band", StringType, nullable = false),
    StructField("mjd", DoubleType, nullable = false),
    StructField("exptime", LongType, nullable = false),
    StructField("zp_milli", LongType, nullable = false)))

  private val Bands = Array("u", "g", "r", "i", "z").map(UTF8String.fromString)

  private[sources] def bandName(b: Long): UTF8String = Bands(b.toInt)

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

  /** Render of the most recent runtime-filter delivery
    * ([[SupportsRuntimeV2Filtering]]) — spec observable. */
  val lastRuntimeFilter =
    new java.util.concurrent.atomic.AtomicReference[String]("")

  /** Rows actually handed to Spark across all readers — the observable the
    * aggregate-pushdown spec pins: a pushed rollup materializes one row per
    * GROUP (≤ 5), never one per frame. */
  val rowsEmitted = new java.util.concurrent.atomic.AtomicLong(0L)
}

private class FrameCatalogTable(frames: Long, slice: Long, byBand: Boolean,
    arrive: Long = 8192L)
    extends Table with SupportsRead {
  override def name(): String = s"graft_frames($frames)"
  override def schema(): StructType = FrameCatalogSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new FrameCatalogScanBuilder(frames, slice, byBand, arrive)
}

private class FrameCatalogScanBuilder(frames: Long, slice: Long,
    byBand: Boolean = false, arrive: Long = 8192L)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset {
  private var lo = 0L
  private var hi = frames
  private var pushed = Array.empty[Filter]
  private var required: StructType = FrameCatalogSource.schema
  private var aggPushed: Option[(Boolean, Seq[FrameAggScan.Spec])] = None
  private var limitN: Option[Int] = None
  private var topDesc = false
  private var offsetN = 0

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

  // ---- Aggregate pushdown (SupportsPushDownAggregates) -----------------
  // COMPLETE pushdown of count / min / max, optionally grouped by `band`:
  // every supported aggregate has a closed form over the pushed [lo, hi)
  // id window (count and id-extrema are interval arithmetic; ids of one
  // band are the congruence class id ≡ b (mod 5); mjd is monotone in id),
  // so the store answers the rollup from METADATA — no row enumeration,
  // no aggregation operator anywhere above the scan. This is the 100 TB
  // metadata-read path: the difference between answering `count(*)` from
  // the catalog and scanning every shard to count rows. Unsupported
  // shapes (sums over the periodic columns, distinct, other group keys)
  // return false and fall back to the plain row scan + Spark's aggregate.
  private def translate(agg: Aggregation): Option[(Boolean, Seq[FrameAggScan.Spec])] = {
    val groupBand = agg.groupByExpressions() match {
      case Array() => Some(false)
      case Array(r: NamedReference) if r.fieldNames().sameElements(Array("band")) =>
        Some(true)
      case _ => None
    }
    def field(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case r: NamedReference if r.fieldNames().length == 1 =>
          Some(r.fieldNames()(0))
        case _ => None
      }
    val specs = agg.aggregateExpressions().toSeq.map {
      case _: CountStar => Some(FrameAggScan.CountRows)
      // Every column is non-nullable, so count(col) ≡ count(*).
      case c: Count if !c.isDistinct && field(c.column()).isDefined =>
        Some(FrameAggScan.CountRows)
      case m: Min => field(m.column()).collect {
        case f @ ("frame_id" | "mjd") => FrameAggScan.MinOf(f)
      }
      case m: Max => field(m.column()).collect {
        case f @ ("frame_id" | "mjd") => FrameAggScan.MaxOf(f)
      }
      case _ => None
    }
    for {
      g <- groupBand
      if specs.nonEmpty && specs.forall(_.isDefined)
    } yield (g, specs.map(_.get))
  }
  override def supportCompletePushDown(agg: Aggregation): Boolean =
    translate(agg).isDefined
  override def pushAggregation(agg: Aggregation): Boolean = {
    val t = translate(agg)
    aggPushed = t.orElse(aggPushed)
    t.isDefined
  }

  // ---- Limit / top-N pushdown (SupportsPushDownLimit/TopN) -------------
  // COMPLETE pushdown: ids enumerate in order inside the pushed [lo, hi)
  // window, so LIMIT k is the first k ids and ORDER BY frame_id … LIMIT k
  // is the window's head (asc) or tail (desc) — one partition, k rows,
  // NO sort operator anywhere in the plan (isPartiallyPushed = false lets
  // Catalyst drop its Sort + per-partition limit entirely). At 100 TB this
  // is "open one shard and stop after k rows" instead of a cluster-wide
  // scan + global sort for a LIMIT 10 preview. The banded scan mode
  // declines (its partitions interleave ids, so head-of-window ≠ first k);
  // mjd ordering would also be expressible (monotone in id) but only
  // frame_id is accepted — the conservative contract, as with runtime
  // filters: reject anything not provably exact.
  override def pushLimit(l: Int): Boolean =
    if (byBand || aggPushed.isDefined) false else { limitN = Some(l); true }
  override def pushTopN(orders: Array[SortOrder], l: Int): Boolean =
    if (byBand || aggPushed.isDefined) false
    else orders match {
      case Array(so) => so.expression() match {
        case r: NamedReference if r.fieldNames().sameElements(Array("frame_id")) =>
          limitN = Some(l)
          topDesc = so.direction() == SortDirection.DESCENDING
          true
        case _ => false
      }
      case _ => false
    }
  override def isPartiallyPushed(): Boolean = false

  // OFFSET m composes: skip the window's first m ids (asc / no order) or
  // its top m (desc top-N) before the limit applies — still interval
  // arithmetic, still no row ever materialized for the skipped prefix.
  override def pushOffset(o: Int): Boolean =
    if (byBand || aggPushed.isDefined) false else { offsetN = o; true }

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = aggPushed match {
    case Some((groupBand, specs)) =>
      new FrameAggScan(lo, math.max(lo, hi), groupBand, specs)
    case None if limitN.isDefined || offsetN > 0 =>
      val hiC = math.max(lo, hi)
      val avail = math.max(0L, hiC - lo - offsetN.toLong)
      // Spark delivers the pushed limit INCLUSIVE of the offset prefix
      // (ORDER BY … LIMIT k OFFSET m arrives as pushTopN(m + k) +
      // pushOffset(m), measured): the scan drops the prefix and returns
      // the page — k rows from the offset-shifted window edge.
      val k = limitN.fold(avail)(n =>
        math.max(0L, math.min(n.toLong - offsetN.toLong, avail)))
      new FrameTopScan(
        if (topDesc) lo else lo + offsetN.toLong,
        if (topDesc) hiC - offsetN.toLong else hiC,
        k, topDesc, required)
    case None if byBand =>
      new FrameBandScan(lo, math.max(lo, hi), required)
    case None =>
      new FrameCatalogScan(lo, math.max(lo, hi), slice, required, arrive)
  }
}

/** Frame-id watermark offset for the micro-batch read: the stream's
  * position IS an id — batch (start, end] reads the ids in [start, end).
  * Serialized as the bare number (restart-stable; the checkpoint's offset
  * log round-trips through [[json]]/deserializeOffset). */
private case class FrameOffset(id: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = id.toString
}

/** The connector's STREAMING read path ([[MicroBatchStream]]): the catalog
  * is tailed as an arriving-frames stream. Offsets are frame-id ranges —
  * `initialOffset` is the window's lower edge, each micro-batch admits at
  * most `arrive` ids ([[SupportsAdmissionControl]] — the rate-limit
  * contract `maxFilesPerTrigger`/`maxOffsetsPerTrigger` implement on the
  * built-in sources), and `planInputPartitions(start, end)` slices the
  * batch's id range with the SAME `slice` geometry and reader factory as
  * the batch scan — one code path for rows whether they arrive by query or
  * by stream. `Trigger.AvailableNow` drains the window in
  * ceil(window / arrive) batches and stops (the catch-up-then-terminate
  * contract); a restart resumes from the checkpointed id offset. At scale
  * this is how a connector-backed store is TAILED: per-batch work is
  * bounded by admission control, the stream's position is O(1) metadata,
  * and a 100 TB history never replays unless the checkpoint asks it to. */
private class FrameCatalogMicroBatch(lo: Long, hi: Long, slice: Long,
    arrive: Long, fields: Array[String])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset => SOffset, ReadLimit, ReadMaxRows}

  // AvailableNow contract (SupportsTriggerAvailableNow, without which the
  // engine falls back to single-batch Trigger.Once semantics and ignores
  // the read limit): capture the drain target BEFORE the first batch, so
  // the run processes exactly what was available at start — a catalog
  // growing mid-run is next run's work. The captured target — not the
  // live `hi` — caps every subsequent offset answer below, so the
  // guarantee holds by construction even for a source whose high
  // watermark moves mid-run (this catalog's `hi` happens to be immutable
  // per scan, which must not be what the contract leans on).
  private var availableNowTarget: Long = hi
  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = hi

  override def initialOffset(): SOffset = FrameOffset(lo)
  override def getDefaultReadLimit: ReadLimit =
    ReadLimit.maxRows(math.max(1L, arrive))
  // Admission-controlled sources answer latestOffset(start, limit); the
  // no-arg form is the legacy non-rate-limited entry Spark never calls
  // when SupportsAdmissionControl is implemented.
  override def latestOffset(): SOffset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) drives an admission-controlled stream")
  override def latestOffset(start: SOffset, limit: ReadLimit): SOffset = {
    val s = start.asInstanceOf[FrameOffset].id
    val step = limit match {
      case r: ReadMaxRows => math.max(1L, r.maxRows())
      case _              => math.max(1L, arrive)
    }
    FrameOffset(math.min(availableNowTarget, s + step))
  }
  // What is AVAILABLE (vs what the next batch admits) — AvailableNow pins
  // this as the drain target before the first batch runs.
  override def reportLatestOffset(): SOffset = FrameOffset(availableNowTarget)
  override def deserializeOffset(json: String): SOffset =
    FrameOffset(json.trim.toLong)
  override def commit(end: SOffset): Unit = ()
  override def stop(): Unit = ()
  override def planInputPartitions(start: SOffset, end: SOffset): Array[InputPartition] = {
    val s = start.asInstanceOf[FrameOffset].id
    val e = end.asInstanceOf[FrameOffset].id
    Iterator.range(s, e, math.max(1L, slice))
      .map(x => FramePartition(x, math.min(x + slice, e)): InputPartition)
      .toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FrameReaderFactory(fields)
}

/** A pushed LIMIT / ORDER-BY-id-LIMIT scan: ONE partition holding the k
  * head (asc) or tail (desc) ids of the pushed window, emitted already in
  * the requested order — no Sort, no other partition, no reader beyond the
  * k rows. */
private class FrameTopScan(lo: Long, hi: Long, n: Long, desc: Boolean,
    required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftFrameCatalogScan TOPN lo=$lo hi=$hi n=$n " +
      s"order=${if (desc) "desc" else "asc"} cols=${required.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val k = math.min(n, hi - lo)
    if (k <= 0L) Array.empty
    else if (desc) Array(FrameStepPartition(hi - 1L, hi - 1L - k, -1L))
    else Array(FrameStepPartition(lo, lo + k, 1L))
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new FrameStepReaderFactory(required.fieldNames)
}

/** Id walk from `start` toward `endExclusive` in `step` (+1 or −1). */
private case class FrameStepPartition(start: Long, endExclusive: Long,
    step: Long) extends InputPartition

private class FrameStepReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    FrameCatalogSource.readersCreated.incrementAndGet()
    val FrameStepPartition(start, end, step) = p: @unchecked
    new PartitionReader[InternalRow] {
      private var id = start - step
      override def next(): Boolean = { id += step; id != end }
      override def get(): InternalRow = {
        FrameCatalogSource.rowsEmitted.incrementAndGet()
        new GenericInternalRow(
          fields.map(f => FrameCatalogSource.value(f, id)).toArray[Any])
      }
      override def close(): Unit = ()
    }
  }
}

private class FrameCatalogScan(lo: Long, hi: Long, slice: Long,
    required: StructType, arrive: Long = 8192L) extends Scan with Batch
    with SupportsRuntimeV2Filtering with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // ---- Statistics (SupportsReportStatistics) ---------------------------
  // Reported AFTER pushdown — the row count is the pushed [lo, hi) window,
  // not the table, so a query that narrows a billion-row catalog to a few
  // hundred ids reports KB, and Catalyst broadcasts that side STATICALLY.
  // Without this, a V2 relation defaults to defaultSizeInBytes ("assume
  // huge") and the join plans as a sort-merge: AQE would convert it to a
  // broadcast at runtime, but only after the fact side's shuffle map
  // stage has already been paid — reported stats save the shuffle WRITE,
  // which at 100 TB is the whole cost. ~48 B/row is honest for the
  // 5-column frame row; only the order of magnitude steers planning.
  override def estimateStatistics(): Statistics = new Statistics {
    private val rows = math.max(0L, hi - lo)
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows * 48L)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.of(rows)
  }
  // Streaming shares the batch scan's pushed [lo, hi) window, slice
  // geometry, and reader factory — the stream is the batch read paced by
  // admission control, nothing else.
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new FrameCatalogMicroBatch(lo, hi, slice, arrive, required.fieldNames)
  // Shown verbatim in the physical plan — the plan-shape pin reads the
  // pushed window and the pruned column list from here.
  override def description(): String =
    s"GraftFrameCatalogScan lo=$lo hi=$hi cols=${required.fieldNames.mkString(",")}"

  // ---- Runtime filtering (SupportsRuntimeV2Filtering) ------------------
  // Dynamic partition pruning for a V2 store: when the catalog joins a
  // small filtered dimension on frame_id, Spark executes the dim first,
  // reuses its broadcast, and delivers the join keys here as an IN
  // predicate AT RUNTIME; planInputPartitions is then re-planned and only
  // the id-slices containing a surviving key are read. Static pushdown
  // prunes by what the QUERY says; this prunes by what the DATA says —
  // at 100 TB, "scan the 4 slices the calibration set touches" instead
  // of the whole window. V2SourceSpec pins the reader count.
  private var keptIds: Option[Set[Long]] = None
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("frame_id"))
  override def filter(predicates: Array[Predicate]): Unit = {
    FrameCatalogSource.lastRuntimeFilter.set(
      predicates.map(p => s"${p.name()}${p.children().mkString("(", ",", ")")}")
        .mkString("; "))
    // A runtime filter is an OPTIMIZATION and must stay conservative: a
    // predicate is applied only when EVERY value child parses to a key —
    // dropping an unparseable value (a cast-wrapped or non-long literal)
    // would over-prune and silently lose rows, which is worse than not
    // pruning at all. Unrecognized predicates are ignored wholesale.
    def longOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[Long] =
      e match {
        case l: Literal[_] => l.value() match {
          case v: java.lang.Long    => Some(v.longValue())
          case v: java.lang.Integer => Some(v.longValue())
          case v: java.lang.Short   => Some(v.longValue())
          case _                    => None
        }
        case _ => None
      }
    val sets: Seq[Set[Long]] = predicates.toSeq.flatMap { p =>
      val onFrameId = (p.name() == "IN" || p.name() == "=") &&
        p.children().headOption.exists {
          case r: NamedReference => r.fieldNames().sameElements(Array("frame_id"))
          case _                 => false
        }
      if (!onFrameId) None
      else {
        val vals = p.children().drop(1).toSeq.map(longOf)
        if (vals.nonEmpty && vals.forall(_.isDefined)) Some(vals.flatten.toSet)
        else None // partial parse ⇒ skip the whole predicate, prune nothing
      }
    }
    if (sets.nonEmpty) keptIds = Some(sets.reduce(_ intersect _))
  }

  override def planInputPartitions(): Array[InputPartition] =
    Iterator.range(lo, hi, slice)
      .map(s => FramePartition(s, math.min(s + slice, hi)))
      .filter(p => keptIds.forall(_.exists(v => v >= p.start && v < p.end)))
      .map(p => p: InputPartition)
      .toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new FrameReaderFactory(required.fieldNames)
}

private case class FramePartition(start: Long, end: Long) extends InputPartition

/** Storage-partitioned scan (`partition_by=band`): one input partition per
  * band — the congruence class id ≡ b (mod 5) within the pushed window —
  * each carrying its partition KEY ([[HasPartitionKey]]), and the scan
  * reports [[KeyGroupedPartitioning]] over `band`. With
  * `spark.sql.sources.v2.bucketing.enabled`, Catalyst recognizes the
  * reported clustering and plans band-keyed aggregations (and
  * storage-partitioned joins) with NO shuffle above the scan — the
  * Iceberg/Hive-bucketing path where the STORE's layout replaces the
  * exchange. At 100 TB this is the connector telling Spark "already
  * partitioned how you need; don't move 100 TB to prove it". */
private class FrameBandScan(lo: Long, hi: Long, required: StructType)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftFrameCatalogScan BANDED lo=$lo hi=$hi cols=${required.fieldNames.mkString(",")}"
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(org.apache.spark.sql.connector.expressions.Expressions.identity("band")), 5)
  override def planInputPartitions(): Array[InputPartition] =
    (0L until 5L).map(b => BandPartition(b, lo, hi): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new BandReaderFactory(required.fieldNames)
}

private case class BandPartition(band: Long, lo: Long, hi: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow =
    new GenericInternalRow(Array[Any](FrameCatalogSource.bandName(band)))
}

private class BandReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    FrameCatalogSource.readersCreated.incrementAndGet()
    val BandPartition(b, lo, hi) = p: @unchecked
    new PartitionReader[InternalRow] {
      // ids ≡ b (mod 5) inside [lo, hi): first, first+5, …
      private var id = lo + java.lang.Math.floorMod(b - lo, 5L) - 5L
      override def next(): Boolean = { id += 5L; id < hi }
      override def get(): InternalRow = {
        FrameCatalogSource.rowsEmitted.incrementAndGet()
        new GenericInternalRow(
          fields.map(f => FrameCatalogSource.value(f, id)).toArray[Any])
      }
      override def close(): Unit = ()
    }
  }
}

private[sources] object FrameAggScan {
  sealed trait Spec { def name: String; def dataType: DataType }
  case object CountRows extends Spec {
    val name = "count"; val dataType: DataType = LongType
  }
  case class MinOf(f: String) extends Spec {
    val name = s"min($f)"
    val dataType: DataType = FrameCatalogSource.schema(f).dataType
  }
  case class MaxOf(f: String) extends Spec {
    val name = s"max($f)"
    val dataType: DataType = FrameCatalogSource.schema(f).dataType
  }
}

/** A completely-pushed rollup: one partition, one precomputed row per
  * surviving group. All values are interval arithmetic over the pushed
  * [lo, hi) window — no frame row is ever enumerated. */
private class FrameAggScan(lo: Long, hi: Long, byBand: Boolean,
    specs: Seq[FrameAggScan.Spec]) extends Scan with Batch {
  import FrameAggScan._

  override def readSchema(): StructType = StructType(
    (if (byBand) Seq(StructField("band", StringType, nullable = false)) else Nil) ++
      specs.zipWithIndex.map { case (sp, i) =>
        StructField(s"agg_${i}_${sp.name}", sp.dataType, nullable = true)
      })
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftFrameCatalogScan AGGPUSHED lo=$lo hi=$hi " +
      s"group=${if (byBand) "band" else "()"} aggs=${specs.map(_.name).mkString(",")}"

  private def mjd(id: Long): Double = 60000.0 + id * 0.02

  /** Aggregate values for the id set {first, first+step, …, last}. */
  private def rowFor(first: Long, last: Long, step: Long): Array[Any] =
    specs.map {
      case CountRows        => (last - first) / step + 1L
      case MinOf("frame_id") => first
      case MaxOf("frame_id") => last
      case MinOf("mjd")      => mjd(first) // monotone increasing in id
      case MaxOf("mjd")      => mjd(last)
      case sp => throw new IllegalStateException(s"unreachable spec $sp")
    }.toArray

  private lazy val rows: Seq[Array[Any]] =
    if (hi <= lo) {
      // Empty window: GROUP BY emits no groups; a global aggregate emits
      // one row of count=0 / null extrema (ANSI semantics).
      if (byBand) Nil
      else Seq(specs.map {
        case CountRows => 0L
        case _         => null
      }.toArray[Any])
    } else if (!byBand) {
      Seq(rowFor(lo, hi - 1L, 1L))
    } else {
      // Band b holds the ids ≡ b (mod 5) — a congruence class, so the
      // group's members inside [lo, hi) are first, first+5, …, last.
      (0L until 5L).flatMap { b =>
        val first = lo + java.lang.Math.floorMod(b - lo, 5L)
        if (first >= hi) None
        else {
          val last = first + 5L * ((hi - 1L - first) / 5L)
          Some(FrameCatalogSource.bandName(b) +: rowFor(first, last, 5L))
        }
      }
    }

  override def planInputPartitions(): Array[InputPartition] =
    Array(FrameAggPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    new FrameAggReaderFactory
}

private case class FrameAggPartition(rows: Seq[Array[Any]]) extends InputPartition

private class FrameAggReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    FrameCatalogSource.readersCreated.incrementAndGet()
    val FrameAggPartition(rows) = p: @unchecked
    new PartitionReader[InternalRow] {
      private val it = rows.iterator
      override def next(): Boolean = it.hasNext
      override def get(): InternalRow = {
        FrameCatalogSource.rowsEmitted.incrementAndGet()
        new GenericInternalRow(it.next())
      }
      override def close(): Unit = ()
    }
  }
}

private class FrameReaderFactory(fields: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    FrameCatalogSource.readersCreated.incrementAndGet()
    val FramePartition(start, end) = p: @unchecked
    new PartitionReader[InternalRow] {
      private var id = start - 1L
      override def next(): Boolean = { id += 1L; id < end }
      override def get(): InternalRow = {
        FrameCatalogSource.rowsEmitted.incrementAndGet()
        new GenericInternalRow(
          fields.map(f => FrameCatalogSource.value(f, id)).toArray[Any])
      }
      override def close(): Unit = ()
    }
  }
}
