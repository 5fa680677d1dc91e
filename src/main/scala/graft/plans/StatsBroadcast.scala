package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Filter, HintInfo, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.LongType

/** ANALYZE-artifact registry: the driver-side handle that lets the
  * optimizer CONSUME the statistics the engine itself produces
  * (`table_stats` / `table_histogram` compute them; until this tier
  * nothing fed them back into Catalyst). An artifact records, for one
  * table root, the per-bucket row counts of a dimension column plus the
  * table's average row width — the two numbers that bound the size of an
  * equality-filtered slice. Registration is explicit and driver-side
  * (production would load it from the table's `_stats` sidecar at session
  * start); lookups key on the scan's root path, so the rule activates
  * only for tables a user has ANALYZEd. */
object TableStatsRegistry {
  final case class Artifact(bucketCol: String, bucketRows: Map[Long, Long],
      avgRowBytes: Long)
  private val reg =
    new java.util.concurrent.ConcurrentHashMap[String, Artifact]()
  def register(rootAbs: String, a: Artifact): Unit = { reg.put(rootAbs, a): Unit }
  def unregister(rootAbs: String): Unit = { reg.remove(rootAbs): Unit }
  private[plans] def forPaths(roots: Seq[String]): Option[Artifact] = {
    import scala.jdk.CollectionConverters._
    reg.asScala.collectFirst {
      case (root, a)
          if roots.nonEmpty &&
            roots.forall(p => p == root || p.startsWith(root + "/")) => a
    }
  }
}

/** STATS-DRIVEN BROADCAST — a cost-based-optimizer loop closed through the
  * extension tier (`injectOptimizerRule`, the `MagSargRewrite` pattern):
  * without column statistics, Spark's size-only estimator carries a
  * scan's FULL file bytes through a Filter, so an equality-filtered slice
  * of a large dimension still plans as a shuffle join even when the
  * matching bucket is tiny — the classic missed broadcast. This rule
  * consults the engine's own ANALYZE artifact ([[TableStatsRegistry]]):
  * when a join side is an equality filter on the artifact's bucket
  * column over a registered table, the artifact bounds that side at
  * `rows(bucket) × avgRowBytes`; if the bound clears
  * `spark.sql.autoBroadcastJoinThreshold`, the rule sets the broadcast
  * strategy on the Join node's hint — exactly what a user hint would do,
  * except DERIVED from statistics with no hint anywhere in the query
  * (PlanShapeSpec pins the hint-free BroadcastHashJoin on the INITIAL
  * plan, distinguishing it from AQE's late runtime conversion). At
  * 100 TB the stakes are one shuffle of the fact table per missed
  * broadcast; the bound is conservative (exact per-bucket counts, real
  * average width), so a wrong flip cannot OOM the driver any more than
  * the same-size user hint would. */
object StatsBroadcastRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, _, _, hint) =>
      val threshold = SQLConf.get.autoBroadcastJoinThreshold
      val newLeft = hint.leftHint match {
        case None if threshold > 0 && boundedBytes(l).exists(_ <= threshold) =>
          Some(HintInfo(strategy = Some(BROADCAST)))
        case other => other
      }
      val newRight = hint.rightHint match {
        case None if threshold > 0 && boundedBytes(r).exists(_ <= threshold) =>
          Some(HintInfo(strategy = Some(BROADCAST)))
        case other => other
      }
      if ((newLeft eq hint.leftHint) && (newRight eq hint.rightHint)) j
      else j.copy(hint = hint.copy(leftHint = newLeft, rightHint = newRight))
  }

  /** Upper bound (bytes) on the plan's output when it is an equality
    * filter on a registered table's bucket column; None when the stats
    * cannot bound it (the rule then changes nothing — missing stats must
    * never affect a plan). */
  private def boundedBytes(p: LogicalPlan): Option[Long] = p match {
    case Filter(cond, rel: LogicalRelation)             => boundRel(cond, rel)
    case Project(_, Filter(cond, rel: LogicalRelation)) => boundRel(cond, rel)
    case _                                              => None
  }

  private def boundRel(cond: Expression,
      rel: LogicalRelation): Option[Long] = rel.relation match {
    case fs: HadoopFsRelation =>
      val roots = fs.location.rootPaths.map(_.toUri.getPath)
      TableStatsRegistry.forPaths(roots).flatMap { art =>
        // Only a TOP-LEVEL conjunct `bucketCol = lit` bounds the output:
        // the same equality under Or/Not/CaseWhen does not constrain the
        // row count (e.g. `b = 7 OR key > 100` can emit the whole table),
        // so collecting it from anywhere in the tree would under-bound
        // and hint a broadcast of an arbitrarily large side. Split the
        // And-tree and accept an EqualTo only when it IS a conjunct.
        val eqLits = conjuncts(cond).collect {
          case EqualTo(a: AttributeReference, Literal(v: Long, LongType))
              if a.name == art.bucketCol => v
          case EqualTo(Literal(v: Long, LongType), a: AttributeReference)
              if a.name == art.bucketCol => v
        }
        eqLits.headOption.map { v =>
          art.bucketRows.getOrElse(v, 0L) * art.avgRowBytes
        }
      }
    case _ => None
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other     => Seq(other)
  }

  /** Idempotent programmatic injection (see [[MagSargRewrite.install]]). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_ eq StatsBroadcastRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ StatsBroadcastRule
}
