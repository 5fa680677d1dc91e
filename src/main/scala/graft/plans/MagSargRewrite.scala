package graft.plans

import graft.functions.Magnitude
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, GreaterThan, LessThan, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** SARGABLE REWRITE of the native magnitude predicate — a custom Catalyst
  * optimizer [[Rule]] (the third extension tier after expressions and
  * connectors): `graft_mag(flux) < m` can never reach a parquet scan as a
  * pushed filter (the source filter API speaks column-vs-literal
  * comparisons, not custom expressions), but magnitude is strictly
  * DECREASING in flux, so the predicate is equivalent to
  * `flux > 10^((zp − m) / 2.5)` — which pushes down and prunes row groups.
  *
  * Domain edges are preserved exactly: flux = 0 gives mag = +∞ (fails
  * `< m`) and fails `> t` (t > 0); flux < 0 gives NaN (fails `< m`) and
  * fails `> t`; NULL fails both. So the rewrite is semantics-preserving on
  * the FULL domain, and the oracle parity check of the query that uses it
  * re-proves that on every fixture — a wrong boundary would hash-mismatch.
  *
  * At 100 TB this is the difference between decoding every flux value to
  * evaluate a codegen'd expression and never reading most row groups at
  * all: the rule moves the work from the compute tier to the scan's
  * min/max statistics. Deployment-grade injection rides
  * `spark.sql.extensions` ([[graft.GraftExtensions]]); built sessions add
  * it programmatically via [[MagSargRewrite.install]].
  */
object MagSargRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThan(Magnitude(flux, zp), Literal(m: Double, DoubleType)) =>
        GreaterThan(stripNoopCast(flux),
          Literal(math.pow(10.0, (zp - m) / 2.5), DoubleType))
    }

  /** The SQL registration wraps the argument in `Cast(col, double)`; by the
    * time this rule runs, SimplifyCasts has already fired, so a no-op cast
    * left inside the Magnitude child would hide the attribute from the
    * source-filter translator. Strip it — only when it IS a no-op. */
  private def stripNoopCast(e: Expression): Expression = e match {
    case Cast(a, DoubleType, _, _) if a.dataType == DoubleType => a
    case other                                                 => other
  }

  /** Idempotent programmatic injection for an already-built session (the
    * Verify/Bench sessions are constructed without `spark.sql.extensions`).
    * `extraOptimizations` runs as a final optimizer batch — after predicate
    * pushdown has already parked the Filter on the relation, which is
    * exactly where the rewritten comparison must sit for the physical
    * planner's source-filter translation to pick it up. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_ eq MagSargRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ MagSargRewrite
}
