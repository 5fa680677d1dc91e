package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.DoubleType

/** Library entry point for Spark's extension mechanism:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * injects the engine's native expressions into every session built from that
  * config — the deployment-grade alternative to the per-session
  * `register(spark)` helpers (which remain for programmatic/test use). SQL
  * users then call `graft_dot(a, b)` / `graft_mag(flux)` directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[functions.DotProduct].getName, "graft_dot"),
      (exprs: Seq[Expression]) => functions.DotProduct(
        functions.DotProduct.coerce(exprs(0)),
        functions.DotProduct.coerce(exprs(1)))))
    ext.injectFunction((
      FunctionIdentifier("graft_mag"),
      new ExpressionInfo(classOf[functions.Magnitude].getName, "graft_mag"),
      (exprs: Seq[Expression]) =>
        functions.Magnitude(Cast(exprs.head, DoubleType), 25.0)))
    // The sargable-rewrite rule rides the same entry point: sessions built
    // with spark.sql.extensions=graft.GraftExtensions push graft_mag range
    // predicates to the scan with no per-session install() call.
    ext.injectOptimizerRule(_ => plans.MagSargRewrite)
    // Stats-driven broadcast: joins against ANALYZEd tables (registered in
    // plans.TableStatsRegistry) flip to broadcast when the artifact bounds
    // the filtered side under the threshold.
    ext.injectOptimizerRule(_ => plans.StatsBroadcastRule)
  }
}
