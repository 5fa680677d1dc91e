package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Astronomical magnitude calibration [PK: the lightcurator flux→mag step]:
  *   mag = -2.5 · log10(flux) + zeroPoint
  *
  * A native Catalyst expression with whole-stage codegen (`doGenCode` emits
  * straight-line Java), so it fuses into the surrounding WholeStageCodegen
  * span — unlike a Scala UDF, which would box every row and break the span.
  */
case class Magnitude(child: Expression, zeroPoint: Double)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_mag"

  override protected def nullSafeEval(input: Any): Any =
    -2.5 * math.log10(input.asInstanceOf[Double]) + zeroPoint

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"-2.5 * java.lang.Math.log10($c) + ${zeroPoint}D")

  override protected def withNewChildInternal(newChild: Expression): Magnitude =
    copy(child = newChild)
}

object Magnitude {
  /** Register `graft_mag(flux)` (zero point 25.0) in the session's function
    * registry so it is usable from SQL and `expr(...)`. Idempotent. */
  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry.createOrReplaceTempFunction(
        "graft_mag", exprs => Magnitude(exprs.head.cast(DoubleType), 25.0), "scala_udf")

  private implicit class CastHelper(e: Expression) {
    def cast(dt: DataType): Expression =
      org.apache.spark.sql.catalyst.expressions.Cast(e, dt)
  }
}
