package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** Typed custom aggregator: weighted mean Σ(v·w)/Σ(w).
  *
  * Buffer is a pair of partial sums, so `merge` is associative+commutative —
  * safe under Spark's partial-aggregation (map-side combine, arbitrary
  * partition merge order). FP merge-order noise is ~1e-12 relative; declared
  * query rounds to 4 decimals (grid 1e-4) so it can never surface.
  */
object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {

  override def zero: (Double, Double) = (0.0, 0.0)

  override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
    (b._1 + in._1 * in._2, b._2 + in._2)

  override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
    (a._1 + b._1, a._2 + b._2)

  override def finish(b: (Double, Double)): Double =
    if (b._2 == 0.0) Double.NaN else b._1 / b._2

  override def bufferEncoder: Encoder[(Double, Double)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
