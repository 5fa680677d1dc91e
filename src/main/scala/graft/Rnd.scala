package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Engine-portable rounding: `floor(x·10ⁿ + 0.5) / 10ⁿ`.
  *
  * NOT `functions.round`: Spark's round routes through
  * `BigDecimal.valueOf(double)` (shortest-decimal re-interpretation) while
  * DuckDB rounds the binary value — they disagree on values like
  * 33187.24395 (observed in proj_expr). This formula is the same IEEE ops in
  * both engines, so results are bit-identical. Oracle SQL spells out the same
  * expression.
  */
object Rnd {
  def rnd(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    floor(c * p + 0.5) / p
  }
}
