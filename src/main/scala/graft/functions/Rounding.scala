package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-stable double rounding.
  *
  * Spark's `round(x, s)` rounds the EXACT binary value of x (BigDecimal
  * HALF_UP); DuckDB/C round as `std::round(x * 10^s) / 10^s`, where the
  * multiplication itself can land exactly on a representable half (e.g.
  * 0.85434999…×10⁴ = 8543.5) and round the other way. Any oracle-compared
  * double must round THIS way so both engines see the same boundary.
  */
object Rounding {

  /** `round(x*10^s)/10^s` — bit-compatible with DuckDB's ROUND(x, s) for
    * positive and negative values (both half-away-from-zero). */
  def roundLikeC(c: Column, scale: Int): Column = {
    val p = math.pow(10, scale)
    round(c * lit(p), 0) / lit(p)
  }
}
