package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** V1: row-level validation with an invalid-row side channel (SURVEY §2.11;
  * reference `dags/ssg_gl_etl.py:228-257` — rows failing coercion or
  * plausibility are diverted, not dropped silently; `dags/ssg_erp_op.py:
  * 240-243` skips rows missing the cursor column).
  *
  * One pass: every rule evaluates as a column predicate; a row's failed
  * rules concatenate into `violation`. The split is two filters over the
  * same cached/scanned frame — no per-rule scans.
  */
object Validate {

  final case class Split(valid: DataFrame, invalid: DataFrame)

  /** `rules`: (name, predicate that VALID rows satisfy). Invalid rows carry
    * a `violation` column listing every failed rule. */
  def split(df: DataFrame, rules: Seq[(String, Column)]): Split = {
    val violations = array_compact(array(rules.map { case (name, pred) =>
      when(!coalesce(pred, lit(false)), lit(name))
    }: _*))
    val tagged = df.withColumn("__viol", violations)
    Split(
      valid = tagged.filter(size(col("__viol")) === 0).drop("__viol"),
      invalid = tagged.filter(size(col("__viol")) > 0)
        .withColumn("violation", concat_ws(";", col("__viol"))).drop("__viol"))
  }

  /** The reference's plausibility guard: |net| beyond a magnitude bound is
    * suspect (`ssg_gl_etl.py:243-245`, warn at 1e12). */
  def plausibleMagnitude(c: Column, bound: Double = 1e12): Column =
    abs(c) <= bound
}
