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

  /** Free run metrics via Spark's Observation API: rows scanned, rows
    * violating each rule, collected DURING the action that consumes `df` —
    * zero extra scans, unlike a count()-based audit (the reference logs
    * `rows_processed` per run with exactly such a second pass,
    * `dags/hanger_lane.py:472-487`; this is the engine-side shape of that
    * log row at no extra cost).
    *
    * Usage: `val (out, obs) = Validate.observed(df, rules)`; run any ONE
    * action on `out` (write, count, collect), then `obs.get` returns the
    * metric map — `n_rows` plus one `bad_<rule>` per rule. `get` BLOCKS
    * until an action completes; metrics reflect exactly the rows that
    * action processed (Spark guarantees observed metrics are accurate
    * per-action, unlike accumulators under task retries). */
  def observed(df: DataFrame, rules: Seq[(String, Column)])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation()
    val metrics = count(lit(1)).as("n_rows") +:
      rules.map { case (name, pred) =>
        count(when(!coalesce(pred, lit(false)), lit(1))).as(s"bad_$name")
      }
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
