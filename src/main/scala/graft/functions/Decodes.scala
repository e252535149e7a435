package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CASE-WHEN decode expressions (SURVEY §2.3 F1-F6).
  *
  * The reference embeds these in SQL strings (`dags/hanger_lane.py:288-340`,
  * `dags/ssg_gl_etl.py:297-320`, `dags/ssg_erp_op.py:292-301`); here they are
  * reusable `Column` combinators that stay inside whole-stage codegen.
  */
object Decodes {

  /** F1: two-way decode — `shift=1 → 'Day' ELSE 'Night'`
    * (`dags/hanger_lane.py:291`). */
  def twoWay(c: Column, matchVal: Any, thenVal: String, elseVal: String): Column =
    when(c === lit(matchVal), lit(thenVal)).otherwise(lit(elseVal))

  /** F2/F5: n-way remap with pass-through or constant fallback.
    * `fallback = None` keeps the original column value for unmapped codes
    * (`dags/hanger_lane.py:316-318`); `Some(v)` yields a constant such as
    * 'N/A' (`dags/ssg_gl_etl.py:306-320`).
    */
  def remap(c: Column, mapping: Seq[(String, String)], fallback: Option[String]): Column = {
    val base = fallback.map(lit).getOrElse(c)
    mapping.foldRight(base) { case ((from, to), acc) =>
      when(c === lit(from), lit(to)).otherwise(acc)
    }
  }

  /** F3: conditional measure split — qty attributed to a bucket only when the
    * dimension matches, else 0 (`dags/hanger_lane.py:319-320`). */
  def measureIf(cond: Column, measure: Column): Column =
    when(cond, measure).otherwise(lit(0))

  /** F4: prefix-based classification — `LEFT(id, n) IN (...) → label`
    * (`dags/ssg_gl_etl.py:297-304`). */
  def prefixClass(c: Column, prefixLen: Int, classes: Seq[(Seq[String], String)],
                  default: String): Column = {
    val p = substring(c, 1, prefixLen)
    classes.foldRight(lit(default): Column) { case ((prefixes, label), acc) =>
      when(p.isin(prefixes: _*), lit(label)).otherwise(acc)
    }
  }

  /** F6: sign split — positive amounts to debit, |negative| to credit
    * (`dags/ssg_erp_op.py:297-298`). */
  def debitOf(amt: Column): Column = when(amt > 0, amt).otherwise(lit(0))
  def creditOf(amt: Column): Column = when(amt < 0, abs(amt)).otherwise(lit(0))

  /** F9: COALESCE + guarded divide — null/zero denominators yield null instead
    * of error (`scripts/test/item_valuation_update.py:362-363`). */
  def safeDiv(num: Column, den: Column, scale: Int = 4): Column =
    Rounding.roundLikeC(when(coalesce(den, lit(0)) =!= 0, coalesce(num, lit(0)) / den), scale)
}
