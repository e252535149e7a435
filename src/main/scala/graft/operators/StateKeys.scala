package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The incremental behavioral family (funnel, retention, RFM, sessions)
  * keys its persisted state on `entity.cast("long")` — the events fixture's
  * numeric user grain. A NON-integral id would cast to null SILENTLY: the
  * plain folds would collapse every such entity onto one null-keyed state
  * row, and the late-data routes would find no affected entities and
  * return the order-corrupted fold with no error at all. That failure is
  * invisible downstream, so the cast must fail LOUD instead.
  */
object StateKeys {

  /** `c` cast to the long state key, fail-loud: raises at execution time
    * on any row whose id is null or does not cast to an integral value.
    * Strings are covered by the cast itself (only canonical integer forms
    * survive); FRACTIONAL numerics are covered by the decimal round-trip —
    * `cast("long")` truncates 42.1 and 42.9 to a non-null 42, which would
    * silently collapse two entities onto one state row, so the guard
    * compares the cast against the original at decimal(38,9) precision
    * (exact for the full long range — no double-compare precision hole).
    * Pure codegen'd projection — two casts and a `when`, no UDF. */
  def asLong(c: Column): Column = {
    val lng = c.cast("long")
    when(lng.isNotNull &&
        lng.cast("decimal(38,9)") === c.cast("decimal(38,9)"), lng)
      .otherwise(raise_error(concat(
        lit("non-integral entity id for long-keyed state: '"),
        coalesce(c.cast("string"), lit("NULL")), lit("'"))).cast("long"))
  }
}
