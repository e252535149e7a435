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
    * on any row whose id is null or does not cast to an integral value
    * (Spark's string→long cast accepts only canonical integer forms).
    * Pure codegen'd projection — one `when` around the cast, no UDF. */
  def asLong(c: Column): Column =
    when(c.cast("long").isNotNull, c.cast("long"))
      .otherwise(raise_error(concat(
        lit("non-integral entity id for long-keyed state: '"),
        coalesce(c.cast("string"), lit("NULL")), lit("'"))).cast("long"))
}
