package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7.4 "100 TB scale design"). AQE's skew-join
  * handling covers sort-merge joins at runtime; these operators cover the
  * two places AQE does not: hot-key AGGREGATION and broadcast-ineligible
  * hot-key joins.
  */
object Skew {

  /** Default salt: deterministic (retry-safe — rand() re-rolls on task
    * retry) hash of the whole row. CAVEAT: BIT-IDENTICAL duplicate rows of
    * a hot key all hash to one salt and stay on one reducer — for
    * duplicate-heavy facts (click/impression logs where whole rows repeat)
    * pass `saltCol = Some(xxhash64(uniqueIdCol))` (or any per-row-distinct
    * expression) so the spread actually happens; it stays deterministic. */
  private def rowSalt(df: DataFrame, saltCol: Option[Column],
                      saltBuckets: Int): Column =
    pmod(xxhash64(saltCol.getOrElse(struct(df.columns.map(col): _*))),
      lit(saltBuckets))

  /** Two-phase salted aggregation for algebraic aggregates: phase 1 groups
    * on (keys, salt) so a hot key spreads over `saltBuckets` reducers;
    * phase 2 merges the partials. Same result as a direct groupBy-sum —
    * SkewSpec proves it — at the cost of a second (tiny) shuffle. See
    * [[rowSalt]] for the duplicate-row caveat on the default salt. */
  def saltedSum(df: DataFrame, keys: Seq[String], measure: Column,
                alias: String, saltBuckets: Int = 16,
                saltCol: Option[Column] = None): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, saltCol, saltBuckets))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(measure).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(alias))
  }

  /** Salted equi-join for a skewed fact against a dimension too large to
    * broadcast: the fact side gets a deterministic salt in [0, n); the dim
    * side replicates n× (explode), so each hot fact key spreads over n
    * reducers. Output equals the plain join (SkewSpec). See [[rowSalt]]
    * for the duplicate-row caveat on the default salt. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int = 16,
                 saltCol: Option[Column] = None): DataFrame = {
    val saltedFact = fact.withColumn("__salt", rowSalt(fact, saltCol, saltBuckets))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
