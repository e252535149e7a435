package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation (SURVEY §7.4 "100 TB scale design"). AQE's skew-join
  * handling covers sort-merge joins at runtime; these operators cover the
  * two places AQE does not: hot-key AGGREGATION and broadcast-ineligible
  * hot-key joins.
  */
object Skew {

  /** Two-phase salted aggregation for algebraic aggregates: phase 1 groups
    * on (keys, salt) so a hot key spreads over `saltBuckets` reducers;
    * phase 2 merges the partials. Same result as a direct groupBy-sum —
    * SkewSpec proves it — at the cost of a second (tiny) shuffle.
    *
    * Salt must be deterministic for retry safety: hash of the whole row,
    * not rand(). */
  def saltedSum(df: DataFrame, keys: Seq[String], measure: Column,
                alias: String, saltBuckets: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(saltBuckets)))
    salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(measure).as("__partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__partial")).as(alias))
  }

  /** Salted equi-join for a skewed fact against a dimension too large to
    * broadcast: the fact side gets a deterministic salt in [0, n); the dim
    * side replicates n× (explode), so each hot fact key spreads over n
    * reducers. Output equals the plain join (SkewSpec). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 saltBuckets: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(saltBuckets)))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(i => lit(i.toLong)): _*)))
    saltedFact.join(replicatedDim, Seq(key, "__salt")).drop("__salt")
  }
}
