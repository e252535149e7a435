package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Rounding
import graft.operators.Aqp

/** Approximate-query-processing queries: deterministic hash-sampled
  * synopses with Horvitz–Thompson estimates and closed-form error bars —
  * the dashboard path that touches p of the table's bytes instead of all
  * of them. The portable mixer makes SAMPLE MEMBERSHIP itself part of the
  * oracle contract: DuckDB replays the same xorshift-multiply chain and
  * selects bit-for-bit the same rows, so estimates, variances, and CI
  * bounds compare exactly (both engines evaluate the same IEEE tree; the
  * only rounding is the final 4dp presentation).
  */
object AqpQueries {

  def rowsOnly: Set[String] = Set.empty

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Estimated per-source character volume from a 5% Bernoulli synopsis,
    // judged against the exact aggregate it approximates: estimate, CI
    // bounds, sampled support, the exact sum, the relative error, and
    // whether the CI covered. One sampled-bytes aggregate + one exact
    // aggregate (the exact side exists only to GRADE the estimate — a
    // production dashboard runs just the first).
    "q181_aqp_estimate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val est = Aqp.estimateSum(docs, Seq("source"), col("n_chars"),
        col("doc_id"), 1, 20)
      val exact = docs.groupBy("source")
        .agg(sum(col("n_chars").cast("long")).as("exact_sum"))
      est.join(exact, Seq("source"))
        .withColumn("rel_err", Rounding.roundLikeC(
          abs(col("est_sum") - col("exact_sum").cast("double")) /
            col("exact_sum").cast("double"), 4))
        .withColumn("within_ci",
          col("exact_sum").cast("double").between(col("ci_lo"), col("ci_hi")))
        .select("source", "est_sum", "ci_lo", "ci_hi", "n_sampled",
          "exact_sum", "rel_err", "within_ci")
        .orderBy("source")
    }
  )

  /** The mixp chain (PortableHash.mixp) over doc_id, then the HT sums —
    * identical IEEE expression order as the Spark side. */
  def oracleSql: Map[String, String] = Map(

    "q181_aqp_estimate" ->
      """WITH m1 AS (SELECT doc_id, source, n_chars,
        |        (xor(doc_id, doc_id >> 16) * 73244475) % 2147483648 AS h
        |      FROM documents),
        |m2 AS (SELECT doc_id, source, n_chars,
        |        (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM m1),
        |sampled AS (SELECT source, n_chars FROM m2
        |            WHERE xor(h, h >> 16) % 20 < 1),
        |est AS (SELECT source,
        |          CAST(sum(n_chars) AS BIGINT) AS sx,
        |          CAST(sum(n_chars * n_chars) AS BIGINT) AS sxx,
        |          count(*) AS n_sampled
        |        FROM sampled GROUP BY 1),
        |ex AS (SELECT source, CAST(sum(n_chars) AS BIGINT) AS exact_sum
        |       FROM documents GROUP BY 1),
        |j AS (SELECT est.source,
        |        CAST(sx AS DOUBLE) * 20.0 AS est_raw,
        |        1.96 * sqrt(CAST(sxx AS DOUBLE) * 380.0) AS half,
        |        n_sampled, exact_sum
        |      FROM est JOIN ex ON est.source = ex.source)
        |SELECT source,
        |  round(est_raw, 4) AS est_sum,
        |  round(est_raw - half, 4) AS ci_lo,
        |  round(est_raw + half, 4) AS ci_hi,
        |  n_sampled,
        |  exact_sum,
        |  round(abs(round(est_raw, 4) - CAST(exact_sum AS DOUBLE))
        |        / CAST(exact_sum AS DOUBLE), 4) AS rel_err,
        |  CAST(exact_sum AS DOUBLE) BETWEEN round(est_raw - half, 4)
        |    AND round(est_raw + half, 4) AS within_ci
        |FROM j
        |ORDER BY source""".stripMargin
  )
}
