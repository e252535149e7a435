package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Embedding similarity-search queries. Query set = every 100th vector.
  * The brute-force path has a DuckDB oracle (list_cosine_similarity over
  * DOUBLE lists, scores ranked after 4dp rounding on both sides); the LSH
  * path is rows-only (hyperplane literals live Spark-side) and its recall
  * is asserted against brute force in SimilaritySpec.
  */
object SimilarityQueries {

  val Dim = 64
  val K = 10

  def queryVectors(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).filter(col("vec_id") % 100 === 0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q31_ann_bruteforce" -> { (s, dir) =>
      Similarity.bruteForceTopK(Tables.embeddings(s, dir),
          queryVectors(s, dir), "vec_id", "embedding", K)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    },

    "q32_ann_lsh" -> { (s, dir) =>
      Similarity.lshTopK(Tables.embeddings(s, dir), queryVectors(s, dir),
          "vec_id", "embedding", K, Dim)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    },

    "q42_ann_ivf" -> { (s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), queryVectors(s, dir),
          "vec_id", "embedding", K)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    }
  )

  def rowsOnly: Set[String] = Set("q32_ann_lsh", "q42_ann_ivf")

  def oracleSql: Map[String, String] = Map(
    "q31_ann_bruteforce" ->
      s"""WITH q AS (
         |  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
         |  FROM embeddings WHERE vec_id % 100 = 0),
         |c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings),
         |scored AS (
         |  SELECT query_id, vec_id,
         |         ROUND(list_cosine_similarity(qv, cv), 4) AS score
         |  FROM q JOIN c ON vec_id <> query_id)
         |SELECT query_id, vec_id, score FROM scored
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
         |                           ORDER BY score DESC, vec_id) <= $K
         |ORDER BY query_id, score DESC, vec_id""".stripMargin
  )
}
