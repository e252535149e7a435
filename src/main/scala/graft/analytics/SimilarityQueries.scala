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

  /** Near-dup threshold for the clone fixture: rescaled clones score 1.0,
    * the closest natural pair in any fixture scores ≤ 0.61. */
  val DupThreshold = 0.99

  /** Corpus with deterministic near-duplicates injected: every vector
    * reappears under vec_id+1000000 scaled by 1.1 — cosine-identical
    * (score 1.0) without being byte-identical. The scale happens in DOUBLE
    * on both engines (widening float→double is exact, x*1.1 is one IEEE
    * op), so the DuckDB oracle rebuilds bit-identical clone vectors. */
  def embeddingsWithClones(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    e.unionByName(e.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.1d)).as("embedding")))
  }

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

    // IVF with the deterministic sampled quantizer (refineIters = 0): every
    // step — top-nList-by-mix2 centroid selection, 4dp-quantized argmax
    // assignment, probe, exact re-rank — is engine-portable, so the whole
    // index build + search is DuckDB-oracle-checked. The Lloyd-refined path stays spec-covered
    // (SimilaritySpec: objective monotone, recall floored) but k-means means
    // over shuffled partitions are not bit-reproducible cross-engine.
    "q42_ann_ivf" -> { (s, dir) =>
      Similarity.ivfTopK(Tables.embeddings(s, dir), queryVectors(s, dir),
          "vec_id", "embedding", K)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    },

    // PQ/ADC ANN (rows-only: codebooks are engine-internal; recall is
    // floored against brute force in SimilaritySpec).
    "q54_ann_pq" -> { (s, dir) =>
      Similarity.pqTopK(Tables.embeddings(s, dir), queryVectors(s, dir),
          "vec_id", "embedding", K)
        .orderBy(col("query_id"), col("score").desc, col("vec_id"))
    },

    // embedding-cosine near-dup pairs: exact O(n²) verifier.
    "q44_cosine_dup_exact" -> { (s, dir) =>
      Similarity.cosineDupPairsExact(embeddingsWithClones(s, dir),
          "vec_id", "embedding", DupThreshold)
        .orderBy("id_a", "id_b")
    },

    // embedding-cosine near-dup pairs: LSH-bucketed scale path. Oracle uses
    // the SAME exact-pairwise SQL as q44 — rescaled clones share every
    // hyperplane sign bit, so recall on this fixture is exactly 1.0 and the
    // candidate path must reproduce the exact answer.
    "q45_cosine_dup_lsh" -> { (s, dir) =>
      Similarity.cosineDupPairs(embeddingsWithClones(s, dir),
          "vec_id", "embedding", DupThreshold, Dim)
        .orderBy("id_a", "id_b")
    }
  )

  def rowsOnly: Set[String] = Set("q32_ann_lsh", "q54_ann_pq")

  def oracleSql: Map[String, String] = Map(

    // q42: the full IVF pipeline in SQL. Centroids = the nList corpus
    // vectors FIRST IN mix2-HASH ORDER (a uniform sample — the same LCG the
    // q58/q60/q65 oracles replicate), cell id = hash-order rank; assignment
    // = argmax of the 4dp-rounded cosine, ties to the lowest cell; queries
    // probe nProbe cells; exact re-rank inside probed cells.
    "q42_ann_ivf" ->
      s"""WITH emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |hashed AS (
         |  SELECT vec_id, v,
         |         (((vec_id % 2147483648) * 1664525 + 1013904223) % 2147483648
         |          * 1103515245 + 12345) % 2147483648 AS h
         |  FROM emb),
         |cents AS (
         |  SELECT ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS cell, v AS cvec
         |  FROM hashed
         |  QUALIFY ROW_NUMBER() OVER (ORDER BY h, vec_id) <= 8),
         |cassign AS (
         |  SELECT vec_id, cell, v FROM (
         |    SELECT e.vec_id, c.cell, e.v,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |             ROUND(list_cosine_similarity(e.v, c.cvec), 4) DESC, c.cell) AS r
         |    FROM emb e CROSS JOIN cents c)
         |  WHERE r = 1),
         |qassign AS (
         |  SELECT query_id, cell, qv FROM (
         |    SELECT e.vec_id AS query_id, c.cell, e.v AS qv,
         |           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
         |             ROUND(list_cosine_similarity(e.v, c.cvec), 4) DESC, c.cell) AS r
         |    FROM emb e CROSS JOIN cents c
         |    WHERE e.vec_id % 100 = 0)
         |  WHERE r <= 6),
         |scored AS (
         |  SELECT q.query_id, ca.vec_id,
         |         ROUND(list_cosine_similarity(q.qv, ca.v), 4) AS score
         |  FROM qassign q JOIN cassign ca USING (cell)
         |  WHERE ca.vec_id <> q.query_id)
         |SELECT query_id, vec_id, score FROM scored
         |QUALIFY ROW_NUMBER() OVER (PARTITION BY query_id
         |                           ORDER BY score DESC, vec_id) <= $K
         |ORDER BY query_id, score DESC, vec_id""".stripMargin,

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
         |ORDER BY query_id, score DESC, vec_id""".stripMargin,

    "q44_cosine_dup_exact" -> cosineDupOracle,
    "q45_cosine_dup_lsh" -> cosineDupOracle
  )

  /** Shared oracle for q44/q45: exact pairwise cosine over the cloned
    * corpus. The LSH path must match it exactly (recall 1.0 on rescale
    * clones — see q45 comment). */
  private def cosineDupOracle: String =
    s"""WITH base AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |corpus AS (
       |  SELECT vec_id, v FROM base
       |  UNION ALL
       |  SELECT vec_id + 1000000, list_transform(v, x -> x * 1.1) FROM base),
       |scored AS (
       |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       |         ROUND(list_cosine_similarity(a.v, b.v), 4) AS score
       |  FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id)
       |SELECT id_a, id_b, score FROM scored
       |WHERE score >= $DupThreshold
       |ORDER BY id_a, id_b""".stripMargin
}
