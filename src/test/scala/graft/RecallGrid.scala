package graft

import org.apache.spark.sql.functions._
import graft.analytics.SimilarityQueries
import graft.operators.Similarity

object RecallGrid {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val emb = Tables.embeddings(spark, sf)
      val qs = SimilarityQueries.queryVectors(spark, sf)
      val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
        .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      for ((nl, np) <- Seq((8, 5), (8, 6), (10, 6), (12, 8), (6, 4))) {
        val got = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 10, nl, np)
          .select("query_id", "vec_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
        println(f"$sf IVF nList=$nl%2d nProbe=$np: recall=${(exact & got).size.toDouble / exact.size}%.3f")
      }
    }
    spark.stop()
  }
}
