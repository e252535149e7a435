package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, Rounding}

/** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
  * Language Models via Importance Resampling"): score every document by how
  * much more likely its hashed-bigram features are under a TARGET
  * distribution (e.g. curated/high-quality docs) than under the RAW corpus
  * distribution. Documents are then importance-resampled by weight; this
  * operator produces the per-document log-ratio score.
  *
  * Model: bigrams hash into `buckets` buckets ([[PortableHash.poly]] — the
  * engine-portable fold, so the q97 oracle replays the bucketing exactly);
  * each distribution is the add-1-smoothed bucket histogram; a document's
  * score is the mean over its bigrams of
  * `ln((t_b+1)/(T+B)) - ln((r_b+1)/(R+B))`.
  *
  * Scale shape: one shuffle on the bucket id to build BOTH histograms (the
  * target count rides the same aggregation as the raw count — one pass, one
  * exchange), a `buckets`-row broadcast back onto the bigram stream, one
  * shuffle on the doc id to fold per-document scores. Nothing is ever keyed
  * on the corpus pair space. The per-document sum folds bigram scores IN
  * POSITION ORDER (float addition is not associative — same discipline as
  * `LmScore.unigramNll`), so results are bit-reproducible across runs,
  * partitionings, and engines.
  */
object Dsir {

  /** Per-document importance weights: (idCol, n_bigrams, avg_logratio).
    * `targetPred` marks the target-distribution rows; every input document
    * comes back (docs with < 2 tokens have no bigrams → weight 0.0).
    * avg_logratio > 0 ⇒ the document looks more target-like than raw. */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        targetPred: Column, buckets: Int = 64): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    val toks = docs.select(col(idCol), targetPred.as("__tgt"),
      graft.functions.Text.tokens(col(textCol)).as("__w"))
    val bg = toks.filter(size(col("__w")) >= 2)
      .select(col(idCol), col("__tgt"),
        posexplode(expr(
          "transform(sequence(1, size(__w)-1), i -> concat(element_at(__w,i), ' ', element_at(__w,i+1)))"))
          .as(Seq("pos", "bg")))
      .withColumn("__h", expr(s"(${PortableHash.polySql("bg")}) % ${buckets}L"))
    val stats = bg.groupBy("__h").agg(
      count(lit(1)).as("__r"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__t"))
    // names must differ case-insensitively from __r/__t: Spark's default
    // resolver treats __t and __T as the same name (ambiguous reference)
    val totals = stats.agg(sum("__r").as("__rtot"), sum("__t").as("__ttot"))
    val lam = stats.crossJoin(broadcast(totals))
      .withColumn("lam",
        log((col("__t") + lit(1L)).cast("double") / (col("__ttot") + lit(buckets.toLong)).cast("double")) -
          log((col("__r") + lit(1L)).cast("double") / (col("__rtot") + lit(buckets.toLong)).cast("double")))
      .select("__h", "lam")
    val perDoc = bg.join(broadcast(lam), "__h")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("lam")))).as("__a"))
      .select(col(idCol),
        size(col("__a")).as("n_bigrams"),
        Rounding.roundLikeC(
          aggregate(transform(col("__a"), s => s.getField("lam")),
            lit(0.0), (acc, x) => acc + x) / size(col("__a")).cast("double"),
          4).as("avg_logratio"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("avg_logratio"), lit(0.0)).as("avg_logratio"))
  }
}
