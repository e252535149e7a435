package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Unigram language-model scoring — the CCNet-style quality filter (Wenzek
  * et al. 2020): train a unigram LM on the corpus itself, score each
  * document by its mean token negative-log-likelihood, and let the caller
  * cut the worst percentile (gibberish scores high, natural text low).
  * Pairs with `Text.qualityScore` (hand heuristics) and q68's
  * per-language percentile cut.
  *
  * Shape: one shuffle on the token to build the count table (vocabulary-
  * sized, NOT corpus-sized), one single-row broadcast for the total, one
  * shuffle back on the doc id to assemble per-document scores. Linear in
  * corpus size; the count table is the only state, so the LM "trains" in
  * one aggregation pass.
  *
  * Determinism: the per-document sum folds the token NLLs IN TOKEN ORDER
  * (sort_array on (pos, nll) + an `aggregate` fold), not in whatever order
  * the shuffle delivered rows — float addition is not associative, and an
  * unordered SUM would differ run-to-run and engine-to-engine; the ordered
  * fold is bit-reproducible on both (the q78 oracle replays it with
  * `list_reduce` over a pos-ordered list). */
object LmScore {

  /** Per-document mean unigram NLL: (idCol, n_tokens, avg_nll), avg_nll
    * rounded 4dp. Higher = less like the corpus. */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      posexplode(graft.functions.Text.tokens(col(textCol))).as(Seq("pos", "tok")))
    // the scalar total sums the vocab-sized count table rather than
    // re-exploding the corpus: both branches then hang off ONE
    // hashpartitioning(tok) exchange (ReusedExchange), one corpus scan
    val grouped = toks.groupBy("tok").agg(count(lit(1)).as("cnt"))
    val counts = grouped
      .crossJoin(broadcast(grouped.agg(sum(col("cnt")).as("total"))))
      .withColumn("nll", -log(col("cnt").cast("double") / col("total").cast("double")))
      .select("tok", "nll")
    toks.join(counts, "tok")
      .groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("nll")))).as("__a"))
      .select(col(idCol),
        size(col("__a")).as("n_tokens"),
        graft.functions.Rounding.roundLikeC(
          aggregate(transform(col("__a"), s => s.getField("nll")),
            lit(0.0), (acc, x) => acc + x) / size(col("__a")).cast("double"),
          4).as("avg_nll"))
  }
}
