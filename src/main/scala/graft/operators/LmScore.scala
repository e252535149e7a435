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

  /** Per-document mean INTERPOLATED BIGRAM NLL — the KenLM-shaped upgrade
    * of [[unigramNll]]: p(w₂|w₁) = λ·c(w₁w₂)/c(w₁) + (1−λ)·c(w₂)/N, scored
    * over every adjacent token pair and averaged per document (documents
    * with fewer than two tokens emit 0 bigrams, score 0.0). Catches
    * word-salad that unigram stats miss: each token can be common while
    * every TRANSITION is improbable.
    *
    * λ defaults to 0.75 so BOTH interpolation weights are exact binary
    * doubles (1−0.7 would be 0.30000000000000004 — representable, but a
    * trap for any external replay that writes "0.3").
    *
    * Shape: bigrams explode in the same projection that tokenizes (no
    * window/lag shuffle); the bigram count groupBy and the count join share
    * ONE (w1, w2) exchange (ReusedExchange, the q78 idiom); only the
    * 1-row total carries a broadcast hint — the unigram table is
    * VOCAB-sized (10⁸+ types on a web corpus, past any driver broadcast),
    * so AQE picks its join strategy from measured sizes (broadcast at
    * fixture scale, shuffle at 100 TB — the knTrigramNll discipline).
    * Per-document sums fold IN
    * POSITION ORDER (float addition is not associative — the q78
    * discipline), and the `+ 0.0` guard normalizes the all-zero-NLL edge
    * (-ln(1.0) = -0.0). */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String,
                lambda: Double = 0.75): DataFrame = {
    val toksArr = docs.select(col(idCol),
      graft.functions.Text.tokens(col(textCol)).as("__toks"))
    val uni = toksArr.select(explode(col("__toks")).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("c1"))
    val total = uni.agg(sum(col("c1")).as("total"))
    val bi = toksArr.select(col(idCol), posexplode(
        when(size(col("__toks")) >= 2,
          transform(sequence(lit(1), size(col("__toks")) - 1),
            i => struct(element_at(col("__toks"), i).as("w1"),
              element_at(col("__toks"), i + 1).as("w2"))))
          .otherwise(array())).as(Seq("pos", "p")))
      .select(col(idCol), col("pos"),
        col("p.w1").as("w1"), col("p.w2").as("w2"))
    val biCounts = bi.groupBy("w1", "w2").agg(count(lit(1)).as("c12"))
    val p = lit(lambda) * (col("c12").cast("double") / col("c1").cast("double")) +
      lit(1.0 - lambda) * (col("c2").cast("double") / col("total").cast("double"))
    val scored = bi
      .join(biCounts, Seq("w1", "w2"))
      .join(uni.select(col("tok").as("w1"), col("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("c1").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .withColumn("nll", -log(p))
    val agg0 = scored.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("nll")))).as("__a"))
      .select(col(idCol),
        size(col("__a")).as("n_bigrams"),
        (graft.functions.Rounding.roundLikeC(
          aggregate(transform(col("__a"), s => s.getField("nll")),
            lit(0.0), (acc, x) => acc + x) / size(col("__a")).cast("double"),
          4) + lit(0.0)).as("avg_nll"))
    docs.select(col(idCol)).join(agg0, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("avg_nll"), lit(0.0)).as("avg_nll"))
  }

  /** Per-document mean interpolated KNESER–NEY trigram NLL — the standard
    * n-gram LM (Kneser & Ney 1995; Chen & Goodman 1999 interpolated form)
    * that [[bigramNll]]'s simple interpolation approximates: absolute
    * discount D on the top level, CONTINUATION counts (type counts, not
    * token counts) on the lower levels — which is what catches repetitive
    * n-gram loops that raw-frequency smoothing scores as fluent ("of the
    * of the of the" has high bigram frequency but near-zero continuation
    * diversity).
    *
    *   p(w₃|w₁w₂) = (c(w₁w₂w₃) − D)/c(w₁w₂·) + D·N₁₊(w₁w₂·)/c(w₁w₂·) · p(w₃|w₂)
    *   p(w₃|w₂)   = (N₁₊(·w₂w₃) − D)/N₁₊(·w₂·) + D·N₁₊(w₂·)/N₁₊(·w₂·) · p(w₃)
    *   p(w₃)      = N₁₊(·w₃) / N₁₊(··)
    *
    * Every count derives from the ONE corpus trigram multiset (so the
    * levels are mutually consistent and, scoring the training corpus
    * itself, every denominator is ≥ 1 and every discounted numerator ≥
    * 1 − D > 0 — the max(·,0) clip never binds and is omitted). D defaults
    * to 0.75, an exact binary double (the λ=0.75 convention of
    * [[bigramNll]]).
    *
    * Engine parity: integer counts; each probability is the literal
    * left-to-right expression above (divisions and the interpolation
    * product in fixed order); per-document NLL sums fold IN POSITION ORDER;
    * docs with < 3 tokens emit 0 trigrams and score 0.0 (the + 0.0 guard
    * normalizes -0.0). Emits (idCol, n_trigrams, avg_nll 4dp).
    *
    * Shape: trigrams explode in the tokenizing projection (no lag window);
    * the trigram count groupBy and the scoring join share one (w₁,w₂,w₃)
    * exchange; every derived stat table is TYPE-TABLE-sized (distinct
    * trigram/bigram types, never corpus positions). Only the 1-row scalar
    * total carries a broadcast hint — the type tables can exceed
    * broadcastable size on a web corpus, so AQE picks their join strategy
    * from measured sizes (broadcast at fixture scale, shuffle at 100 TB) —
    * [[bigramNll]]'s plan, one level up. */
  def knTrigramNll(docs: DataFrame, idCol: String, textCol: String,
                   discount: Double = 0.75): DataFrame = {
    val d = lit(discount)
    // (measured, not kept: spreading this narrow scan before the trigram
    // explode shipped the token ARRAYS through an exchange — 28 MB and 8x
    // the task time for no wall win at sf0.1; array-typed carriers do not
    // benefit from the Exec.spreadIfNarrow treatment the scalar kernels get)
    val toksArr = docs.select(col(idCol),
      graft.functions.Text.tokens(col(textCol)).as("__toks"))
    val tri = toksArr.select(col(idCol), posexplode(
        when(size(col("__toks")) >= 3,
          transform(sequence(lit(1), size(col("__toks")) - 2),
            i => struct(element_at(col("__toks"), i).as("w1"),
              element_at(col("__toks"), i + 1).as("w2"),
              element_at(col("__toks"), i + 2).as("w3"))))
          .otherwise(array())).as(Seq("pos", "p")))
      .select(col(idCol), col("pos"),
        col("p.w1").as("w1"), col("p.w2").as("w2"), col("p.w3").as("w3"))
    // type/count tables, all bounded by distinct-trigram-type cardinality
    val triCounts = tri.groupBy("w1", "w2", "w3").agg(count(lit(1)).as("c123"))
    val ctx12 = triCounts.groupBy("w1", "w2")
      .agg(sum("c123").as("c12"), count(lit(1)).as("n12dot"))
    val t23 = triCounts.groupBy("w2", "w3").agg(count(lit(1)).as("t23"))
    val w2Stats = t23.groupBy("w2")
      .agg(sum("t23").as("ctx2"), count(lit(1)).as("n2dot"))
    val w3Stats = t23.groupBy("w3").agg(count(lit(1)).as("n_dot3"))
    val total = t23.agg(count(lit(1)).as("n_tot"))
    val p1 = col("n_dot3").cast("double") / col("n_tot").cast("double")
    val p2 = (col("t23").cast("double") - d) / col("ctx2").cast("double") +
      (d * col("n2dot").cast("double") / col("ctx2").cast("double")) * p1
    val p3 = (col("c123").cast("double") - d) / col("c12").cast("double") +
      (d * col("n12dot").cast("double") / col("c12").cast("double")) * p2
    // no hard broadcast hints on the type tables: distinct-bigram/unigram
    // TYPE tables are far beyond broadcastable size at web-corpus scale
    // (10⁹+ bigram types would OOM the driver), so AQE decides per actual
    // size — it still broadcasts them at any fixture scale. Only the 1-row
    // scalar total is unconditionally broadcast.
    val scored = tri
      .join(triCounts, Seq("w1", "w2", "w3"))
      .join(ctx12, Seq("w1", "w2"))
      .join(t23, Seq("w2", "w3"))
      .join(w2Stats, Seq("w2"))
      .join(w3Stats, Seq("w3"))
      .crossJoin(broadcast(total))
      .withColumn("nll", -log(p3))
    val agg0 = scored.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("nll")))).as("__a"))
      .select(col(idCol),
        size(col("__a")).as("n_trigrams"),
        (graft.functions.Rounding.roundLikeC(
          aggregate(transform(col("__a"), s => s.getField("nll")),
            lit(0.0), (acc, x) => acc + x) / size(col("__a")).cast("double"),
          4) + lit(0.0)).as("avg_nll"))
    docs.select(col(idCol)).join(agg0, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_trigrams"), lit(0)).as("n_trigrams"),
        coalesce(col("avg_nll"), lit(0.0)).as("avg_nll"))
  }

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
