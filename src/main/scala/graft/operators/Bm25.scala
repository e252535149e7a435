package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BM25 keyword retrieval over a tokenized text column (Robertson &
  * Zaragoza 2009) — the lexical ranking a training-data pipeline uses for
  * targeted corpus slicing ("pull the docs about X") next to the embedding
  * ANN path, and the reference-shaped "scored SELECT" a search user expects.
  *
  * Shape: ONE aggregate pass computes every corpus statistic (N, total
  * token count, per-term document frequencies — a single row), which then
  * broadcast-cross-joins back onto the corpus for a pure-projection score:
  * no per-term shuffle, no inverted index materialized, cost = two corpus
  * scans (the stats pass must finish before scoring can start) + one
  * single-row broadcast + TakeOrderedAndProject for the top-k. An
  * inverted-index variant only wins when |terms| ≪ matching docs and the
  * index already exists; for ad-hoc scoring of a 100 TB corpus the scan IS
  * the plan, and the second scan reads only (id, text) thanks to pruning.
  *
  * idf uses the BM25+ always-positive form ln(1 + (N - df + .5)/(df + .5));
  * the final score rounds 4dp (`roundLikeC`) so ranking is reproducible
  * across engines — ln() may differ in the last ulp between libm and the
  * JVM, 12 orders below the rounding grain.
  */
object Bm25 {

  /** Per-document BM25 scores for `terms` (exact token match); rows with
    * score 0 (no term present) are dropped. Output: (idCol, score). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            terms: Seq[String], k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoreWith(docs, idCol, textCol, terms,
      statsOf(docs, textCol, terms), k1, b)

  /** Per-doc document length + per-term term frequencies — the projection
    * both the stats pass and the scoring pass share. */
  private def withTfOf(docs: DataFrame, idCol: Option[String],
                       textCol: String, terms: Seq[String]): DataFrame = {
    val toks = docs.select(
      (idCol.map(col).toSeq :+
        graft.functions.Text.tokens(col(textCol)).as("__w")): _*)
    def tf(t: String): Column =
      size(filter(col("__w"), x => x === lit(t)))
    toks.select(
      (idCol.map(col).toSeq ++ (size(col("__w")).as("__len") +:
        terms.zipWithIndex.map { case (t, i) => tf(t).as(s"__tf$i") })): _*)
  }

  /** The BM25 corpus-stats STATE for `terms`: ONE row `(__n, __sumlen,
    * __df0..__df{k-1})` — all exact integer sums, i.e. a monoid:
    * [[statsAdvance]] folds a new document batch in by addition, landing
    * exactly the state a full recompute would build (q204's chained
    * oracle). At 100 TB this is the incremental search-index discipline:
    * df/N/avglen maintain per ingest batch without rescanning the corpus;
    * only the slice being SCORED is ever scanned at query time. */
  def statsOf(docs: DataFrame, textCol: String,
              terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val withTf = withTfOf(docs, None, textCol, terms)
    // coalesce(sum, 0): SUM over zero rows is NULL, so without it an empty
    // batch would be (__n=0, __sumlen=NULL, __df*=NULL) and statsAdvance's
    // additions would null-poison the folded state — with it, the empty
    // batch is exactly the monoid identity the advance contract promises
    val aggs = count(lit(1)).as("__n") +:
      coalesce(sum(col("__len")), lit(0L)).as("__sumlen") +:
      terms.indices.map(i =>
        coalesce(sum(when(col(s"__tf$i") > 0, 1L).otherwise(0L)), lit(0L))
          .as(s"__df$i"))
    withTf.agg(aggs.head, aggs.tail: _*)
  }

  /** Advance the stats state with one document batch — 1-row + 1-row
    * integer addition, exact under any batching. */
  def statsAdvance(state: DataFrame, batch: DataFrame, textCol: String,
                   terms: Seq[String]): DataFrame = {
    val b = statsOf(batch, textCol, terms)
      .select((col("__n").as("_bn") +: col("__sumlen").as("_bs") +:
        terms.indices.map(i => col(s"__df$i").as(s"_bd$i"))): _*)
    state.crossJoin(b)
      .select(((col("__n") + col("_bn")).as("__n") +:
        (col("__sumlen") + col("_bs")).as("__sumlen") +:
        terms.indices.map(i =>
          (col(s"__df$i") + col(s"_bd$i")).as(s"__df$i"))): _*)
  }

  /** Score `docs` against a GIVEN stats state (freshly aggregated or
    * incrementally advanced) — the [[score]] math, replay contract
    * unchanged. */
  def scoreWith(docs: DataFrame, idCol: String, textCol: String,
                terms: Seq[String], stats: DataFrame,
                k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    val withTf = withTfOf(docs, Some(idCol), textCol, terms)
    val scored = withTf.crossJoin(broadcast(stats))
      .withColumn("__avglen",
        col("__sumlen").cast("double") / col("__n").cast("double"))
      .withColumn("__norm",
        lit(k1) * (lit(1.0 - b) + lit(b) * col("__len").cast("double") / col("__avglen")))
    val termScore = terms.indices.map { i =>
      val tfd = col(s"__tf$i").cast("double")
      val idf = log(lit(1.0) +
        (col("__n").cast("double") - col(s"__df$i") + lit(0.5)) / (col(s"__df$i") + lit(0.5)))
      idf * tfd * lit(k1 + 1.0) / (tfd + col("__norm"))
    }.reduce(_ + _)
    // positivity tests the RAW score, not the rounded one: the BM25+ idf is
    // strictly positive, so raw > 0 ⇔ some query term is present — whereas
    // a ubiquitous term's idf (~ln(1 + 0.5/N)) rounds to 0.0000 at corpus
    // scale and a rounded-score filter would silently drop true matches
    scored
      .withColumn("__raw", termScore)
      .filter(col("__raw") > 0)
      .select(col(idCol),
        graft.functions.Rounding.roundLikeC(col("__raw"), 4).as("score"))
  }

  /** Top-`k` documents for the query, ranked (score desc, id asc) —
    * Catalyst plans the cut as TakeOrderedAndProject. */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int,
           k1: Double = 1.2, b: Double = 0.75): DataFrame =
    score(docs, idCol, textCol, terms, k1, b)
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
}

/** Reciprocal-rank fusion (Cormack et al. 2009) — the standard way to merge
  * a lexical (BM25) and a semantic (embedding-ANN) ranking into one hybrid
  * result without score calibration: fused = Σ_lists 1/(k + rank). Rank
  * lists are short (top-k results, not corpora), so every step here is
  * bounded small-data; the heavy lifting happened in the rankers.
  */
object Rrf {

  /** Attach 1-based `rank` to a scored list — (id, rank). `byDesc` is the
    * score column; ties break by id. The single-partition window is fine
    * BECAUSE the input is an already-cut top-k list, never a corpus. */
  def ranked(scored: DataFrame, idCol: String, byDesc: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col(byDesc).desc, col(idCol))
    scored.select(col(idCol).as("id"), row_number().over(w).as("rank"))
  }

  /** Fuse rank lists: top `topN` ids by Σ 1/(k + rank), 6dp-rounded
    * (`roundLikeC` — cross-engine boundary), ties by id. Absent-from-a-list
    * contributes 0. The per-list terms sum in LIST ORDER (a fixed-width
    * conditional-min pivot, not an unordered float SUM), so the fused score
    * is bit-reproducible across engines and partitionings. */
  def fuse(rankings: Seq[DataFrame], idCol: String, k: Int = 60,
           topN: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val tagged = rankings.zipWithIndex.map { case (df, i) =>
      df.select(col("id"), col("rank").cast("long").as("rank"), lit(i).as("src"))
    }.reduce(_ unionByName _)
    val pivotCols = rankings.indices.map(i =>
      min(when(col("src") === i, col("rank"))).as(s"__r$i"))
    val pivoted = tagged.groupBy("id").agg(pivotCols.head, pivotCols.tail: _*)
    val score = rankings.indices.map(i =>
      coalesce(lit(1.0) / (lit(k.toDouble) + col(s"__r$i").cast("double")), lit(0.0)))
      .reduce(_ + _)
    pivoted
      .select(col("id").as(idCol),
        graft.functions.Rounding.roundLikeC(score, 6).as("rrf"))
      .orderBy(col("rrf").desc, col(idCol))
      .limit(topN)
  }
}
