package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Trained document classification — the model-based quality gate next to
  * the heuristic rules ([[graft.functions.Text.qualityScore]] /
  * `gopherFlags`) and the corpus LMs ([[LmScore]]): the fastText-shaped
  * workflow every production curation pipeline runs (train a cheap linear
  * classifier on a labeled slice, score the whole corpus, threshold).
  * (The reference stack's nearest shape is its rule-based GE validation —
  * `scripts/test/great_expectations_checks.py` — this is the learned twin.)
  */
object Classify {

  /** Binary multinomial Naive Bayes with add-one (Laplace) smoothing:
    * trained on the rows matching `trainPred`, scoring EVERY row.
    * `labelCol` is BOOLEAN (true = positive class). Emits one row per input
    * doc: (idCol, label, pred, log_odds, correct) where
    *
    *   log_odds = ln(d⁺/d⁻) + Σ_t ln p(t|+) − Σ_t ln p(t|−),
    *   p(t|c)   = (count(t,c) + 1) / (N_c + V),
    *
    * with d± = training docs per class, N_c = class token total, V = the
    * TRAINING vocabulary size (out-of-vocabulary tokens at scoring time get
    * the smoothed count-0 mass — the standard convention), and
    * pred = log_odds > 0 decided on the UNROUNDED value (the emitted
    * log_odds column is 4dp C-rounded for the audit trail).
    *
    * Engine parity (the q78/q110 discipline): every count is exact integer;
    * each per-token log-probability is one IEEE division + one `ln`; the
    * per-document sums fold IN TOKEN-POSITION ORDER (float addition is not
    * associative), and the final log-odds combines as
    * `(prior + s⁺) − s⁻` left-to-right — an external SQL replay of the
    * same shape lands on the identical double, so even the boolean
    * decision boundary agrees bit-for-bit.
    *
    * Precondition: the training slice must contain BOTH classes (a
    * single-class slice has an undefined prior odds — ln(0) or ln(∞)).
    *
    * Scale shape: the count table is vocabulary-sized (never corpus-sized)
    * and by default broadcasts to the scoring join with the corpus-wide
    * token frame; set `broadcastVocab = false` when the training vocab
    * outgrows the driver (10⁸+ types) to shuffle-join on the token key
    * instead ([[Vocab.encode]]'s toggle). The corpus shuffles once on the
    * doc id for the ordered fold, exactly [[LmScore.unigramNll]]'s plan.
    * Training is one aggregation pass. */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String, trainPred: Column,
                 broadcastVocab: Boolean = true): DataFrame = {
    val (counts, docStats) =
      nbTrainCounts(docs.filter(trainPred), textCol, labelCol)
    naiveBayesScore(docs, idCol, textCol, labelCol, counts, docStats,
      broadcastVocab)
  }

  /** The NB model STATE from one labeled slice: the vocabulary-sized
    * per-token class counts and the 1-row doc priors — all exact integer
    * SUMS, i.e. a monoid: states from disjoint slices merge by addition
    * ([[nbCountsAdvance]]) into exactly the state a joint train would
    * build, which is what makes the classifier §2.9-incremental under any
    * batching. */
  def nbTrainCounts(train: DataFrame, textCol: String,
                    labelCol: String): (DataFrame, DataFrame) = {
    val counts = train
      .select(col(labelCol).as("__y"), explode(Text.tokens(col(textCol))).as("tok"))
      .groupBy("tok").agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("c_pos"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("c_neg"))
    // coalesce(sum, 0): an EMPTY labeled batch must be the monoid identity
    // (d_pos=0, d_neg=0), not a NULL row that would poison the crossJoin
    // addition in [[nbCountsAdvance]] and silently corrupt the prior state
    val docStats = train.agg(
      coalesce(sum(when(col(labelCol), 1L).otherwise(0L)), lit(0L)).as("d_pos"),
      coalesce(sum(when(!col(labelCol), 1L).otherwise(0L)), lit(0L)).as("d_neg"))
    (counts, docStats)
  }

  /** Advance the NB state with one labeled batch: per-token counts merge
    * by a full-outer SUM (one shuffle sized by |vocab state| + |batch
    * vocab|, never the corpus), priors add — a pure monoid, exact under
    * any batching including out-of-order late labels. Returns the merged
    * `(counts, docStats)`. */
  def nbCountsAdvance(stateCounts: DataFrame, stateDocStats: DataFrame,
                      batch: DataFrame, textCol: String,
                      labelCol: String): (DataFrame, DataFrame) = {
    val (bc, bd) = nbTrainCounts(batch, textCol, labelCol)
    val counts = stateCounts.join(
        bc.withColumnRenamed("c_pos", "_bp").withColumnRenamed("c_neg", "_bn"),
        Seq("tok"), "full_outer")
      .select(col("tok"),
        (coalesce(col("c_pos"), lit(0L)) + coalesce(col("_bp"), lit(0L)))
          .as("c_pos"),
        (coalesce(col("c_neg"), lit(0L)) + coalesce(col("_bn"), lit(0L)))
          .as("c_neg"))
    val ds = stateDocStats.select(col("d_pos").as("_sp"), col("d_neg").as("_sn"))
      .crossJoin(bd)
      .select((col("_sp") + col("d_pos")).as("d_pos"),
        (col("_sn") + col("d_neg")).as("d_neg"))
    (counts, ds)
  }

  /** Score `docs` from a given NB state (trained or incrementally
    * advanced) — the [[naiveBayes]] scoring half, exact-replay contract
    * unchanged. */
  def naiveBayesScore(docs: DataFrame, idCol: String, textCol: String,
                      labelCol: String, counts: DataFrame,
                      docStats: DataFrame,
                      broadcastVocab: Boolean = true): DataFrame = {
    // one-row stats: class token totals + vocab size
    val tokStats = counts.agg(
      sum("c_pos").as("n_pos"), sum("c_neg").as("n_neg"),
      count(lit(1)).as("v"))
    val toks = docs.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "tok")))
    // the count table is vocab-sized, which on a labeled WEB-scale slice
    // can reach 10⁸+ token types — past any driver broadcast. The toggle
    // (Vocab.encode's pattern) switches the scoring join to a shuffle on
    // the token key; results are identical (ClassifySpec runs both paths).
    val countsSide = if (broadcastVocab) broadcast(counts) else counts
    val lp = toks
      .join(countsSide, Seq("tok"), "left")
      .crossJoin(broadcast(tokStats))
      .select(col(idCol), col("pos"),
        log((coalesce(col("c_pos"), lit(0L)) + 1L).cast("double") /
          (col("n_pos") + col("v")).cast("double")).as("__lpp"),
        log((coalesce(col("c_neg"), lit(0L)) + 1L).cast("double") /
          (col("n_neg") + col("v")).cast("double")).as("__lpn"))
    val agg = lp.groupBy(col(idCol))
      .agg(sort_array(collect_list(struct(col("pos"), col("__lpp"), col("__lpn")))).as("__a"))
      .select(col(idCol),
        aggregate(transform(col("__a"), s => s.getField("__lpp")),
          lit(0.0), (acc, x) => acc + x).as("__spos"),
        aggregate(transform(col("__a"), s => s.getField("__lpn")),
          lit(0.0), (acc, x) => acc + x).as("__sneg"))
    val odds = log(col("d_pos").cast("double") / col("d_neg").cast("double")) +
      coalesce(col("__spos"), lit(0.0)) - coalesce(col("__sneg"), lit(0.0))
    docs.select(col(idCol), col(labelCol).as("label"))
      .join(agg, Seq(idCol), "left")
      .crossJoin(broadcast(docStats))
      .select(col(idCol), col("label"),
        (odds > 0.0).as("pred"),
        (graft.functions.Rounding.roundLikeC(odds, 4) + lit(0.0)).as("log_odds"))
      .withColumn("correct", col("pred") === col("label"))
  }

  /** Precision/recall/F1 of one or more boolean predictors against a shared
    * boolean label — the audit table a gate comparison publishes (the
    * q102-style report, generalized). `preds` maps method name → predicted
    * column; emits one row per method: (method, tp, fp, fn, tn, precision,
    * recall, f1), ratios 4dp C-rounded with the zero-denominator case
    * defined to 0.0. One aggregation pass per method over the same frame,
    * unioned (method count is tiny — this is a report, not a pipeline). */
  def prReport(df: DataFrame, labelCol: String,
               preds: Seq[(String, Column)]): DataFrame = {
    def ratio(num: Column, den: Column): Column =
      when(den === 0L, lit(0.0)).otherwise(
        graft.functions.Rounding.roundLikeC(
          num.cast("double") / den.cast("double"), 4) + lit(0.0))
    preds.map { case (name, p) =>
      df.agg(
          sum(when(p && col(labelCol), 1L).otherwise(0L)).as("tp"),
          sum(when(p && !col(labelCol), 1L).otherwise(0L)).as("fp"),
          sum(when(!p && col(labelCol), 1L).otherwise(0L)).as("fn"),
          sum(when(!p && !col(labelCol), 1L).otherwise(0L)).as("tn"))
        .select(lit(name).as("method"), col("tp"), col("fp"), col("fn"), col("tn"),
          ratio(col("tp"), col("tp") + col("fp")).as("precision"),
          ratio(col("tp"), col("tp") + col("fn")).as("recall"),
          ratio(lit(2L) * col("tp"),
            lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"))
    }.reduce(_ unionByName _)
  }
}
