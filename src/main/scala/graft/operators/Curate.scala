package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** The corpus-curation funnel — the canonical cleaning DAG a pretraining
  * pipeline runs, composed from this library's operators in the order a
  * real run uses (cheapest filter first, population-dependent cuts on the
  * population that survives to them):
  *
  *   1. exact dedup       — identical texts collapse to the lowest id
  *                          ([[Dedup.exact]]; one fingerprint shuffle)
  *   2. span near-dup     — documents whose distinct 20-token spans mostly
  *                          exist elsewhere are dropped
  *                          ([[Dedup.dupSpanFraction]], `>= flagAt` cut)
  *   3. quality cut       — bottom `qualityCut` fraction PER LANGUAGE by
  *                          [[Text.qualityScore]] (percent_rank — the cut
  *                          adapts to each language's distribution, and to
  *                          the population that survived dedup)
  *   4. decontamination   — documents sharing any distinct word 3-gram
  *                          with the held-out eval slice are dropped, as
  *                          are the eval documents themselves
  *                          ([[Dedup.decontaminationPairs]])
  *
  * Returns the funnel: one (stage, n_docs) row per stage including the
  * input. Stages CHAIN — each filter sees only prior survivors, so the
  * percentile cut and span doc-frequencies are computed on the right
  * population (tag-in-one-pass shortcuts would break exactly that).
  * The single returned plan recomputes shared prefixes per stage count;
  * callers running the funnel over a large corpus persist the final
  * survivor stage and read counts from [[survivors]] instead.
  */
object Curate {

  final case class Funnel(stages: Seq[(String, DataFrame)],
                          knownCounts: Map[String, Long] = Map.empty) {
    /** The cleaned corpus: survivors of the last stage. */
    def survivors: DataFrame = stages.last._2
    /** (stage, n_docs) funnel counts as one plan. Stages whose count was
      * already tallied during materialization ([[funnelPersisted]]) emit a
      * literal — their count job already ran; everything else aggregates. */
    def counts: DataFrame =
      stages.map { case (name, df) =>
        knownCounts.get(name) match {
          case Some(n) => df.sparkSession.range(1)
            .select(lit(name).as("stage"), lit(n).as("n_docs"))
          case None => df.agg(lit(name).as("stage"), count(lit(1)).as("n_docs"))
        }
      }.reduce(_ unionByName _)
  }

  def funnel(docs: DataFrame, idCol: String, textCol: String, langCol: String,
             stopwords: Seq[String], evalPred: Column,
             spanTokens: Int = 20, dupFlagAt: Double = 0.5,
             qualityCut: Double = 0.1): Funnel =
    build(docs, idCol, textCol, langCol, stopwords, evalPred,
      spanTokens, dupFlagAt, qualityCut, (_, df) => df)

  /** [[funnel]] with every COMPUTED stage materialized via eager
    * `localCheckpoint`: `counts` and each downstream stage read the
    * materialized frame instead of re-deriving the shared prefix — the
    * lazy form pays roughly the final stage's cost once per stage row
    * (~4x at five stages; the multiple is a real cluster bill at scale).
    * The stage COUNT rides the materialization job itself (an accumulator
    * in the same mapPartitions pass the checkpoint runs — the dupClusters
    * idiom), so `counts` costs zero extra actions for s1..s4.
    * s0 stays lazy on purpose: it is the raw input projection, and
    * checkpointing it would rewrite the whole corpus to executor storage
    * when its count is a column-pruned scan away. Results are
    * bit-identical to [[funnel]] — the benched/verified q90 entry runs
    * this form. */
  def funnelPersisted(docs: DataFrame, idCol: String, textCol: String, langCol: String,
                      stopwords: Seq[String], evalPred: Column,
                      spanTokens: Int = 20, dupFlagAt: Double = 0.5,
                      qualityCut: Double = 0.1): Funnel = {
    val tallied = scala.collection.mutable.Map.empty[String, Long]
    val f = build(docs, idCol, textCol, langCol, stopwords, evalPred,
      spanTokens, dupFlagAt, qualityCut, (name, df) => {
        val acc = df.sparkSession.sparkContext.longAccumulator(s"curate_$name")
        val counted = df.mapPartitions { rows =>
          rows.map { r => acc.add(1L); r }
        }(org.apache.spark.sql.Encoders.row(df.schema))
          .localCheckpoint() // eager: the accumulator is final right after
        tallied(name) = acc.value
        counted
      })
    f.copy(knownCounts = tallied.toMap)
  }

  /** The funnel DAG with a `materialize` hook applied to each computed
    * stage (s1..s4) as it is built, so persisted and lazy forms share one
    * definition. */
  private def build(docs: DataFrame, idCol: String, textCol: String, langCol: String,
                    stopwords: Seq[String], evalPred: Column,
                    spanTokens: Int, dupFlagAt: Double, qualityCut: Double,
                    materialize: (String, DataFrame) => DataFrame): Funnel = {
    val s0 = docs.select(col(idCol), col(textCol), col(langCol))

    val s1 = materialize("s1_exact_dedup", Dedup.exact(s0, textCol, Seq(col(idCol)))
      .select(col(idCol), col(textCol), col(langCol)))

    val spanScores = Dedup.dupSpanFraction(s1, idCol, textCol, spanTokens, dupFlagAt)
    val s2 = materialize("s2_span_dedup",
      s1.join(spanScores.filter(!col("is_dup")).select(col(idCol)), idCol))

    val w = Window.partitionBy(langCol).orderBy(col("__q"), col(idCol))
    val s3 = materialize("s3_quality",
      s2.withColumn("__q", Text.qualityScore(col(textCol), stopwords))
        .withColumn("__pr", percent_rank().over(w))
        .filter(col("__pr") >= qualityCut)
        .select(col(idCol), col(textCol), col(langCol)))

    val evalDocs = docs.filter(evalPred).select(col(idCol), col(textCol))
    val contaminated = Dedup.decontaminationPairs(
        s3.filter(!evalPred), evalDocs, idCol, textCol)
      .select(col("train_id").as(idCol)).distinct()
    val s4 = materialize("s4_decontaminated",
      s3.filter(!evalPred).join(contaminated, Seq(idCol), "left_anti"))

    Funnel(Seq(
      "s0_input" -> s0, "s1_exact_dedup" -> s1, "s2_span_dedup" -> s2,
      "s3_quality" -> s3, "s4_decontaminated" -> s4))
  }

  /** Corpus snapshot diff — the crawl-over-crawl versioning report: per
    * document id, `added` / `removed` / `changed` (same id, different
    * normalized-text fingerprint) / `unchanged`, plus the token delta.
    * Every corpus refresh wants this before shipping: an unexpected mass
    * `removed` or a token-count collapse is the canary for an upstream
    * extraction regression.
    *
    * Scale: both snapshots reduce to (id, fingerprint, token_count)
    * projections BEFORE the join — the full outer join shuffles those
    * 3-column frames on the id, never the document text. */
  def corpusDiff(old: DataFrame, cur: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    def shrink(df: DataFrame, fp: String, tc: String): DataFrame =
      df.select(col(idCol), Text.fingerprint(col(textCol)).as(fp),
        Text.tokenCount(col(textCol)).cast("long").as(tc))
    shrink(old, "__ofp", "__ot")
      .join(shrink(cur, "__nfp", "__nt"), Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__ofp").isNull, "added")
          .when(col("__nfp").isNull, "removed")
          .when(col("__ofp") =!= col("__nfp"), "changed")
          .otherwise("unchanged").as("status"),
        (coalesce(col("__nt"), lit(0L)) - coalesce(col("__ot"), lit(0L)))
          .as("token_delta"))
  }
}
