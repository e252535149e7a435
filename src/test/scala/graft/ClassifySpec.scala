package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Naive Bayes train/predict arithmetic (q128) + the PR report (q131). */
class ClassifySpec extends SparkSpec {
  import spark.implicits._

  test("naiveBayes: hand-computed smoothed counts, OOV mass, empty doc = prior") {
    // train: doc 1 positive {spam:2, offer:1}, doc 2 negative
    // {hello,world,friend}; V=5, N+=3, N-=3, priors 1:1 (ln odds 0)
    val docs = Seq(
      (1L, "spam spam offer", true),
      (2L, "hello world friend", false),
      (3L, "spam offer", true),          // scored: clearly positive
      (4L, "hello friend", false),       // scored: clearly negative
      (5L, "zzz qqq", true),             // all-OOV: symmetric mass -> odds 0
      (6L, "", false)                    // empty: odds = prior = 0
    ).toDF("doc_id", "text", "y")
    val got = Classify.naiveBayes(docs, "doc_id", "text", "y",
        col("doc_id") <= 2).orderBy("doc_id")
      .as[(Long, Boolean, Boolean, Double, Boolean)].collect().toSeq

    // doc 3: s+ = ln(3/8)+ln(2/8), s- = ln(1/8)+ln(1/8), fold order pos asc
    val spos3 = 0.0 + math.log(3.0 / 8.0) + math.log(2.0 / 8.0)
    val sneg3 = 0.0 + math.log(1.0 / 8.0) + math.log(1.0 / 8.0)
    val odds3 = math.log(1.0) + spos3 - sneg3
    assert(got(2)._3 === true && got(2)._5 === true)
    assert(math.abs(got(2)._4 - odds3) < 1e-4, s"log_odds ${got(2)._4} vs $odds3")

    // doc 4 mirrors negative
    assert(got(3)._3 === false && got(3)._5 === true)

    // doc 5: every token OOV -> identical smoothed mass both sides, prior
    // even -> odds exactly 0 -> pred = (0 > 0) = false
    assert(got(4)._4 === 0.0 && got(4)._3 === false)

    // doc 6: no tokens -> odds = prior = 0 -> pred false, correct (label F)
    assert(got(5)._4 === 0.0 && got(5)._3 === false && got(5)._5 === true)
  }

  test("naiveBayes: broadcastVocab=false shuffle-join path is bit-identical") {
    // the 10⁸-type-vocab escape hatch (round-6 advisory): same arithmetic,
    // only the scoring join's physical strategy changes
    val docs = Seq(
      (1L, "spam spam offer", true), (2L, "hello world friend", false),
      (3L, "spam offer hello", true), (4L, "zzz hello friend", false),
      (5L, "", true)
    ).toDF("doc_id", "text", "y")
    def run(bc: Boolean) = Classify.naiveBayes(docs, "doc_id", "text", "y",
        col("doc_id") <= 2, broadcastVocab = bc).orderBy("doc_id")
      .as[(Long, Boolean, Boolean, Double, Boolean)].collect().toSeq
    assert(run(false) === run(true))
  }

  test("naiveBayes: unbalanced priors decide the empty doc") {
    // 2 positive vs 1 negative training doc -> prior ln(2) > 0
    val docs = Seq(
      (1L, "aa bb", true), (2L, "cc dd", true), (3L, "ee ff", false),
      (4L, "", false)
    ).toDF("doc_id", "text", "y")
    val got = Classify.naiveBayes(docs, "doc_id", "text", "y",
        col("doc_id") <= 3).filter(col("doc_id") === 4L)
      .as[(Long, Boolean, Boolean, Double, Boolean)].head()
    assert(got._3 === true)            // prior alone predicts positive
    assert(math.abs(got._4 - 0.6931) < 1e-9) // roundLikeC(ln 2, 4)
  }

  test("nbCountsAdvance: monoid fold ≡ joint train; scores from advanced state ≡ one-shot") {
    import graft.operators.Classify
    val docs = Seq(
      (1L, "spam spam buy now", true),
      (2L, "hello friendly letter", false),
      (3L, "buy spam cheap", true),
      (4L, "friendly hello again", false),
      (5L, "spam hello", true),
      (6L, "a clean note", false)).toDF("id", "text", "y")
    // adversarial split: classes unbalanced per batch, shared vocab across
    val b1 = docs.filter(col("id") <= 2)
    val b2 = docs.filter(col("id") > 2)
    val (c1, d1) = Classify.nbTrainCounts(b1, "text", "y")
    val (cAdv, dAdv) = Classify.nbCountsAdvance(
      c1.localCheckpoint(), d1.localCheckpoint(), b2, "text", "y")
    val (cJoint, dJoint) = Classify.nbTrainCounts(docs, "text", "y")
    def cnt(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(cnt(cAdv) == cnt(cJoint), "advanced counts must equal joint train")
    assert(dAdv.head() == dJoint.head())
    // and the classifier built from the advanced state is row-identical
    val fromAdv = Classify.naiveBayesScore(docs, "id", "text", "y",
      cAdv.localCheckpoint(), dAdv.localCheckpoint()).collect().toSeq
    val oneShot = Classify.naiveBayes(docs, "id", "text", "y",
      lit(true)).collect().toSeq
    assert(fromAdv.sortBy(_.getLong(0)) == oneShot.sortBy(_.getLong(0)))
    // reversed batch order: same state (monoid commutes)
    val (c1b, d1b) = Classify.nbTrainCounts(b2, "text", "y")
    val (cRev, dRev) = Classify.nbCountsAdvance(
      c1b.localCheckpoint(), d1b.localCheckpoint(), b1, "text", "y")
    assert(cnt(cRev) == cnt(cJoint) && dRev.head() == dJoint.head())
  }

  test("Bm25.statsAdvance: folded stats ≡ recompute; scores from the state ≡ one-shot") {
    import graft.operators.Bm25
    val docs = Seq(
      (1L, "spark table merge table"),
      (2L, "merge only here"),
      (3L, "nothing relevant"),
      (4L, "spark spark table")).toDF("id", "text")
    val terms = Seq("table", "merge", "spark")
    val s1 = Bm25.statsOf(docs.filter(col("id") <= 2), "text", terms)
      .localCheckpoint()
    val adv = Bm25.statsAdvance(s1, docs.filter(col("id") > 2), "text", terms)
    assert(adv.head() == Bm25.statsOf(docs, "text", terms).head(),
      "folded stats must equal the recompute")
    val fromState = Bm25.scoreWith(docs, "id", "text", terms,
        adv.localCheckpoint())
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    val oneShot = Bm25.score(docs, "id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(fromState == oneShot)
  }

  test("empty batch is the monoid IDENTITY for statsAdvance / nbCountsAdvance (no null poison)") {
    import graft.operators.{Bm25, Classify}
    val docs = Seq((1L, "spark table", true), (2L, "merge here", false))
      .toDF("id", "text", "y")
    val none = docs.filter(lit(false))
    // BM25: advancing with an empty ingest batch must leave the state
    // bit-identical — a NULL sum would poison every later scoreWith
    val terms = Seq("table", "merge")
    val s = Bm25.statsOf(docs, "text", terms).localCheckpoint()
    val sAdv = Bm25.statsAdvance(s, none, "text", terms).head()
    assert(sAdv == s.head(), s"empty-batch advance drifted: $sAdv")
    assert(!sAdv.anyNull, "state must stay non-null after an empty batch")
    // NB: same contract for the prior state
    val (c, d) = Classify.nbTrainCounts(docs, "text", "y")
    val (cAdv, dAdv) = Classify.nbCountsAdvance(
      c.localCheckpoint(), d.localCheckpoint(), none, "text", "y")
    assert(dAdv.head() == d.head() && !dAdv.head().anyNull)
    assert(cAdv.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      c.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("prReport: counts, ratios, and zero-denominator definitions") {
    val rows = Seq(
      (true, true, false), (true, true, false), (true, false, false),
      (false, true, false), (false, false, false)
    ).toDF("label", "p_good", "p_never")
    val got = Classify.prReport(rows, "label",
        Seq("good" -> col("p_good"), "never" -> col("p_never")))
      .orderBy("method")
      .as[(String, Long, Long, Long, Long, Double, Double, Double)]
      .collect().toSeq
    // good: tp=2 fp=1 fn=1 tn=1 -> p=2/3, r=2/3, f1=4/6
    assert(got(0) === (("good", 2L, 1L, 1L, 1L, 0.6667, 0.6667, 0.6667)))
    // never predicts positive: tp=0 fp=0 -> precision defined 0.0; fn=3
    assert(got(1) === (("never", 0L, 0L, 3L, 2L, 0.0, 0.0, 0.0)))
  }
}
