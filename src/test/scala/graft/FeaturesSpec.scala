package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Features, Packing}

/** Feature conditioning + dedup-measurement operators (q101/q102) and the
  * new corpus ordering/paragraph ops (q103/q104). */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("standardize: hand-computed z-scores; zero-variance dimension emits 0, never NaN") {
    // dim0: values 1.0, 3.0 -> q = 10000, 30000; mean 20000, std 10000
    //   -> z = -1.0, 1.0
    // dim1: constant 5.0 -> std 0 -> z = 0.0 for both
    val df = Seq(
      (1L, Seq(1.0f, 5.0f)),
      (2L, Seq(3.0f, 5.0f))).toDF("vec_id", "embedding")
    val got = Features.standardize(df, "vec_id", "embedding")
      .orderBy("vec_id", "dim_idx")
      .as[(Long, Int, Double)].collect().toSeq
    assert(got === Seq((1L, 0, -1.0), (1L, 1, 0.0), (2L, 0, 1.0), (2L, 1, 0.0)))
    assert(!got.exists(_._3.isNaN))
  }

  test("standardize output is invariant to input partitioning (exact integer sums)") {
    val e = Tables.embeddings(spark, sf).limit(200)
    val a = Features.standardize(e, "vec_id", "embedding")
      .orderBy("vec_id", "dim_idx").collect().toSeq
    val b = Features.standardize(e.repartition(13), "vec_id", "embedding")
      .orderBy("vec_id", "dim_idx").collect().toSeq
    assert(a === b, "z-scores must not drift with partition layout")
  }

  test("candidateQuality: counts and ratios, orientation-normalized") {
    // truth: (1,2),(3,4),(5,6); candidates: (2,1) [TP, flipped], (3,4) [TP],
    // (7,8) [FP]; missing (5,6) [FN]
    val cands = Seq((2L, 1L), (3L, 4L), (7L, 8L)).toDF("id_a", "id_b")
    val truth = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val r = Features.candidateQuality(cands, truth, "id_a", "id_b").head()
    assert(r.getAs[Long]("n_candidates") === 3L && r.getAs[Long]("n_truth") === 3L)
    assert(r.getAs[Long]("tp") === 2L && r.getAs[Long]("fp") === 1L
      && r.getAs[Long]("fn") === 1L)
    assert(r.getAs[Double]("precision") === 0.666667) // round-like-C 6dp
    assert(r.getAs[Double]("recall") === 0.666667)
  }

  test("deterministicShuffle: a reproducible bijection onto 1..n, layout-independent") {
    val docs = Tables.documents(spark, sf).select("doc_id")
    val a = Packing.deterministicShuffle(docs, col("doc_id"), seed = 7L)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    // positions are exactly 1..n (a permutation, no gaps or dups)
    assert(a.map(_._2).sorted === (1 to a.length).toSeq)
    // same seed + different physical layout -> identical permutation
    val b = Packing.deterministicShuffle(docs.repartition(17), col("doc_id"), seed = 7L)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(a === b, "the permutation must be a pure function of (ids, seed)")
    // a different seed produces a different order (not a fixed identity)
    val c = Packing.deterministicShuffle(docs, col("doc_id"), seed = 8L)
      .as[(Long, Int)].collect().sortBy(_._1).toSeq
    assert(a !== c)
    // neighbors in id space must not stay neighbors in shuffle order
    val pos = a.toMap
    val adjacent = a.map(_._1).sorted.sliding(2).count {
      case Seq(x, y) => math.abs(pos(x) - pos(y)) == 1
      case _ => false
    }
    assert(adjacent < a.length / 10, s"$adjacent adjacent id pairs stayed adjacent")
  }

  test("kmeansAssign separates well-separated blobs and is layout-invariant") {
    // two tight blobs far apart in dim 0: ids 0-9 near -1.0, ids 10-19 near
    // +1.0 (spacing 0.001 keeps quantized values distinct). With k=2 any
    // init draws, after 2 Lloyd sweeps, each blob into one cell.
    val rows = (0 until 20).map { i =>
      val base = if (i < 10) -1.0f else 1.0f
      (i.toLong, Seq(base + i * 0.001f, 0.5f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val got = Features.kmeansAssign(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Long, Int, Long)].collect().toSeq.sortBy(_._1)
    val cells = got.map(_._2)
    assert(cells.take(10).distinct.size === 1, "left blob split across cells")
    assert(cells.drop(10).distinct.size === 1, "right blob split across cells")
    assert(cells.take(10).head !== cells.drop(10).head, "blobs merged")
    // exact-integer distances + exact-long sums: layout cannot change anything
    val again = Features.kmeansAssign(df.repartition(7), "vec_id", "embedding",
        k = 2, iters = 2)
      .as[(Long, Int, Long)].collect().toSeq.sortBy(_._1)
    assert(got === again, "assignment drifted with partition layout")
  }

  test("kmeansAssign: iterations improve (never worsen) the quantization objective") {
    val e = Tables.embeddings(spark, sf).limit(300)
    def objective(iters: Int): Long =
      Features.kmeansAssign(e, "vec_id", "embedding", k = 8, iters = iters)
        .agg(sum(col("dist"))).as[Long].head()
    val o0 = objective(0)
    val o2 = objective(2)
    assert(o2 <= o0, s"Lloyd sweeps should not raise total distortion: $o0 -> $o2")
  }

  test("kmeans mini-batch advance: folded stats ≡ one-pass stats; frozen step ≡ full sweep; empty batch is identity") {
    val rows = (0 until 24).map { i =>
      val base = if (i < 12) -1.0f else 1.0f
      (i.toLong, Seq(base + i * 0.001f, 0.5f))
    }
    val df = rows.toDF("vec_id", "embedding")
    val b1 = df.filter(col("vec_id") % 3 =!= 0)
    val b2 = df.filter(col("vec_id") % 3 === 0)
    val frozen = Features.kmeansCentroids(b1, "vec_id", "embedding", 2, 2)
    def statsSet(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2), r.getLong(3))).toSet
    val st1 = Features.kmeansCellStats(b1, "vec_id", "embedding", frozen)
      .localCheckpoint()
    val st2 = Features.kmeansStatsAdvance(st1, b2, "vec_id", "embedding", frozen)
    // monoid: the two-batch fold equals the one-pass stats over the union
    assert(statsSet(st2) ==
      statsSet(Features.kmeansCellStats(df, "vec_id", "embedding", frozen)))
    // and the frozen-init step off the folded state equals a direct full
    // sweep: assignments under both centroid sets are identical
    val viaState = Features.kmeansCentroidsFrom(st2.localCheckpoint(), frozen)
    val direct = Features.kmeansCentroidsFrom(
      Features.kmeansCellStats(df, "vec_id", "embedding", frozen), frozen)
    assert(viaState == direct)
    // empty batch: the monoid identity
    val stSame = Features.kmeansStatsAdvance(st1, df.filter(lit(false)),
      "vec_id", "embedding", frozen)
    assert(statsSet(stSame) == statsSet(st1))
    // assignment under the advanced centroids still separates the blobs
    val got = Features.kmeansAssignWith(df, "vec_id", "embedding", viaState)
      .as[(Long, Int, Long)].collect().toSeq.sortBy(_._1).map(_._2)
    assert(got.take(12).distinct.size == 1 && got.drop(12).distinct.size == 1 &&
      got.head != got.last)
  }

  test("roundHalfAway matches std::round on halves and on the largest double below 0.5") {
    assert(Features.roundHalfAway(2.5) === 3L)
    assert(Features.roundHalfAway(-2.5) === -3L)
    assert(Features.roundHalfAway(0.49999999999999994) === 0L)
    assert(Features.roundHalfAway(-0.49999999999999994) === 0L)
    assert(Features.roundHalfAway(3.0) === 3L)
  }

  test("clusterQualityReport: separated blobs score near-1 silhouette, cells match kmeansAssign") {
    // two tight 4-dim blobs 10 units apart: within-blob spread ~0.01,
    // cross-blob distance ~10 -> simplified silhouette ~= 1 everywhere
    val vecs = (0 until 10).map(i => (i.toLong, Seq.fill(4)(0.001f * i))) ++
      (10 until 20).map(i => (i.toLong, Seq.fill(4)(10.0f + 0.001f * i)))
    val df = vecs.toDF("vec_id", "embedding")
    val rep = Features.clusterQualityReport(df, "vec_id", "embedding", k = 2, iters = 2)
      .as[(Int, Long, Double, Double)].collect().toSeq
    assert(rep.map(_._2).sum === 20L, s"populations must cover the corpus: $rep")
    assert(rep.forall(_._4 > 0.9), s"separated blobs must score near-1: $rep")
    // per-cell populations agree with the assignment the report audits
    val assignCounts = Features.kmeansAssign(df, "vec_id", "embedding", 2, 2)
      .groupBy("cell").count().as[(Int, Long)].collect().toMap
    assert(rep.map(r => r._1 -> r._2).toMap === assignCounts)
  }

  test("dropDuplicateParagraphs: first (doc, pos) occurrence survives, all other copies drop") {
    val docs = Seq(
      (1L, "alpha one\n\nSHARED PROMO\n\nbeta two"),
      (2L, "SHARED PROMO\n\ngamma three"),       // promo dropped (doc1 pos1 wins)
      (3L, "SHARED PROMO"),                       // everything dropped -> empty
      (4L, "delta four\n\nalpha one")             // 'alpha one' dropped (doc1 pos0 wins)
    ).toDF("doc_id", "text")
    val got = Dedup.dropDuplicateParagraphs(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, "alpha one\n\nSHARED PROMO\n\nbeta two", 3L, 0L),
      (2L, "gamma three", 1L, 1L),
      (3L, "", 0L, 1L),
      (4L, "delta four", 1L, 1L)))
  }

  test("dropDuplicateParagraphs conserves content: every distinct input paragraph survives exactly once corpus-wide") {
    // 3 paragraphs per doc: the full text (unique), a viral paragraph
    // (shared by all), and a 40-char prefix (shared between docs whose
    // texts share a prefix) — nothing may be lost, nothing kept twice
    val docs = Tables.documents(spark, sf).limit(200)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), concat_ws("\n\n",
        col("text"), lit("viral shared paragraph"),
        substring(col("text"), 1, 40)).as("text"))
    val out = Dedup.dropDuplicateParagraphs(docs, "doc_id", "text")
    val keptCounts = out.filter(length(col("text")) > 0)
      .select(explode(split(col("text"), "\n\n")).as("para"))
      .groupBy("para").count()
    assert(keptCounts.filter(col("count") =!= 1L).isEmpty,
      "a paragraph survived more than once")
    val inputDistinct = docs
      .select(explode(split(col("text"), "\n\n")).as("para")).distinct()
    assert(keptCounts.count() === inputDistinct.count(),
      "some distinct paragraph vanished entirely")
  }

  test("dropDuplicateParagraphs plan never joins on the paragraph fingerprint") {
    val docs = Tables.documents(spark, sf).select(col("doc_id"),
      concat(col("text"), lit("\n\nviral shared paragraph")).as("text"))
    val out = Dedup.dropDuplicateParagraphs(docs, "doc_id", "text")
    out.collect()
    val p = out.queryExecution.executedPlan.toString
    assert(!"Join \\[__fp".r.findFirstIn(p).isDefined,
      s"survivor join must key on (doc, pos), not the fingerprint:\n${p.take(2000)}")
  }
}
