package graft

import org.apache.spark.sql.functions._
import graft.analytics.SimilarityQueries
import graft.operators.Similarity

/** Similarity search: exact cosine math, brute-force ranking, LSH recall. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine of identical vectors is 1, orthogonal is 0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 2.0f)),
      (Seq(1.0f, 1.0f), Seq(-1.0f, -1.0f))
    ).toDF("a", "b").select(Similarity.cosine(col("a"), col("b")).as("c"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12)
    assert(math.abs(got(1)) < 1e-12)
    assert(math.abs(got(2) + 1.0) < 1e-12)
  }

  test("randomProject: 16 components per vector, JL distortion bounded on the fixture") {
    val emb = Tables.embeddings(spark, sf)
    val proj = Similarity.randomProject(emb, "vec_id", "embedding", dim = 64, outDim = 16)
    val byId = proj.as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3)
      }
    assert(byId.values.forall(_.length === 16))
    val orig = emb.select(col("vec_id"), col("embedding").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap.map { case (k, v) => k -> v.toArray }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = a.indices.map(i => a(i) * b(i)).sum
      d / math.sqrt(a.map(x => x * x).sum * b.map(x => x * x).sum)
    }
    // pairwise angle preservation vs vec 0: 16 Rademacher dims give
    // ~1/sqrt(16) typical distortion (individual pairs can deviate well
    // past it — that is JL working as specified, not a bug); the fixture is
    // deterministic so these bounds are stable, not statistical
    val ids = orig.keys.toSeq.sorted.take(101)
    def devs(proj: Map[Long, Array[Double]]) = ids.tail.map { i =>
      math.abs(cos(proj(ids.head), proj(i)) - cos(orig(ids.head), orig(i)))
    }
    val d16 = devs(byId.map { case (k, v) => k -> v.toArray })
    assert(d16.sum / d16.size < 0.2, s"mean distortion ${d16.sum / d16.size}")
    // and the JL knob works: 4x the output dims tightens the distortion
    val by64 = Similarity.randomProject(emb, "vec_id", "embedding", dim = 64, outDim = 64)
      .as[(Long, Int, Double)].collect().groupBy(_._1)
      .map { case (id, rows) => id -> rows.sortBy(_._2).map(_._3).toArray }
    val d64 = devs(by64)
    assert(d64.sum / d64.size < d16.sum / d16.size,
      s"64-dim mean ${d64.sum / d64.size} not below 16-dim mean ${d16.sum / d16.size}")
  }

  test("native cosine expression is bit-identical to the composed form") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(q).select(
      Similarity.cosine(col("qv"), col("embedding")).as("native"),
      Similarity.cosineComposed(col("qv"), col("embedding")).as("composed"))
    assert(both.filter(!(col("native") <=> col("composed"))).isEmpty)
  }

  test("native dot product is bit-identical to the composed form; null on length mismatch") {
    val emb = Tables.embeddings(spark, sf)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(q).select(
      Similarity.dotNative(col("qv"), col("embedding")).as("native"),
      Similarity.dot(col("qv"), col("embedding")).as("composed"))
    assert(both.filter(!(col("native") <=> col("composed"))).isEmpty)

    import spark.implicits._
    val mismatch = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
      .select(Similarity.dotNative(col("a"), col("b")).as("d"))
    assert(mismatch.head().isNullAt(0))
    val empty = Seq((Seq.empty[Float], Seq.empty[Float])).toDF("a", "b")
      .select(Similarity.dotNative(col("a"), col("b")).as("d"))
    assert(empty.head().getDouble(0) === 0.0)
  }

  test("cosine_similarity registers as a SQL function") {
    org.apache.spark.sql.graft.CosineSimilarity.register(spark)
    val got = spark.sql(
      "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)), " +
        "array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)))").as[Double].head()
    assert(math.abs(got - 1.0) < 1e-12)
  }

  test("CosineFusionRule rewrites the composed form to the native expression") {
    org.apache.spark.sql.graft.CosineFusionRule.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(50)
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val composed = emb.crossJoin(q)
      .select(col("vec_id"), Similarity.cosineComposed(col("qv"), col("embedding")).as("c"))
    // the optimizer must collapse the when/aggregate/zip_with pattern into
    // ONE native cosine_similarity call
    val optimized = composed.queryExecution.optimizedPlan.toString
    assert(optimized.contains("cosine_similarity"), s"rule did not fire:\n$optimized")
    assert(!optimized.contains("zip_with"), s"composed form survived:\n$optimized")
    // and semantics are unchanged (bit-equal to the unfused evaluation)
    val fused = composed.collect().map(r => r.getLong(0) -> r.getAs[Any](1)).toMap
    val native = emb.crossJoin(q)
      .select(col("vec_id"), Similarity.cosine(col("qv"), col("embedding")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getAs[Any](1)).toMap
    assert(fused === native)
  }

  test("CosineFusionRule does NOT fuse lookalike lambdas (x*x, v+v) — identity matters") {
    org.apache.spark.sql.graft.CosineFusionRule.register(spark)
    val df = Seq((Seq(3.0, 4.0), Seq(1.0, 0.0))).toDF("a", "b")
    // numerator lambda is (x, y) -> x * x — a squared-norm, NOT a dot; the
    // full expression is otherwise cosine-shaped and must stay unfused
    val sq = "aggregate(zip_with(a, b, (x, y) -> x * x), 0.0D, (s, v) -> s + v)"
    val norm = "sqrt(aggregate(zip_with(a, a, (x, y) -> x * y), 0.0D, (s, v) -> s + v)) * " +
      "sqrt(aggregate(zip_with(b, b, (x, y) -> x * y), 0.0D, (s, v) -> s + v))"
    val out = df.select(expr(s"CASE WHEN $norm > 0.0D THEN $sq / ($norm) END").as("c"))
    assert(!out.queryExecution.optimizedPlan.toString.contains("cosine_similarity"),
      "x*x lambda must not fuse into a cosine")
    // value check: sum(a_i^2)/(|a||b|) = 25/5 = 5.0, NOT cosine 0.6
    assert(math.abs(out.as[Double].head() - 5.0) < 1e-12)
  }

  test("bruteForceTopK returns k rows per query, self excluded, descending") {
    val out = Similarity.bruteForceTopK(
      Tables.embeddings(spark, sf), SimilarityQueries.queryVectors(spark, sf),
      "vec_id", "embedding", 10).collect()
    val byQuery = out.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.nonEmpty)
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length === 10)
      assert(!rows.exists(_.getAs[Long]("vec_id") == qid))
      val scores = rows.map(_.getAs[Double]("score")).toSeq
      assert(scores === scores.sorted.reverse)
    }
  }

  test("IVF recall@10 vs brute force is usable; k rows max per query") {
    val emb = Tables.embeddings(spark, sf)
    val qs = SimilarityQueries.queryVectors(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@10 = $recall")
    assert(recall >= 0.9, s"recall $recall below floor")
    assert(ivf.size <= exact.size)
  }

  test("IVF-PQ composition recall@10 vs brute force; scan restricted to probed cells") {
    val emb = Tables.embeddings(spark, sf)
    val qs = SimilarityQueries.queryVectors(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivfpq = Similarity.ivfPqTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & ivfpq).size.toDouble / exact.size
    info(s"IVF-PQ recall@10 = $recall")
    assert(recall >= 0.9, s"recall $recall below floor")
    assert(ivfpq.size <= exact.size)
    // scan containment: IVF-PQ can never return a hit outside the probed
    // IVF cells — an unbounded-k ivfTopK enumerates exactly the cell-
    // sharing pairs under the same deterministic quantizer, and every
    // IVF-PQ hit must be among them
    val allCellPairs = Similarity.ivfTopK(emb, qs, "vec_id", "embedding",
        k = Int.MaxValue)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivfpq.subsetOf(allCellPairs),
      "IVF-PQ returned a pair outside the probed cells")
  }

  test("IvfIndex: frozen-quantizer append == one-shot assignment over the union") {
    val emb = Tables.embeddings(spark, sf)
    val seen = emb.filter(col("vec_id") < 300)
    val batch = emb.filter(col("vec_id") >= 300)
    val grown = Similarity.buildIvfIndex(seen, "vec_id", "embedding")
      .append(batch, "vec_id")
    // every vector assigned exactly once
    val cells = grown.cells.select("vec_id", "cell").as[(Long, Int)].collect()
    assert(cells.length.toLong === emb.count())
    assert(cells.map(_._1).distinct.length === cells.length)
    // append with the frozen quantizer == one-shot assignment of the union
    // under the same (seen-trained) centroids
    val oneShot = Similarity.assignCells(
        emb.withColumnRenamed("vec_id", "vec_id"), grown.cents, "vec_id",
        "embedding", keep = 1)
      .select("vec_id", "cell").as[(Long, Int)].collect()
    assert(cells.sortBy(_._1).toSeq === oneShot.sortBy(_._1).toSeq)
    // serving: at most k rows per query, no self-matches
    val got = grown.topK(SimilarityQueries.queryVectors(spark, sf), "vec_id", 10)
    val byQuery = got.collect().groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (qid, rows) =>
      assert(rows.length <= 10)
      assert(!rows.exists(_.getAs[Long]("vec_id") == qid))
    }
  }

  test("IVF retrain loop: drift flags retrain, rebuild restores balance without losing recall") {
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val seen = emb.filter(col("vec_id") < 300)
    // the q166 drift mode: first 48 dims constant (the frozen quantizer
    // can't separate them), tail dims diverse (a retrained one can)
    val drift = emb.filter(col("vec_id") >= 300).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"),
        (x, i) => when(i < 48, lit(3.0d)).otherwise(x)).as("embedding"))
    val corpus = seen.unionByName(drift).localCheckpoint()
    val grown = Similarity.buildIvfIndex(seen, "vec_id", "embedding")
      .append(drift, "vec_id")
    val rebuilt = Similarity.buildIvfIndex(corpus, "vec_id", "embedding")
    // the report flags the drifted index and clears the rebuilt one
    def report(idx: Similarity.IvfIndex): (Double, Boolean, Long) = {
      val r = Similarity.ivfBalanceReport(idx)
      val (f, flag) = r.select("imbalance_factor", "needs_retrain")
        .as[(Double, Boolean)].head()
      (f, flag, r.agg(max("n_vecs")).as[Long].head())
    }
    val (f1, flag1, max1) = report(grown)
    val (f2, flag2, max2) = report(rebuilt)
    info(s"imbalance drifted=$f1 (max cell $max1) rebuilt=$f2 (max cell $max2)")
    assert(flag1, s"drifted index must flag retrain (factor $f1)")
    assert(!flag2, s"rebuilt index must clear the flag (factor $f2)")
    assert(f2 < f1, "rebuild must reduce the imbalance factor")
    // worst-case probe cost = the largest cell a query can pull; the
    // funnel cell is what makes the drifted index degrade toward a scan
    assert(max2 < max1, s"rebuild must shrink the funnel cell ($max1 -> $max2)")
    // probe recall vs brute force over the SAME drifted corpus must not
    // degrade: the rebuild is only a win if serving quality holds
    val qs = corpus.filter(col("vec_id") % 50 === 0)
    val exact = Similarity.bruteForceTopK(corpus, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    def recall(idx: Similarity.IvfIndex): Double = {
      val got = idx.topK(qs, "vec_id", 10)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val rBefore = recall(grown); val rAfter = recall(rebuilt)
    info(s"probe recall@10: drifted=$rBefore rebuilt=$rAfter")
    assert(rAfter >= 0.9, s"rebuilt recall $rAfter below floor")
    assert(rAfter >= rBefore - 0.05,
      s"rebuild must not trade recall away ($rBefore -> $rAfter)")
  }

  test("LSH recall@10 vs brute force is usable and candidates stay sub-quadratic") {
    val emb = Tables.embeddings(spark, sf)
    val qs = SimilarityQueries.queryVectors(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, qs, "vec_id", "embedding", 10, 64)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    info(s"LSH recall@10 = $recall")
    assert(recall >= 0.9, s"recall $recall below floor")
    // approx returns at most k per query — never the full cross product
    assert(approx.size <= exact.size)
  }

  test("Lloyd refinement tightens IVF cells and keeps recall usable") {
    val emb = Tables.embeddings(spark, sf)
    val qs = SimilarityQueries.queryVectors(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet

    def recall(iters: Int): Double = {
      val got = Similarity.ivfTopK(emb, qs, "vec_id", "embedding", 10,
          refineIters = iters)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val r0 = recall(0); val r2 = recall(2)
    info(s"IVF recall@10: sampled=$r0 refined(2)=$r2")
    assert(r2 >= 0.9, s"refined recall $r2 below floor")

    // the k-means objective (mean best-centroid cosine) must not degrade
    val init = Similarity.sampledCentroids(emb, "vec_id", "embedding", 16)
    val refined = Similarity.refineCentroids(emb, "vec_id", "embedding", init, 2)
    def objective(cents: Seq[(Int, Seq[Double])]): Double = {
      val cdf = cents.toDF("cell", "cvec")
      emb.crossJoin(broadcast(cdf))
        .select(Similarity.cosine(col("embedding"), col("cvec")).as("s"),
          col("vec_id"))
        .groupBy("vec_id").agg(max(col("s")).as("best"))
        .agg(avg(col("best"))).as[Double].head()
    }
    val oInit = objective(init); val oRef = objective(refined)
    info(s"k-means objective: init=$oInit refined=$oRef")
    assert(oRef >= oInit - 1e-9, "Lloyd iterations degraded the objective")
  }

  test("PQ (ADC) recall@10 vs brute force is usable; codes compress 32x") {
    val emb = Tables.embeddings(spark, sf)
    val qs = SimilarityQueries.queryVectors(spark, sf)
    val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val pq = Similarity.pqTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val recall = (exact & pq).size.toDouble / exact.size
    info(s"PQ recall@10 = $recall")
    assert(recall >= 0.9, s"recall $recall below floor")
    assert(pq.size <= exact.size)
    // determinism: same seed, same answer
    val again = Similarity.pqTopK(emb, qs, "vec_id", "embedding", 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(again === pq)
  }

  test("cosine near-dup: exact verifier finds every rescaled clone pair, nothing else") {
    val corpus = SimilarityQueries.embeddingsWithClones(spark, sf)
    val n = Tables.embeddings(spark, sf).count()
    val pairs = Similarity.cosineDupPairsExact(corpus, "vec_id", "embedding",
      SimilarityQueries.DupThreshold).collect()
    assert(pairs.length === n.toInt)
    pairs.foreach { r =>
      assert(r.getAs[Long]("id_b") === r.getAs[Long]("id_a") + 1000000L)
      assert(r.getAs[Double]("score") === 1.0)
    }
  }

  test("quadratic verifiers refuse unbounded inputs (scale guard trips)") {
    val emb = Tables.embeddings(spark, sf)
    val qs = SimilarityQueries.queryVectors(spark, sf)
    val eDup = intercept[IllegalArgumentException] {
      Similarity.cosineDupPairsExact(emb, "vec_id", "embedding", 0.9, maxRows = 10)
    }
    assert(eDup.getMessage.contains("cosineDupPairs"))
    val eBrute = intercept[IllegalArgumentException] {
      Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 5, maxRows = 1)
    }
    assert(eBrute.getMessage.contains("lshTopK"))
    val ePq = intercept[IllegalArgumentException] {
      Similarity.pqTopK(emb, qs, "vec_id", "embedding", 5, maxQueries = 1)
    }
    assert(ePq.getMessage.contains("maxQueries"))
  }

  test("pqTopK normalize recovers a small-norm cosine neighbor raw IP buries") {
    import spark.implicits._
    val dim = 8
    def pad(v: Seq[Double]) = v ++ Seq.fill(dim - v.size)(0.0)
    // vec 0: tiny norm, nearly parallel to the query (cos ~ 0.99)
    // vecs 1..30: huge norm, cos ~ 0.70 — they dominate every raw
    // inner-product ranking, so with rerankFactor=1 the true neighbor
    // never reaches the exact re-rank unless vectors are normalized
    val corpus = ((0L, pad(Seq(0.0099, 0.0014))) +:
      (1L to 30L).map(i => (i, pad(Seq(70.0, 71.4))))).toDF("vec_id", "embedding")
    val q = Seq((100L, pad(Seq(1.0, 0.0)))).toDF("vec_id", "embedding")
    def top1(normalize: Boolean) =
      Similarity.pqTopK(corpus, q, "vec_id", "embedding", k = 1, m = 4,
          codebookSize = 16, rerankFactor = 1, normalize = normalize)
        .select("vec_id").as[Long].head()
    assert(top1(normalize = false) !== 0L, "raw IP should bury the tiny-norm vector")
    assert(top1(normalize = true) === 0L, "normalized ADC must rank by cosine")
  }

  test("semDedup drops exactly the clones, labels every row, one cell each") {
    val corpus = SimilarityQueries.embeddingsWithClones(spark, sf)
    val n = Tables.embeddings(spark, sf).count()
    val out = Similarity.semDedup(corpus, "vec_id", "embedding",
      SimilarityQueries.DupThreshold).collect()
    assert(out.length === 2 * n.toInt) // every corpus row labeled exactly once
    val (kept, droppedRows) = out.partition(_.getAs[Boolean]("kept"))
    // each clone (vec_id+1000000, cosine 1.0 with its original, same argmax
    // cell) is dropped by its lower-id original; naturals (≤0.61) survive
    assert(droppedRows.map(_.getAs[Long]("vec_id")).sorted.toSeq ===
      (0L until n).map(_ + 1000000L))
    assert(kept.map(_.getAs[Long]("vec_id")).sorted.toSeq === (0L until n))
  }

  test("semDedup at threshold above 1.0 keeps everything") {
    val corpus = SimilarityQueries.embeddingsWithClones(spark, sf)
    val out = Similarity.semDedup(corpus, "vec_id", "embedding", 1.5)
    assert(out.filter(!col("kept")).isEmpty)
  }

  test("cosine near-dup: LSH scale path reproduces the exact verifier on clones") {
    val corpus = SimilarityQueries.embeddingsWithClones(spark, sf)
    val exact = Similarity.cosineDupPairsExact(corpus, "vec_id", "embedding",
        SimilarityQueries.DupThreshold)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosineDupPairs(corpus, "vec_id", "embedding",
        SimilarityQueries.DupThreshold, SimilarityQueries.Dim)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // positively scaled clones share every hyperplane sign bit → recall 1.0;
    // the exact re-check removes every false bucket collision → precision 1.0
    assert(lsh === exact)
  }

  test("q145 incremental cosine dedup: probe == exact cross-side restriction; advance chains") {
    val t = SimilarityQueries.DupThreshold
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val seen = e.filter(col("vec_id") < 300)
    val clones = seen.filter(col("vec_id") % 7 === 0).select(
      (col("vec_id") + 1000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.1d)).as("embedding"))
    val batch = e.filter(col("vec_id") >= 300).unionByName(clones)
    val idx = Similarity.buildCosineLshIndex(seen, "vec_id", "embedding",
      SimilarityQueries.Dim)
    val got = idx.probe(batch, "vec_id", "embedding", t)
      .select("batch_id", "seen_id").as[(Long, Long)].collect().toSet
    // reference: exact pairwise over the union, restricted to cross-side
    // pairs (seen ids < 300 always sort first in the upper triangle)
    val exactCross = Similarity.cosineDupPairsExact(
        seen.unionByName(batch), "vec_id", "embedding", t)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => a < 300 && b >= 300 }
      .map { case (a, b) => (b, a) }.toSet
    assert(got === exactCross)
    // every planted rescale clone is caught against its seen original
    val planted = seen.filter(col("vec_id") % 7 === 0)
      .select("vec_id").as[Long].collect()
      .map(id => (id + 1000000L, id)).toSet
    assert(planted.subsetOf(got))
    // a clone-free batch raises nothing above the cut (naturals ≈ 0.61 max)
    assert(idx.probe(e.filter(col("vec_id") >= 300), "vec_id", "embedding", t)
      .isEmpty)
    // advance on the batch: a second batch cloning a BATCH vector is caught
    // only via the advanced index — the stale index stays silent
    val b2 = e.filter(col("vec_id") === 310).select(
      (col("vec_id") + 2000000L).as("vec_id"),
      transform(col("embedding"), x => x * lit(1.1d)).as("embedding"))
    assert(idx.probe(b2, "vec_id", "embedding", t).isEmpty)
    val hits2 = idx.advance(batch, "vec_id", "embedding")
      .probe(b2, "vec_id", "embedding", t)
      .select("batch_id", "seen_id").as[(Long, Long)].collect().toSet
    assert(hits2.contains((2000310L, 310L)))
  }
  test("cosine LSH band auto-sizing: bits derived from index cardinality, floor/cap pinned") {
    import graft.operators.Similarity
    // the measured rule as code: 2^bits >= n, floor 8, cap 24
    assert(Similarity.autoBitsPerBand(100L) === 8, "small corpus floors at 8")
    assert(Similarity.autoBitsPerBand(256L) === 8, "2^8 boundary stays 8")
    assert(Similarity.autoBitsPerBand(257L) === 9)
    assert(Similarity.autoBitsPerBand(5000L) === 13) // 2^12=4096 < 5000 <= 2^13
    assert(Similarity.autoBitsPerBand(125000L) === 17) // the 25x INDEXSCALE regime
    assert(Similarity.autoBitsPerBand(1L << 30) === 24, "caps at the packing bound")
    // build wires the auto bits into the index geometry (two sizes)
    val e = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val small = Similarity.buildCosineLshIndex(
      e.filter(col("vec_id") < 100), "vec_id", "embedding", SimilarityQueries.Dim)
    assert(small.bitsPerBand === 8)
    val bigger = Similarity.buildCosineLshIndex(
      e.limit(300), "vec_id", "embedding", SimilarityQueries.Dim)
    assert(bigger.bitsPerBand === 9, "300 vectors need 9-bit buckets under the rule")
    // an explicit pin still wins (fixture geometry must not drift with SF)
    val pinned = Similarity.buildCosineLshIndex(
      e.limit(300), "vec_id", "embedding", SimilarityQueries.Dim, bitsPerBand = 16)
    assert(pinned.bitsPerBand === 16)
  }

  test("ivfBalanceReport: exact FAISS imbalance, empty cells visible, retrain verdict at the boundary") {
    import graft.operators.Similarity
    // hand-built index state: 4 cells, occupancy 6/2/0/0 over 8 vectors
    // imbalance = nlist * sum(c^2) / n^2 = 4 * (36+4) / 64 = 2.5 -> retrain
    val cents = (0 until 4).map(i => (i, Seq.fill(4)(i.toDouble)))
    val cells = ((1 to 6).map(v => (v.toLong, 0)) ++ Seq((7L, 1), (8L, 1)))
      .toDF("vec_id", "cell")
      .withColumn("cv", typedLit(Seq(0.0, 0.0, 0.0, 0.0)))
    val idx = Similarity.IvfIndex(cells, cents, "embedding")
    val got = Similarity.ivfBalanceReport(idx).orderBy("cell").collect()
    assert(got.length === 4)
    assert(got.map(_.getAs[Long]("n_vecs")).toSeq === Seq(6L, 2L, 0L, 0L))
    assert(got.head.getAs[Long]("n_empty_cells") === 2L)
    assert(got.head.getAs[Double]("imbalance_factor") === 2.5)
    assert(got.forall(_.getAs[Boolean]("needs_retrain")))
    // perfectly balanced: 2/2/2/2 -> factor exactly 1.0, no retrain
    val bal = (1 to 8).map(v => (v.toLong, (v - 1) % 4)).toDF("vec_id", "cell")
      .withColumn("cv", typedLit(Seq(0.0, 0.0, 0.0, 0.0)))
    val gb = Similarity.ivfBalanceReport(Similarity.IvfIndex(bal, cents, "embedding"))
      .collect()
    assert(gb.forall(r => r.getAs[Double]("imbalance_factor") === 1.0 &&
      !r.getAs[Boolean]("needs_retrain")))
    // the verdict flips ON the rounded boundary: retrainAt exactly 2.5 -> not >
    val atBoundary = Similarity.ivfBalanceReport(idx, retrainAt = 2.5).collect()
    assert(atBoundary.forall(!_.getAs[Boolean]("needs_retrain")))
  }
}
