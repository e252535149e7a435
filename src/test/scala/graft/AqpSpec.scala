package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.operators.Aqp

/** AQP claims the q181 oracle cannot see: the Column mixer equals the
  * scalar one bit-for-bit (the portability contract), sampling is
  * deterministic and near its nominal rate, and the HT estimator's CI
  * behaves like one on the real fixture.
  */
class AqpSpec extends SparkSpec {

  test("mixpCol equals the scalar mixp bit-for-bit") {
    import spark.implicits._
    val xs = (0L until 1000L) ++ Seq(0x7FFFFFFFL, 1L << 40, 123456789012L)
    val got = xs.toDF("x")
      .select(col("x"), PortableHash.mixpCol(col("x")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    xs.foreach { x =>
      assert(got(x) == PortableHash.mixp(x), s"mixp mismatch at $x")
    }
  }

  test("hashSample is deterministic and near its nominal rate") {
    val docs = Tables.documents(spark, sf)
    val total = docs.count().toDouble
    val s1 = Aqp.hashSample(docs, col("doc_id"), 1, 20)
    val s2 = Aqp.hashSample(docs, col("doc_id"), 1, 20)
    val ids1 = s1.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = s2.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 == ids2, "same key, same sample — always")
    val frac = ids1.size / total
    assert(frac > 0.02 && frac < 0.09,
      s"5% nominal rate, got $frac — the mixer would be biased")
  }

  test("synopses are closed under union: incremental maintenance is free") {
    // sample(base) ∪ sample(batch) == sample(base ∪ batch) — membership
    // depends only on the key's hash, so a persisted synopsis advances by
    // sampling ONLY the arriving batch and appending; no rebuild, ever.
    val docs = Tables.documents(spark, sf)
    val base = docs.filter(col("doc_id") % 10 =!= 0)
    val batch = docs.filter(col("doc_id") % 10 === 0)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      Aqp.hashSample(df, col("doc_id"), 1, 20)
        .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert((ids(base) ++ ids(batch)).sorted == ids(docs))
  }

  test("GEE distinct estimate: repetition regimes behave, zero extra state") {
    import spark.implicits._
    // heavy repetition: every value appears ~100x — the sample sees nearly
    // every value 2+ times, so the estimate sits near the true distinct
    val rep = (0L until 10000L).map(i => ("g", i, i % 100)).toDF("g", "k", "v")
    val r1 = Aqp.estimateDistinct(rep, Seq("g"), col("v"), col("k"), 1, 20).head()
    val e1 = r1.getAs[Double]("est_distinct")
    assert(math.abs(e1 - 100.0) / 100.0 < 0.25, s"repetition regime: $e1 vs 100")
    // all-unique: everything sampled is a singleton, f1 == d_sampled and
    // the estimate is the scaled-up sample count
    val uniq = (0L until 10000L).map(i => ("g", i, i)).toDF("g", "k", "v")
    val r2 = Aqp.estimateDistinct(uniq, Seq("g"), col("v"), col("k"), 1, 20).head()
    assert(r2.getAs[Long]("f1") == r2.getAs[Long]("d_sampled"))
    val e2 = r2.getAs[Double]("est_distinct")
    // sqrt-scaling underestimates the all-unique worst case by design
    // (GEE's guarantee is a bounded ratio, not unbiasedness) — pin the
    // regime: f1-scaled, between the raw sample count and the truth
    assert(e2 > r2.getAs[Long]("d_sampled").toDouble && e2 < 10000.0)
  }

  test("stratified sampling: small groups are exact, every group present") {
    import spark.implicits._
    // one tiny group (7 rows) + one large (4000): uniform sampling starves
    // the tiny one; the stratified floor takes it WHOLE (exact estimate)
    val rows = (0L until 7L).map(i => ("tiny", i, 10L + i)) ++
      (100L until 4100L).map(i => ("big", i, 1L + (i % 50)))
    val df = rows.toDF("g", "k", "w")
    val est = Aqp.stratifiedEstimateSum(df, Seq("g"), col("k"), col("w"), m = 100)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Double]("est_sum"), r.getAs[Long]("n_group"),
          r.getAs[Long]("n_sampled"))).toMap
    assert(est.keySet == Set("tiny", "big"))
    val (tinyEst, tinyN, tinySamp) = est("tiny")
    assert(tinyN == 7L && tinySamp == 7L &&
      tinyEst == (10L until 17L).sum.toDouble,
      "a group at or under the floor must be estimated exactly")
    val (bigEst, bigN, bigSamp) = est("big")
    assert(bigN == 4000L && bigSamp == 100L)
    val bigExact = (100L until 4100L).map(i => 1L + (i % 50)).sum.toDouble
    assert(math.abs(bigEst - bigExact) / bigExact < 0.20,
      s"expansion estimate $bigEst too far from $bigExact")
  }

  test("priority sampling: heavy rows always sampled and contribute exactly w") {
    import spark.implicits._
    // one whale (1e9) among 10k minnows (1..100): uniform sampling at the
    // same budget misses the whale 98% of the time; priority sampling
    // cannot miss it (w >= tau => sampled), and its contribution is exact
    val rnd = new scala.util.Random(23)
    val rows = (0L until 10000L).map(i =>
      ("g", i, if (i == 4242L) 1000000000L else 1L + rnd.nextInt(100)))
    val df = rows.toDF("g", "k", "w")
    val est = Aqp.priorityEstimateSum(df, Seq("g"), col("k"), col("w"), k = 200)
      .head()
    val exact = rows.map(_._3).sum
    val e = est.getAs[Long]("est_sum")
    assert(est.getAs[Long]("n_sampled") == 200L)
    // the whale dominates the total; with it guaranteed in-sample the
    // estimate lands within a few percent of the truth
    assert(math.abs(e - exact).toDouble / exact < 0.05,
      s"priority estimate $e too far from $exact")
    // tiny input: everything sampled, tau = 0, estimate exact
    val small = (0L until 50L).map(i => ("g", i, i + 1L)).toDF("g", "k", "w")
    val all = Aqp.priorityEstimateSum(small, Seq("g"), col("k"), col("w"), 200).head()
    assert(all.getAs[Long]("est_sum") == (1L to 50L).sum &&
      all.getAs[Long]("n_sampled") == 50L)
  }

  test("synopsisBatch: streaming maintenance equals a from-scratch sample; replay idempotent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_aqp_syn").toString + "/syn"
    val docs = Tables.documents(spark, sf).select("doc_id", "source", "n_chars")
    val b0 = docs.filter(col("doc_id") % 2 === 0)
    val b1 = docs.filter(col("doc_id") % 2 === 1)
    Aqp.synopsisBatch(dir, col("doc_id"), 1, 20)(b0, 0L)
    Aqp.synopsisBatch(dir, col("doc_id"), 1, 20)(b1, 1L)
    def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val synIds = ids(spark.read.parquet(dir))
    assert(synIds == ids(Aqp.hashSample(docs, col("doc_id"), 1, 20)))
    // replaying a committed batch replaces its partition — no double rows
    Aqp.synopsisBatch(dir, col("doc_id"), 1, 20)(b1, 1L)
    assert(ids(spark.read.parquet(dir)) == synIds)
    // estimates from the synopsis equal estimates from the full table
    // (hashSample is idempotent: membership is a function of the key)
    val fromSyn = Aqp.estimateSum(spark.read.parquet(dir), Seq("source"),
      col("n_chars"), col("doc_id"), 1, 20).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val fromFull = Aqp.estimateSum(docs, Seq("source"),
      col("n_chars"), col("doc_id"), 1, 20).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(fromSyn == fromFull)
  }

  test("universe-sampled join is a p-sample of the join, not p²") {
    val cust = Tables.customer(spark, sf).select(col("c_custkey"), col("c_mktsegment"))
    val ord = Tables.orders(spark, sf).select(col("o_custkey"), col("o_totalprice"))
    val fullJoin = ord.join(cust, col("o_custkey") === col("c_custkey")).count()
    val sampleJoin = Aqp.hashSample(ord, col("o_custkey"), 1, 16)
      .join(Aqp.hashSample(cust, col("c_custkey"), 1, 16),
        col("o_custkey") === col("c_custkey")).count()
    val frac = sampleJoin.toDouble / fullJoin
    // row-wise independent samples would give ~1/256; universe sampling
    // keeps whole key clusters, so the joined fraction tracks 1/16
    assert(frac > 1.0 / 32 && frac < 1.0 / 8,
      s"joined sample fraction $frac should track p=1/16, not p²=1/256")
    // and the cluster-HT estimate covers the exact join total
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
    val est = Aqp.estimateKeyedSum(
      Aqp.hashSample(ord, col("o_custkey"), 1, 16)
        .join(Aqp.hashSample(cust, col("c_custkey"), 1, 16),
          col("o_custkey") === col("c_custkey"))
        .withColumn("all", lit("all")),
      Seq("all"), cents, col("c_custkey"), 1, 16).head()
    val exact = ord.join(cust, col("o_custkey") === col("c_custkey"))
      .agg(sum(cents)).head().getLong(0).toDouble
    assert(est.getAs[Double]("ci_lo") <= exact &&
      exact <= est.getAs[Double]("ci_hi"))
  }

  test("estimateSum: CI behaves on the fixture; support is the sample") {
    val docs = Tables.documents(spark, sf)
    val est = Aqp.estimateSum(docs, Seq("source"), col("n_chars"),
      col("doc_id"), 1, 20)
    val exact = docs.groupBy("source")
      .agg(sum(col("n_chars").cast("long")).as("exact")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = est.collect()
    assert(rows.nonEmpty)
    // n_sampled sums to the sample size
    val sampleN = Aqp.hashSample(docs, col("doc_id"), 1, 20).count()
    assert(rows.map(_.getAs[Long]("n_sampled")).sum == sampleN)
    // Every group's CI is ordered and the estimate sits inside it
    rows.foreach { r =>
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("est_sum") &&
        r.getAs[Double]("est_sum") <= r.getAs[Double]("ci_hi"))
    }
    // Coverage on the deterministic fixture: sf0.001 has 14 sources with
    // only ~2 sampled docs each — at that support the normal-approximation
    // CI undercovers (the known small-n behavior, no variance-math defect),
    // measured and PINNED at 12/14. A drop below 12 means the estimator
    // bent; full coverage at tiny n would actually be suspicious.
    val covered = rows.count { r =>
      val e = exact(r.getAs[String]("source")).toDouble
      r.getAs[Double]("ci_lo") <= e && e <= r.getAs[Double]("ci_hi")
    }
    assert(covered == 12 && rows.length == 14,
      s"CI covered $covered of ${rows.length} groups on the fixture")
    // At healthy support (one global group, ~25 sampled rows) the CI covers.
    val g = Aqp.estimateSum(docs.withColumn("all", lit("all")), Seq("all"),
      col("n_chars"), col("doc_id"), 1, 20).head()
    val exactAll = exact.values.sum.toDouble
    assert(g.getAs[Double]("ci_lo") <= exactAll &&
      exactAll <= g.getAs[Double]("ci_hi"))
  }
}
