package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Pii
import graft.operators.Packing

/** Sequence packing, bucketed cumsum, shard assignment, PII redaction. */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketedCumSum equals the single-window cumulative sum") {
    val df = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("id", "v")
    val expected = df.withColumn("cum",
        sum("v").over(Window.orderBy("id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val got = Packing.bucketedCumSum(
        df, col("id"), floor(col("id") / 10).cast("long"), col("v"), "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(got === expected)
  }

  test("tokenBudgetSelect: selection is the top-quality prefix of the ranking") {
    val docs = Tables.documents(spark, sf).limit(200)
    val got = Packing.tokenBudgetSelect(docs, col("doc_id"), col("text"),
      Seq("the", "a"), budgetNum = 1L, budgetDen = 2L)
    assert(got.count() === 200, "selection is a flag, not a filter")
    val ranked = got.orderBy(desc("quality"), col("doc_id"))
      .select("cum_tokens", "selected", "n_tokens")
      .collect()
    // cum_tokens strictly increases down the ranking by exactly n_tokens
    ranked.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(0) === a.getLong(0) + b.getLong(2), "cumsum must follow the ranking")
    }
    // selected rows form a prefix: once false, never true again
    val flags = ranked.map(_.getBoolean(1)).toSeq
    assert(flags === flags.sortBy(!_), s"selected must be a prefix of the ranking")
    val total = ranked.map(_.getLong(2)).sum
    val spent = ranked.filter(_.getBoolean(1)).map(_.getLong(2)).sum
    assert(spent * 2 <= total, "budget must not be exceeded")
    // full budget selects everything; zero budget selects nothing
    assert(Packing.tokenBudgetSelect(docs, col("doc_id"), col("text"), Seq("the"),
      budgetNum = 1L, budgetDen = 1L).filter(!col("selected")).count() === 0)
    assert(Packing.tokenBudgetSelect(docs, col("doc_id"), col("text"), Seq("the"),
      budgetNum = 0L, budgetDen = 1L).filter(col("selected")).count() === 0)
  }

  test("packSequences: chunk of the first token; boundary-spanning doc keeps its start chunk") {
    val df = Seq((1L, 1000L), (2L, 1000L), (3L, 500L), (4L, 2048L), (5L, 1L))
      .toDF("doc_id", "n_tokens")
    val got = Packing.packSequences(df, col("doc_id"), col("n_tokens"),
        capacity = 2048L, idBucketSize = 2L)
      .select("doc_id", "start_tok", "pack_id")
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    // starts: 0, 1000, 2000, 2500, 4548 → packs: 0, 0, 0, 1, 2
    assert(got === Seq((1L, 0L, 0L), (2L, 1000L, 0L), (3L, 2000L, 0L),
      (4L, 2500L, 1L), (5L, 4548L, 2L)))
  }

  test("Vocab: dense freq-ranked ids; OOV encodes in place instead of shifting positions") {
    import graft.operators.Vocab
    val docs = Seq((1L, "b a a c a b"), (2L, "a b")).toDF("doc_id", "text")
    // freqs: a=4 b=3 c=1 → ids 0, 1, 2
    val vocab = Vocab.build(docs, "text")
    assert(vocab.select("token", "token_id").as[(String, Long)].collect().toMap ===
      Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    // unknown token 'z' gets oovId at ITS position; 'a' stays at pos 2
    val enc = Vocab.encode(Seq((9L, "c z a")).toDF("doc_id", "text"),
        "doc_id", "text", vocab)
      .orderBy("pos").as[(Long, Int, Long)].collect().toSeq
    assert(enc === Seq((9L, 0, 2L), (9L, 1, -1L), (9L, 2, 0L)))
  }

  test("slidingChunks: coverage, overlap, short tail, empty doc yields nothing") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b c"),                                  // shorter than one chunk
      (3L, ""), (4L, "   ")                           // no chunks at all
    ).toDF("doc_id", "text")
    val got = Packing.slidingChunks(df, col("doc_id"), col("text"),
        chunkSize = 4, stride = 3)
      .select("doc_id", "chunk_idx", "start_tok", "n_tokens")
      .as[(Long, Int, Int, Int)].collect().sortBy(r => (r._1, r._2)).toSeq
    // doc 1: starts 0,3,6,9 → sizes 4,4,4,1 (short tail); doc 2: one short chunk
    assert(got === Seq(
      (1L, 0, 0, 4), (1L, 1, 3, 4), (1L, 2, 6, 4), (1L, 3, 9, 1),
      (2L, 0, 0, 3)))
    // every token position is covered: starts tile [0, n) with stride <= chunkSize
    val covered = got.filter(_._1 == 1L)
      .flatMap(r => r._3 until (r._3 + r._4)).toSet
    assert(covered === (0 until 10).toSet)
    // fingerprint is over the window CONTENT: same text, same hash
    val twice = Seq((1L, "x y z"), (2L, "x y z")).toDF("doc_id", "text")
    val fps = Packing.slidingChunks(twice, col("doc_id"), col("text"), 4, 3)
      .select("chunk_md5").as[String].collect().toSeq
    assert(fps.distinct.size === 1)
  }

  test("shardAssign: deterministic, dense 1-based positions per shard") {
    val df = (0L until 200L).toDF("doc_id")
    val a = Packing.shardAssign(df, col("doc_id"), 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    val b = Packing.shardAssign(df, col("doc_id"), 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect().sortBy(_._1).toSeq
    assert(a === b) // re-runnable: no RNG state
    assert(a.forall { case (_, s, _) => s >= 0 && s < 8 })
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted === (1 to rows.size).toSeq)
    }
    // the LCG actually permutes: within-shard order differs from id order
    val oneShard = a.filter(_._2 == a.head._2).sortBy(_._3).map(_._1)
    assert(oneShard !== oneShard.sorted)
  }

  test("splitAssign: stable under corpus growth, roughly proportional") {
    val small = (0L until 500L).toDF("doc_id")
    val grown = (0L until 2000L).toDF("doc_id")
    val sm = Packing.splitAssign(small, col("doc_id"))
      .as[(Long, String)].collect().toMap
    val gr = Packing.splitAssign(grown, col("doc_id"))
      .as[(Long, String)].collect().toMap
    // appending documents never reassigns an existing one
    assert(sm.forall { case (id, s) => gr(id) == s })
    val counts = gr.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts("train") > 1600 && counts("train") < 2000 * 0.95)
    assert(counts("val") > 0 && counts("test") > 0)
  }

  test("stratifiedSample: exactly n per stratum, deterministic, not id-prefix biased") {
    val df = (0L until 300L).map(i => (i, s"lang${i % 3}")).toDF("doc_id", "lang")
    val a = Packing.stratifiedSample(df, col("doc_id"), col("lang"), 10)
      .select("lang", "doc_id").as[(String, Long)].collect().sorted.toSeq
    val b = Packing.stratifiedSample(df, col("doc_id"), col("lang"), 10)
      .select("lang", "doc_id").as[(String, Long)].collect().sorted.toSeq
    assert(a === b)
    assert(a.groupBy(_._1).forall(_._2.size == 10))
    // pseudo-random, not "first n ids": the sample must not be 0..29
    assert(a.map(_._2).max > 30L)
  }

  test("weightedMix: per-stratum quotas, zero-weight strata excluded, consistent with stratifiedSample") {
    val df = (0L until 400L).map(i => (i, s"src${i % 4}")).toDF("doc_id", "source")
    val w = Map("src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.2) // src3 absent
    val got = Packing.weightedMix(df, col("doc_id"), col("source"), w, total = 40)
      .select("source", "doc_id").as[(String, Long)].collect().toSeq
    val bySrc = got.groupBy(_._1).view.mapValues(_.size).toMap
    assert(bySrc === Map("src0" -> 20, "src1" -> 12, "src2" -> 8))
    // the members are exactly the first quota of the SAME mix2 order
    // stratifiedSample uses — one sampling notion across the module
    val strat = Packing.stratifiedSample(df, col("doc_id"), col("source"), 20)
      .filter(col("source") === "src1" && col("sample_rank") <= 12)
      .select("doc_id").as[Long].collect().toSet
    assert(got.filter(_._1 == "src1").map(_._2).toSet === strat)
    // quota larger than the stratum: returns the whole stratum, no error
    val all = Packing.weightedMix(df, col("doc_id"), col("source"),
      Map("src0" -> 2.0), total = 100)
    assert(all.count() === 100) // src0 only has 100 rows
    // largest-remainder apportionment: quotas sum EXACTLY to total even
    // when per-stratum rounding would drift (1/3 x 3 at 50 -> 51)
    assert(Packing.apportion(Map("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3), 50)
      === Map("a" -> 17, "b" -> 17, "c" -> 16))
    assert(Packing.apportion(Map("a" -> 0.45, "b" -> 0.35, "c" -> 0.1, "d" -> 0.1), 50)
      .values.sum === 50)
  }

  test("incremental dedup drops exactly the already-seen fingerprints") {
    import graft.operators.Dedup
    val seen = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val batch = Seq((10L, "ALPHA  beta"), (11L, "epsilon zeta"), (12L, "gamma delta"))
      .toDF("doc_id", "text")
    val out = Dedup.incremental(batch, seen, "text")
      .select("doc_id").as[Long].collect().toSet
    // 10 normalizes to seen "alpha beta"; 12 matches exactly; 11 survives
    assert(out === Set(11L))
  }

  test("maskDigits keeps the tail and non-digits") {
    val got = Seq("Customer#000000042", "ab", "12345")
      .toDF("s").select(Pii.maskDigits(col("s"), 3)).as[String].collect().toSeq
    assert(got === Seq("Customer#XXXXXX042", "ab", "XX345"))
  }

  test("email and phone redaction") {
    val got = Seq("mail bob.smith+x@corp.example.com or 555-867-5309 now")
      .toDF("s")
      .select(Pii.redactPhones(Pii.redactEmails(col("s"))).as("r"),
        Pii.emailCount(col("s")).as("n"))
      .as[(String, Int)].head()
    assert(got === ("mail <EMAIL> or <PHONE> now", 1))
  }
}
