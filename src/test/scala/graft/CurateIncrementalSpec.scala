package graft

import org.apache.spark.sql.functions._
import graft.operators.Curate

/** Incremental curation funnel (q129): composition vs the batch-mode
  * funnel, index update semantics, and the documented near-dup asymmetry. */
class CurateIncrementalSpec extends SparkSpec {
  import spark.implicits._

  private val stop = Seq("the", "a")

  // pre-curated seen corpus: distinct vocab per doc (no cross-doc 4-token
  // chunks), c4 anchors the quality floor low, c5 is the eval slice
  private def seenCorpus = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta", "en"),
    (2L, "one two three four five six seven eight", "en"),
    (3L, "red green blue yellow purple orange pink white", "en"),
    (4L, "!!! ??? ;;; ::: ,,, .... --- ###", "en"),
    (5L, "benchmark question answer evaluation probe tokens here now", "en")
  ).toDF("doc_id", "text", "lang")

  private def b12Text = "wolf bear lion tiger moose elk deer fox"

  private def batch1 = Seq(
    (11L, "alpha beta gamma delta epsilon zeta eta theta", "en"), // clone of c1
    (12L, b12Text, "en"),                                         // fresh
    (13L, "one two three four nine ten eleven twelve", "en"),     // half of c2's chunks
    (14L, b12Text, "en")                                          // within-batch clone of 12
  ).toDF("doc_id", "text", "lang")

  private def index0 = Curate.buildIndex(seenCorpus, "doc_id", "text", "lang",
    stop, evalPred = col("doc_id") === 5L,
    spanTokens = 4, dupFlagAt = 0.5, qualityCut = 0.0)

  test("funnelIncremental: per-stage drops and survivor set on batch 1") {
    val r = Curate.funnelIncremental(batch1, "doc_id", "text", "lang", stop, index0)
    val counts = r.funnel.counts.as[(String, Long)].collect().toMap
    // 11 exact-vs-index, 14 exact-within-batch, 13 span-dup, 12 survives
    assert(counts === Map("b0_input" -> 4L, "b1_exact" -> 2L,
      "b2_span_dedup" -> 1L, "b3_quality" -> 1L, "b4_decontaminated" -> 1L))
    assert(r.funnel.survivors.select("doc_id").as[Long].collect().toSet === Set(12L))
  }

  test("composition: incremental batches equal the batch-mode funnel restricted to batch docs") {
    // batch 2: exact clone of the batch-1 survivor (must be caught by the
    // UPDATED fingerprint index), a fresh doc, and an eval-contaminated doc
    val batch2 = Seq(
      (21L, b12Text, "en"),
      (23L, "cloud rain storm wind snow hail fog mist", "en"),
      (24L, "casual mention of benchmark question answer within prose", "en")
    ).toDF("doc_id", "text", "lang")

    val r1 = Curate.funnelIncremental(batch1, "doc_id", "text", "lang", stop, index0)
    val r2 = Curate.funnelIncremental(batch2, "doc_id", "text", "lang", stop,
      r1.updatedIndex)
    val incSurvivors =
      r1.funnel.survivors.select("doc_id").as[Long].collect().toSet ++
        r2.funnel.survivors.select("doc_id").as[Long].collect().toSet

    val union = seenCorpus.unionByName(batch1).unionByName(batch2)
    val batchMode = Curate.funnel(union, "doc_id", "text", "lang", stop,
        evalPred = col("doc_id") === 5L,
        spanTokens = 4, dupFlagAt = 0.5, qualityCut = 0.0)
      .survivors.select("doc_id").as[Long].collect().toSet

    assert(incSurvivors === Set(12L, 23L))
    assert(batchMode.filter(_ >= 11L) === incSurvivors,
      s"batch-mode restricted ${batchMode.filter(_ >= 11L)} != incremental $incSurvivors")
  }

  test("documented asymmetry: a later near-dup drops incrementally; batch mode drops both") {
    // 22 shares its first 4-token chunk with accepted survivor 12
    val batch2 = Seq(
      (22L, "wolf bear lion tiger spoon fork knife plate", "en")
    ).toDF("doc_id", "text", "lang")
    val r1 = Curate.funnelIncremental(batch1, "doc_id", "text", "lang", stop, index0)
    val r2 = Curate.funnelIncremental(batch2, "doc_id", "text", "lang", stop,
      r1.updatedIndex)
    // incremental: the accepted doc 12 stays accepted, newcomer 22 drops
    assert(r2.funnel.survivors.select("doc_id").as[Long].collect().isEmpty)

    val union = seenCorpus.unionByName(batch1).unionByName(batch2)
    val batchMode = Curate.funnel(union, "doc_id", "text", "lang", stop,
        evalPred = col("doc_id") === 5L,
        spanTokens = 4, dupFlagAt = 0.5, qualityCut = 0.0)
      .survivors.select("doc_id").as[Long].collect().toSet
    // batch mode has no survivor election at the span stage: BOTH drop
    assert(!batchMode.contains(12L) && !batchMode.contains(22L))
  }

  test("frozen quality floor: a batch doc below the seen corpus's floor is cut") {
    // floor = min seen quality (c4's punctuation soup); a batch doc even
    // worse than c4 must drop at b3, a prose doc must pass
    val idx = Curate.buildIndex(seenCorpus, "doc_id", "text", "lang", stop,
      evalPred = col("doc_id") === 5L, spanTokens = 4, dupFlagAt = 0.5,
      qualityCut = 0.1)
    val batch = Seq(
      (31L, "%% ^^ && `` ~~ || @@ ++", "en"),
      (32L, "quiet meadow stream flows gently under morning light", "en")
    ).toDF("doc_id", "text", "lang")
    val r = Curate.funnelIncremental(batch, "doc_id", "text", "lang", stop, idx)
    val counts = r.funnel.counts.as[(String, Long)].collect().toMap
    assert(counts("b2_span_dedup") === 2L && counts("b3_quality") === 1L)
    assert(r.funnel.survivors.select("doc_id").as[Long].collect().toSet === Set(32L))
  }

  test("fuzzyDedupIncremental: accepted-corpus precedence, within-batch clustering, fresh kept") {
    import graft.operators.Dedup
    // long docs so 3-shingle jaccard of tail-appended clones clears 0.8
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val fresh = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
    val seen = Seq((1L, base),
      (2L, (1 to 20).map(i => s"zz$i").mkString(" "))) // disjoint from every batch doc
      .toDF("doc_id", "text")
    val batch = Seq(
      (101L, base + " small tail"),          // near-dup of seen 1 -> drops, dup_of 1
      (102L, fresh + " brand new content entirely here"),
      (103L, fresh + " brand new content entirely here okay"), // near-dup of 102 (within batch)
      (104L, "completely unrelated vocabulary nothing shared with anyone at all today")
    ).toDF("doc_id", "text")
    val idx = Dedup.bandedSignatures(seen, "doc_id", "text")
    val got = Dedup.fuzzyDedupIncremental(batch, seen, idx, "doc_id", "text",
        threshold = 0.6)
      .orderBy("doc_id").as[(Long, Long, Boolean)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(got.map(_._1) === Seq(101L, 102L, 103L, 104L))
    // 101: seen wins — dup_of is the SEEN id, not a batch id
    assert(byId(101L) === ((101L, 1L, false)))
    // 102/103: within-batch cluster, min-id survivor
    assert(byId(102L) === ((102L, 102L, true)))
    assert(byId(103L) === ((103L, 102L, false)))
    // 104: fresh singleton keeps itself
    assert(byId(104L) === ((104L, 104L, true)))

    // advance the index with the survivors; a later batch near-duplicating
    // survivor 102 must now resolve AGAINST IT (accepted-corpus-wins)
    val kept = batch.join(
      got.filter(_._3).map(_._1).toDF("doc_id"), "doc_id")
    val idx2 = Dedup.advanceBandedIndex(idx, kept, "doc_id", "text")
    val seen2 = seen.unionByName(kept)
    val batch3 = Seq((201L, fresh + " brand new content entirely here also"))
      .toDF("doc_id", "text")
    val got3 = Dedup.fuzzyDedupIncremental(batch3, seen2, idx2, "doc_id", "text",
        threshold = 0.6)
      .as[(Long, Long, Boolean)].head()
    assert(got3 === ((201L, 102L, false)),
      s"the advanced index must catch a near-dup of batch-1 survivor 102: $got3")
  }

  test("repeatedSpansIncremental: seen-index cover, within-batch repeats, fresh untouched") {
    import graft.operators.Dedup
    val seen = Seq((900L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "s1 s2 s3 s4 s5 s6 s7 s8 f1 f2"),                 // seen prefix + fresh tail
      (2L, "a b c d e f g h i a b c d e f g h i"),            // doubled 9-run: full self cover
      (3L, "x1 x2 x3 x4 x5 x6 x7 x8 x9"),                     // fresh, unique gram
      (4L, "m1 m2 m3 m4 m5 m6 m7 m8 q4a"),                    // shares m-run with 5
      (5L, "zz m1 m2 m3 m4 m5 m6 m7 m8")
    ).toDF("doc_id", "text")
    val idx = Dedup.buildRepeatedSpanIndex(seen, "doc_id", "text", minLen = 8)
    val got = Dedup.repeatedSpansIncremental(batch, idx, "doc_id", "text", minLen = 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Double, String)].collect().toSeq
    assert(got(0) === ((1L, 10L, 1L, 8L, 0.8, "f1 f2")))
    assert(got(1) === ((2L, 18L, 1L, 18L, 1.0, "")))
    // doc 3's single 8-gram (x1..x8) is unique in the batch and unseen, but
    // positions 8 (x9)?? — only one gram at start 0 with a 9-token doc; the
    // second window start 1 = x2..x9 is ALSO unique — nothing covered
    assert(got(2) === ((3L, 9L, 0L, 0L, 0.0, "x1 x2 x3 x4 x5 x6 x7 x8 x9")))
    assert(got(3) === ((4L, 9L, 1L, 8L, 0.8889, "q4a")))
    assert(got(4) === ((5L, 9L, 1L, 8L, 0.8889, "zz")))
  }

  test("repeatedSpansIncremental equals union-corpus repeatedSpans restricted to the batch") {
    import graft.operators.Dedup
    val seen = Seq(
      (900L, "s1 s2 s3 s4 s5 s6 s7 s8 s9 s10"),
      (901L, "t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val batch = Seq(
      (1L, "s2 s3 s4 s5 s6 s7 s8 s9 w1 w2"),   // interior seen run
      (2L, "t1 t2 t3 t4 t5 t6 t7 t8 extra"),
      (3L, "all fresh tokens nothing shared here at all nine")
    ).toDF("doc_id", "text")
    // precondition of the identity: the seen corpus itself contains no
    // repeated grams (it is pre-deduplicated), so union-mode coverage of a
    // batch position reduces to seen-membership OR batch-repeat
    val idx = Dedup.buildRepeatedSpanIndex(seen, "doc_id", "text", minLen = 8)
    val inc = Dedup.repeatedSpansIncremental(batch, idx, "doc_id", "text", minLen = 8)
      .orderBy("doc_id").collect().toSeq
    val union = Dedup.repeatedSpans(seen.unionByName(batch), "doc_id", "text", minLen = 8)
      .filter(col("doc_id") < 100L).orderBy("doc_id").collect().toSeq
    assert(inc === union)
  }

  test("streaming micro-batch curation: funnelIncremental per batch, index advances, dups land once") {
    import org.apache.spark.sql.streaming.Trigger
    import graft.operators.Curate
    val srcDir = java.nio.file.Files.createTempDirectory("inc-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("inc-out").toString
    val ckDir = java.nio.file.Files.createTempDirectory("inc-ck").toString

    val sharedText = "wolf bear lion tiger moose elk deer fox badger otter"
    // two files = two micro-batches (arrival order unknown — the fixture is
    // designed so the landed FINGERPRINT set is order-independent: only
    // exact cross-batch dups, no cross-batch near-dups)
    Seq(
      (11L, "alpha beta gamma delta epsilon zeta eta theta", "en"), // clone of seen c1
      (12L, sharedText, "en"),
      (13L, "quiet meadow stream flows gently under morning light", "en")
    ).toDF("doc_id", "text", "lang").coalesce(1)
      .write.mode("overwrite").parquet(srcDir)
    Seq(
      (21L, sharedText, "en"),                                       // exact dup of 12 ACROSS batches
      (22L, "casual mention of benchmark question answer within prose", "en"), // eval 3-gram
      (23L, "cloud rain storm wind snow hail fog mist sleet ice", "en")
    ).toDF("doc_id", "text", "lang").coalesce(1)
      .write.mode("append").parquet(srcDir)

    // the mutable index is the driver-side stand-in for persisted index
    // tables; each micro-batch's updated frames are materialized inside the
    // call (the batch frame is only valid within it)
    var index = index0.materialized()
    val schema = Tables.documents(spark, sf)
      .select("doc_id", "text", "lang").schema
    val q = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(srcDir)
      .writeStream.trigger(Trigger.AvailableNow())
      .option("checkpointLocation", ckDir)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val r = Curate.funnelIncrementalPersisted(batch, "doc_id", "text",
          "lang", stop, index)
        r.funnel.survivors.write.mode("append").parquet(outDir)
        index = r.updatedIndex.materialized()
        ()
      }.start()
    assert(q.awaitTermination(180000), "AvailableNow must drain and stop")

    val landedFps = spark.read.parquet(outDir)
      .select(graft.functions.Text.fingerprint(col("text")).as("fp"))
      .as[String].collect().toSeq
    // the cross-batch exact dup (12/21) landed exactly ONCE — only possible
    // if the fingerprint index advanced between micro-batches
    assert(landedFps.size === landedFps.distinct.size,
      s"a duplicate text landed twice: $landedFps")
    // expected = sequential composition on the same two batches
    val b1 = spark.read.parquet(srcDir)
      .filter(col("doc_id") < 20).select("doc_id", "text", "lang")
    val b2 = spark.read.parquet(srcDir)
      .filter(col("doc_id") >= 20).select("doc_id", "text", "lang")
    val r1 = Curate.funnelIncremental(b1, "doc_id", "text", "lang", stop,
      index0.materialized())
    val r2 = Curate.funnelIncremental(b2, "doc_id", "text", "lang", stop,
      r1.updatedIndex)
    val expectedFps = r1.funnel.survivors.unionByName(r2.funnel.survivors)
      .select(graft.functions.Text.fingerprint(col("text")).as("fp"))
      .as[String].collect().toSet
    assert(landedFps.toSet === expectedFps,
      s"streamed ${landedFps.toSet} != sequential $expectedFps")
  }

  test("a language absent from the index passes the quality stage (no defined floor)") {
    val batch = Seq((41L, "texto corto razonable sin problemas aqui mismo hoy", "es"))
      .toDF("doc_id", "text", "lang")
    val r = Curate.funnelIncremental(batch, "doc_id", "text", "lang", stop, index0)
    assert(r.funnel.survivors.select("doc_id").as[Long].collect().toSet === Set(41L))
  }

  test("chained fuzzy dedup: batch-2 near-dups of batch-1 docs drop ONLY via the advanced band index") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val seen = docs.filter(col("doc_id") < 100).select("doc_id", "text")
    val b1 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
      .select("doc_id", "text")
    // near-dups of batch-1 docs (which are FRESH vs seen — their bands
    // exist nowhere in the seed index)
    val b2 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 120)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(col("text"), lit(" nearly duplicated tail tokens")).as("text"))
    val idx0 = Dedup.bandedSignatures(seen, "doc_id", "text").localCheckpoint()
    val r1 = Dedup.fuzzyDedupIncremental(b1, seen, idx0, "doc_id", "text", 0.8)
      .localCheckpoint()
    val surv = b1.join(r1.filter(col("kept")).select("doc_id"), Seq("doc_id"), "left_semi")
    val idx1 = Dedup.advanceBandedIndex(idx0, surv, "doc_id", "text").localCheckpoint()
    val withAdv = Dedup.fuzzyDedupIncremental(b2, seen.unionByName(surv), idx1,
      "doc_id", "text", 0.8)
    val stale = Dedup.fuzzyDedupIncremental(b2, seen, idx0, "doc_id", "text", 0.8)
    // advanced index: the clones resolve to their batch-1 originals
    val caught = withAdv.filter(!col("kept") && col("dup_of") < 500000L).count()
    assert(caught >= 15L, s"only $caught of 20 clones caught via the advance")
    // stale index: the SAME clones sail through as fresh — the negative
    // control proving the advance (not the seed index) does the catching
    val staleKept = stale.filter(col("kept")).count()
    val advKept = withAdv.filter(col("kept")).count()
    assert(staleKept === 20L, s"stale index should keep all 20, kept $staleKept")
    assert(advKept < staleKept)
  }

  test("chained repeated spans: batch-1-survivor prefixes are covered ONLY via the advanced gram index") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, sf)
    val seen = docs.filter(col("doc_id") < 100).select("doc_id", "text")
    val b1 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
      .select("doc_id", "text")
    val b2 = docs.filter(col("doc_id") >= 100 && col("doc_id") < 110)
      .select((col("doc_id") + 500000L).as("doc_id"),
        concat(concat_ws(" ", slice(graft.functions.Text.tokens(col("text")), 1, 16)),
          lit(" zzza"), col("doc_id").cast("string"),
          lit(" zzzb"), col("doc_id").cast("string"),
          lit(" zzzc"), col("doc_id").cast("string")).as("text"))
    val idx0 = Dedup.buildRepeatedSpanIndex(seen, "doc_id", "text").localCheckpoint()
    val r1 = Dedup.repeatedSpansIncremental(b1, idx0, "doc_id", "text").localCheckpoint()
    val surv = b1.join(r1.filter(col("repeated_frac") < 0.5).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val idx1 = idx0.unionByName(Dedup.buildRepeatedSpanIndex(surv, "doc_id", "text"))
      .distinct().localCheckpoint()
    val withAdv = Dedup.repeatedSpansIncremental(b2, idx1, "doc_id", "text")
    val stale = Dedup.repeatedSpansIncremental(b2, idx0, "doc_id", "text")
    // stale index: nothing in b2 is covered (prefixes reference batch-1
    // material the seed index never saw; tails are unique)
    assert(stale.agg(sum("n_repeated_tokens")).head().getLong(0) === 0L)
    // advanced index: the 16-token prefixes are covered for every doc whose
    // original is long enough to contribute anchors
    val covered = withAdv.filter(col("n_repeated_tokens") >= 10L).count()
    assert(covered >= 8L, s"only $covered of 10 prefixes covered via the advance")
  }
}
