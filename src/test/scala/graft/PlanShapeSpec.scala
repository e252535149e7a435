package graft

/** Physical-plan regression guards: the properties that matter at 100 TB —
  * dims broadcast (no fact shuffle), filters reach the parquet scan, top-k
  * plans as TakeOrderedAndProject (no global sort), whole-stage codegen
  * covers the hot paths. A change that silently degrades any of these fails
  * here, not in production.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2 star join: every dimension joins as BroadcastHashJoin, no SortMergeJoin") {
    val p = plan("q2_star_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "fact side must not sort-merge against dims")
  }

  test("q1 pricing summary: shipdate filter pushes into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1 reads only the columns it needs") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"projection must prune unused lineitem columns: $readSchema")
  }

  test("q3 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q3_topk_parts")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q12 anti join broadcasts the key side") {
    val p = plan("q12_customers_no_orders")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(2000))
  }

  test("aggregates run partial+final (map-side combine before the shuffle)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial and final HashAggregate stages")
  }

  test("q21 hierarchy: left joins broadcast the dimension side") {
    val p = plan("q21_hierarchy_rollup")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q41 as-of join: ONE hash shuffle regardless of side sizes") {
    val p = plan("q41_asof_join")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1, s"expected exactly 1 hash exchange, got $hashExchanges:\n${p.take(1500)}")
    assert(p.contains("Window"), "as-of must be the union-window formulation")
  }

  test("q38 sessionize: windows share the user_id partitioning (no re-shuffle between them)") {
    val p = plan("q38_sessionize_batch")
    // lag + cumsum windows over the same (user_id, ts) ordering must plan as
    // consecutive Window nodes over ONE exchange
    val idx = p.indexOf("Exchange hashpartitioning(user_id")
    assert(idx >= 0, p.take(1500))
    val afterFirst = p.substring(0, idx)
    assert("Window".r.findAllIn(afterFirst).length >= 2 ||
      "Window".r.findAllIn(p).length >= 2, "expected both windows planned")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      "lag and cumsum must reuse one user_id shuffle")
  }

  test("q47 range join: bucketed equi-join, never a nested loop") {
    val p = plan("q47_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated into a nested loop:\n${p.take(2000)}")
  }

  test("q49 rollup: all grouping levels share ONE shuffle (Expand, not a union of groupBys)") {
    val df = SparkEntry.queries("q49_grouping_rollup")(spark, sf)
    df.collect()
    // AQE's tree string appends the pre-adaptive "Initial Plan" — count
    // exchanges only in the final section
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("Expand"), s"rollup should plan an Expand:\n${p.take(2000)}")
    assert(!p.contains("Union"), "rollup must not union per-level aggregations")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 aggregation shuffle, got $exchanges")
  }

  test("q57 packing: bucket offsets broadcast; the big window partitions by bucket") {
    val p = plan("q57_pack_sequences")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast-join, not shuffle the corpus:\n${p.take(2000)}")
    assert(p.contains("windowspecdefinition(__bucket"),
      "corpus-side running sum must partition by __bucket (never a global window)")
  }

  test("q59 winnowing: pure projection pipeline, no hash shuffle before the sort") {
    val p = plan("q59_winnow_fingerprints")
    assert(!p.contains("Exchange hashpartitioning"),
      s"winnowing must stay shuffle-free (HOF projection + explode only):\n${p.take(2000)}")
  }

  test("q69 hopping windows: bucket expansion feeds ONE aggregation shuffle") {
    val df = SparkEntry.queries("q69_hopping_windows")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("Expand") || p.contains("Generate"),
      s"hopping windows should expand buckets in-plan:\n${p.take(1500)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1,
      s"expected 1 aggregation shuffle, got $exchanges:\n${p.take(1500)}")
  }

  test("q67 basket lift: dimension counts broadcast, top-k without global sort") {
    val df = SparkEntry.queries("q67_basket_lift")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"item-count joins must broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"), "no sort-merge in the lift join tree")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must plan as TakeOrderedAndProject")
  }

  test("q32 LSH: banding is a pure projection (no shuffle before the bucket join)") {
    val df = SparkEntry.queries("q32_ann_lsh")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the 48 sign-bit dots + posexplode must NOT introduce their own
    // exchange — the first shuffle in the tree is the (band,bucket)
    // candidate join / distinct, then the per-query top-k window
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      s"bucket join should not degrade to a plain sort-merge over unbanded data:\n${p.take(1500)}")
    assert(p.contains("Generate"), "banding must posexplode in-plan (projection, not shuffle)")
  }

  test("q54 PQ: encode and ADC scan are broadcast passes (no corpus shuffle before top-k)") {
    val df = SparkEntry.queries("q54_ann_pq")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // codebooks + ADC tables travel as broadcast vars inside typed map
    // passes (encode + scan): the plan must show the object maps and no
    // sort-merge join anywhere — the only shuffles PQ needs are the
    // approx-top-k window and the broadcast-side rerank joins
    assert(p.contains("MapPartitions") || p.contains("SerializeFromObject"),
      s"PQ encode/scan must run as typed map passes:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"),
      s"rerank joins must broadcast, not sort-merge:\n${p.take(1500)}")
  }

  test("q29 minhash: ONE (band,bucket) shuffle serves the size gate AND the pair join") {
    val df = SparkEntry.queries("q29_minhash_candidates")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the bucket-size window and the self-join both key on (band,bucket):
    // the join must reuse the window's exchange, not re-shuffle
    assert(p.contains("ReusedExchange") ||
      "Exchange hashpartitioning\\(band".r.findAllIn(p).length <= 1,
      s"(band,bucket) partitioning must be shared between gate and join:\n${p.take(2000)}")
  }

  test("q74 decontamination: eval side broadcasts — the train side never pre-shuffles") {
    val df = SparkEntry.queries("q74_decontaminate")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"gram join must broadcast the eval grams:\n${p.take(1500)}")
    // only the pair-count aggregate and the output sort may shuffle
    assert(!p.contains("SortMergeJoin"), "train grams must not sort-merge")
  }

  test("q75/q77 corpus rankers cut with TakeOrderedAndProject, no global sort") {
    Seq("q75_repeated_ngrams", "q77_bm25_topk").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(p.contains("TakeOrderedAndProject"),
        s"$name: top-k must plan as TakeOrderedAndProject:\n${p.take(1500)}")
    }
  }

  test("q76 CDC chunking: the chunker is ONE projection — no shuffle before the chunk agg") {
    val df = SparkEntry.queries("q76_cdc_chunk_dedup")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // exactly: chunk-text aggregation exchange + the output sort's range
    // exchange; the fold itself must not move data
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1,
      s"expected only the chunk aggregation to hash-shuffle, got $exchanges:\n${p.take(1500)}")
  }

  test("q73 semDedup: assignment is a projection; the sweep shuffles on the cell only") {
    val df = SparkEntry.queries("q73_semdedup")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"semDedup must never plan an unbucketed pairwise product:\n${p.take(1500)}")
  }

  test("q82/q86 chunking and projection: zero hash shuffles — pure generator pipelines") {
    Seq("q82_chunk_windows", "q86_random_projection").foreach { name =>
      val df = SparkEntry.queries(name)(spark, sf)
      df.collect()
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(!p.contains("Exchange hashpartitioning"),
        s"$name must not shuffle (projection + explode only); plan:\n${p.take(1500)}")
    }
  }

  test("q83 span fraction: no fingerprint join — viral spans spread by (fp, doc), joins key on doc only") {
    val df = SparkEntry.queries("q83_dup_span_frac")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    // the skew-safe shape (DedupSkewSpec has the adversarial fixture): raw
    // span rows are never JOINED on fp — a corpus-wide viral span would
    // funnel into one partition there and AQE can't split a reused exchange
    assert(!"Join \\[fp".r.findFirstIn(p).isDefined,
      s"no join may key on the fingerprint:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span accounting stays keyed — never pairwise")
  }

  test("q84 count-min: ONE tiny sketch broadcast, probes never re-shuffle for the estimate") {
    val df = SparkEntry.queries("q84_cms_user_counts")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the one-row sketch must broadcast to the probe side:\n${p.take(1500)}")
    // the key-count aggregate is the only hash shuffle the estimates need
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"estimate pass must not add shuffles beyond the count + sketch agg, got $exchanges:\n${p.take(2000)}")
  }

  test("q87 vocab encode: dictionary broadcasts; only the vocab count hash-shuffles") {
    val df = SparkEntry.queries("q87_vocab_encode")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("BroadcastHashJoin"),
      s"the vocab must broadcast to the exploded corpus:\n${p.take(1500)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"corpus-side work is one count shuffle (vocab rank is vocab-sized), got $exchanges:\n${p.take(2000)}")
  }

  test("q92 composed row number: B-way window shuffle, never a SinglePartition exchange") {
    val df = SparkEntry.queries("q92_global_rownum_composed")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("Exchange hashpartitioning(__bkt"),
      s"local row_number must shuffle on the bucket id:\n${p.take(1500)}")
    assert(!p.contains("Exchange SinglePartition"),
      s"the composed form exists to avoid the single-partition sort q33 pays:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"per-bucket offsets must broadcast, not shuffle-join:\n${p.take(1500)}")
  }

  test("whole-stage codegen covers the scan→filter→aggregate hot path") {
    // AQE materializes the final plan only on execution
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // treeString renders WholeStageCodegen stages as "*(n) " prefixes
    assert(p.contains("*(1) HashAggregate") || p.contains("WholeStageCodegen"), p.take(2000))
    assert(p.contains("*(1) Filter"), "filter must run inside codegen stage 1")
  }

  test("q95 token budget: cumsum partitions by bucket; budget scalar broadcasts") {
    val p = plan("q95_token_budget")
    assert(p.contains("windowspecdefinition(__bucket"),
      "corpus-side running sum must partition by __bucket (never a global window)")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the 1-row total must broadcast, not shuffle:\n${p.take(2000)}")
  }

  test("q96 url canonicalization: one projection into one aggregation shuffle") {
    val p = plan("q96_url_canon")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "canonicalization must be join-free")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1,
      s"expected exactly 1 hash exchange (the canon-key groupBy), got $hashExchanges")
  }

  test("q97 DSIR: bucket table broadcasts back onto the bigram stream") {
    val p = plan("q97_dsir_weights")
    // (the final doc-keyed LEFT JOIN back to the corpus is allowed to
    // shuffle — it is doc-keyed, not pair-space; the guard is that the
    // per-bucket lambda table never shuffles the bigram stream)
    assert(p.contains("BroadcastHashJoin"),
      s"the 64-row lambda table must broadcast onto the bigram stream:\n${p.take(2000)}")
  }

  test("q105 k-means assignment is join-free: centroids ride as a literal, no crossJoin") {
    // the plan here is the FINAL assignment (training already ran while the
    // DataFrame was built) — it must be a pure projection over the corpus
    val p = plan("q105_kmeans")
    assert(!p.contains("CartesianProduct") && !p.contains("Join"),
      s"assignment must not join corpus x centroids (the literal-array form):\n${p.take(2000)}")
  }

  test("q110 bigram LM: count groupBy and count join share one (w1,w2) exchange; unigrams broadcast") {
    val df = SparkEntry.queries("q110_bigram_lm")(spark, sf)
    df.collect() // AQE finalizes reuse only on execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ReusedExchange") || p.contains("ReusedQueryStage")
      || p.contains("TableCacheQueryStage"),
      s"bigram counts must reuse the bigram-stream exchange, not re-shuffle:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"vocabulary-sized unigram tables must broadcast:\n${p.take(2000)}")
  }

  test("q122 incremental aggregate: union + aggregate only — no join; one maintenance exchange") {
    val p = plan("q122_incremental_agg")
    assert(!p.contains("Join"),
      s"delta maintenance must be a union + aggregate, never a join:\n${p.take(2000)}")
    assert(p.contains("Union"), s"state and delta must combine by union:\n${p.take(2000)}")
    // exactly 2 group-key exchanges: one builds the fixture's STATE (a
    // persisted table in production — that exchange disappears there), one
    // is the maintenance aggregate itself
    val hashExchanges = "Exchange hashpartitioning\\(o_orderpriority".r.findAllIn(p).length
    assert(hashExchanges === 2,
      s"expected state-build + maintenance exchanges only, got $hashExchanges:\n${p.take(2000)}")
  }

  test("q111 language ID: profile and language list broadcast; no sort-merge on the gram key") {
    val p = plan("q111_langid_trained")
    assert(p.contains("BroadcastHashJoin"),
      s"the topK-per-lang profile must broadcast onto doc trigrams:\n${p.take(2000)}")
    // the doc-keyed fill join may sort-merge (doc-keyed, bounded fan-out);
    // what must never happen is a sort-merge keyed on the GRAM stream
    assert(!p.contains("SortMergeJoin [gram"),
      s"the gram-keyed join must broadcast, never sort-merge:\n${p.take(2000)}")
  }

  test("q127 repeated spans: the anchor gram NEVER keys a join (df==1 identity shape)") {
    val p = plan("q127_repeated_spans")
    // a viral gram (site boilerplate) would funnel its whole occurrence set
    // into one partition if any join keyed on it; the only gram-keyed node
    // allowed is the count AGGREGATE (partial-merged map-side)
    assert(!"Join \\[g#".r.findAllIn(p).hasNext,
      s"no join may key on the gram column:\n${p.take(2000)}")
    assert(p.contains("LeftAnti"),
      s"repeated occurrences must come from the anti-join vs unique ones:\n${p.take(2000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("q128 naive bayes: vocab count table broadcasts onto the token stream") {
    val p = plan("q128_naive_bayes")
    assert(p.contains("BroadcastHashJoin"),
      s"the vocabulary-sized count table must broadcast:\n${p.take(2000)}")
    // the doc-keyed fill join may sort-merge; the TOKEN-keyed scoring join
    // must not (a stopword would funnel the corpus into one partition)
    assert(!p.contains("SortMergeJoin [tok"),
      s"the token-keyed scoring join must broadcast, never sort-merge:\n${p.take(2000)}")
  }

  test("q129 incremental funnel: index tables broadcast; stages anti-join; nothing cartesian") {
    // the registered query runs the PERSISTED form whose counts plan is all
    // accumulator literals — audit the LAZY funnel's survivor plan, where
    // every stage's join shape is visible in one tree
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf)
    val seen = docs.filter(col("doc_id") < 350).select("doc_id", "text", "lang")
    val batch = docs.filter(col("doc_id") >= 350).select("doc_id", "text", "lang")
    val idx = graft.operators.Curate.buildIndex(seen, "doc_id", "text", "lang",
      Seq("the", "a"), evalPred = col("doc_id") % 50 === 0)
    val p = graft.operators.Curate
      .funnelIncremental(batch, "doc_id", "text", "lang", Seq("the", "a"), idx)
      .funnel.survivors.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct"),
      s"no stage of the incremental funnel may go cartesian:\n${p.take(2000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"the frozen thresholds (language-count-sized) must broadcast:\n${p.take(2000)}")
    assert(p.contains("LeftAnti"),
      s"exact/span/decontam stages are anti-joins against the index:\n${p.take(2000)}")
  }

  test("q130 KN trigram: every word-keyed stats join broadcasts, never sort-merges") {
    val df = SparkEntry.queries("q130_kn_trigram_lm")(spark, sf)
    df.collect() // AQE finalizes join strategies only on execution
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"tri/ctx12/t23/w2/w3 stat tables must broadcast onto the trigram stream:\n${p.take(2000)}")
    // the stats tables are type-table-sized: a sort-merge on a word key
    // would funnel a hot word's whole occurrence stream into one partition
    assert(!"SortMergeJoin \\[w".r.findAllIn(p).hasNext,
      s"no word-keyed join may sort-merge:\n${p.take(2000)}")
  }

  test("q134 incremental span probe: the stored gram index never sorts or re-exchanges") {
    // the BENCH_INDEXSCALE lesson: a plain anti-join against the index
    // sorts/hash-builds the INDEX side per batch (4.16x wall across a 25x
    // index). The broadcast-probe form must keep every join on the index
    // path a BroadcastHashJoin — a SortMergeJoin here means the index is
    // being re-sorted per batch again
    val p = plan("q134_repeated_spans_incremental")
    assert(!p.contains("SortMergeJoin"),
      "index probe degraded to a sort-merge join:\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q158 media probe: the stored perceptual index never sorts or re-exchanges") {
    // the BENCH_INDEXSCALE probe-direction rule applied to the media
    // modality: the index-side join must be a BroadcastHashJoin with the
    // BATCH side built — a SortMergeJoin means the stored index is being
    // re-sorted per crawl batch. Guarded on the probe operator itself (the
    // q158 report wrapper adds batch-bounded outer joins that AQE resolves
    // by size, not by probe direction).
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions.col
    val hashed = Tables.documents(spark, sf).select(
      col("doc_id"), (col("doc_id") % 1024L).as("hi"), (col("doc_id") % 512L).as("lo"))
    val idx = Multimodal.buildMediaIndex(hashed.filter(col("doc_id") % 2 === 0),
      "doc_id", "hi", "lo", 32, 32, "img")
    val pairs = Multimodal.mediaIncrementalPairs(hashed.filter(col("doc_id") % 2 === 1),
      idx, "doc_id", "hi", "lo", 32, 32, "img")
    val p = pairs.queryExecution.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      "media index probe degraded to a sort-merge join:\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q164/q165 edit-distance probe: batch shingles broadcast, the trigram index never sorts or re-exchanges") {
    // the BENCH_INDEXSCALE probe direction on the character modality: the
    // candidate join must build the (small) batch shingle side and stream
    // the stored index — a SortMergeJoin anywhere in the probe means the
    // index re-sorts per batch. Guarded on the probe operator itself, and
    // again on a probe against an advanceEditIndex-advanced index (the
    // q165 chain must not change the shape).
    import graft.operators.Dedup
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val seen = docs.filter(col("doc_id") < 300)
    val batch = docs.filter(col("doc_id") >= 300)
    val idx = Dedup.buildEditIndex(seen, "doc_id", "text")
    def shape(p: String): Unit = {
      assert(!p.contains("SortMergeJoin"),
        "edit index probe degraded to a sort-merge join:\n" + p.take(3000))
      assert(p.contains("BroadcastHashJoin"), p.take(2000))
    }
    shape(Dedup.editDistanceIncremental(batch, seen, idx, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString)
    val idx2 = Dedup.advanceEditIndex(idx, batch, "doc_id", "text")
    shape(Dedup.editDistanceIncremental(
        batch.select((col("doc_id") + 5000000L).as("doc_id"), col("text")),
        seen.unionByName(batch), idx2, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString)
  }

  test("q160 edit distance: blocked candidates, never a cartesian DP") {
    // the whole point of the blocking stage: the Levenshtein DP must run
    // only on inverted-index candidates — a CartesianProduct here means
    // every doc pair pays O(maxEdits * len)
    val p = plan("q160_edit_distance_dedup")
    assert(!p.contains("CartesianProduct"), p.take(2000))
    assert(p.contains("levenshtein"),
      "the thresholded DP must appear in the plan:\n" + p.take(2000))
    // candidate pairs dedup BEFORE the texts join back (HashAggregate on
    // the pair keys upstream of the text joins)
    assert(p.contains("HashAggregate"), p.take(2000))
  }

  test("q146 token drift: per-source tables broadcast back, no cartesian product") {
    val p = plan("q146_token_drift")
    assert(p.contains("BroadcastHashJoin"),
      "totals/max tables must broadcast into the diff table:\n" + p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("q146 token drift: final plan re-tokenizes NOTHING past the checkpoint") {
    // the round-7 defect: `tot` derived from the UN-checkpointed join re-ran
    // both corpus-scale explode→count shuffles at the final action. With the
    // checkpoint at the corpus/type-table boundary the executed report plan
    // must contain zero Generate (explode) nodes and zero parquet scans —
    // every leaf is the checkpointed RDD
    val df = SparkEntry.queries("q146_token_drift")(spark, sf)
    df.collect() // finalize AQE so the string below is the EXECUTED plan
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Generate "),
      s"corpus re-tokenization leaked past the checkpoint:\n${p.take(2000)}")
    assert(!p.contains("FileScan"),
      "final report plan must read only the checkpointed diff table:\n" +
        p.take(2000))
  }

  test("q152 perplexity gate: windows run over the histogram, never one partition") {
    // the tertile cut must derive from the per-language HISTOGRAM — a
    // Window on a SinglePartition child means the corpus funneled through
    // one task (the q135 guard, applied to the gate)
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val exec = SparkEntry.queries("q152_perplexity_gate")(spark, sf)
      .queryExecution.executedPlan
    val bad = exec.collect {
      case w: WindowExec if w.child.outputPartitioning == SinglePartition => w
    }
    assert(bad.isEmpty, s"gate window collapsed to one partition: $bad")
  }

  test("c4Clean operator is a pure projection — no exchange of any kind") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val p = graft.operators.Curate.c4Clean(docs, "doc_id", "text", Seq("bad"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p.take(2000))
  }

  test("q135 curriculum rank: composed window — no Window or Sort on a single partition") {
    // the ordered composed rank (globalRowNumberOrdered) must keep the
    // global row number as bucketed windows + offsets; a Window or Sort
    // whose input is a SinglePartition exchange means the rank collapsed
    // to one task. (A scalar count(1) aggregate legitimately reduces to
    // SinglePartition — tiny data — so the guard targets Window/Sort only.)
    import org.apache.spark.sql.execution.SortExec
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    val exec = SparkEntry.queries("q135_curriculum_order")(spark, sf)
      .queryExecution.executedPlan
    val bad = exec.collect {
      case w: WindowExec if w.child.outputPartitioning == SinglePartition => w
      case s: SortExec if s.global &&
        s.child.outputPartitioning == SinglePartition => s
    }
    assert(bad.isEmpty,
      s"curriculum rank collapsed to a single partition: ${bad.map(_.nodeName)}\n" +
        exec.toString.take(3000))
  }

  test("q142 domain gate: stats join back broadcasts — the corpus side never shuffles for the join") {
    val p = plan("q142_domain_quality_gate")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q143 incremental simhash: batch broadcasts, the index never sorts or re-exchanges") {
    val p = plan("q143_simhash_incremental")
    assert(!p.contains("SortMergeJoin"),
      "index probe degraded to a sort-merge join:\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("q145 incremental cosine: batch broadcasts into both index scans, no sort-merge join") {
    // probe direction: batch bands broadcast into the bands-table scan,
    // then the batch-bounded candidate set broadcasts into the vecs-table
    // scan — the index never exchanges or sorts per batch
    val p = plan("q145_cosine_dup_incremental")
    assert(!p.contains("SortMergeJoin"),
      "index probe degraded to a sort-merge join:\n" + p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
  }

  test("late-data advances: tiered affected-set strategy — pushed isin, then broadcast, never an accidental sort-merge") {
    import org.apache.spark.sql.functions._
    import graft.operators.{Aggregates, Sessions}
    val ev = Tables.events(spark, sf)
    val wm = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val steps = Seq("a" -> (col("event_type") === "view"),
      "b" -> (col("event_type") === "click"),
      "c" -> (col("event_type") === "purchase"))
    val hist = ev.filter(col("ts") < lit(wm))
    val st = Aggregates.funnelAdvance(
      Aggregates.funnelEmptyState(spark, 3), hist,
      col("user_id"), col("ts"), steps).localCheckpoint()
    val late = ev.filter(col("ts") >= lit(wm) || col("event_id") % 97 === 0)

    // tier 1 (defaults, small late set): the rescan slices are PUSHABLE
    // isin filters — no semi/anti join exists at all
    val p1 = Aggregates.funnelAdvanceLate(st, late, hist,
        col("user_id"), col("ts"), steps, wm)
      .queryExecution.executedPlan.toString
    assert(!"Left(Semi|Anti)".r.findFirstIn(p1).isDefined,
      s"pushdown tier must slice with isin filters, not joins:\n" + p1.take(3000))
    assert(p1.contains("user_id#") && p1.contains(" IN "),
      s"pushdown tier lost its isin predicate:\n" + p1.take(3000))

    // tier 2 (maxPushdown = 0): the affected set BROADCASTS into every
    // state/history join; the plain fold's keyed state merge inside is
    // the operator's own documented shuffle and stays
    def lateJoinsBroadcast(p: String, tag: String): Unit = {
      assert(!"SortMergeJoin.*Left(Semi|Anti)".r.findFirstIn(p).isDefined,
        s"$tag: an affected-set join degraded to sort-merge:\n" + p.take(3000))
      assert("BroadcastHashJoin.*LeftAnti".r.findFirstIn(p).isDefined,
        s"$tag: state-side replace is not a broadcast anti-join:\n" + p.take(2000))
      assert("BroadcastHashJoin.*LeftSemi".r.findFirstIn(p).isDefined,
        s"$tag: entity-scoped rescan is not a broadcast semi-join:\n" + p.take(2000))
    }
    val pF = Aggregates.funnelAdvanceLate(st, late, hist,
        col("user_id"), col("ts"), steps, wm, maxPushdown = 0)
      .queryExecution.executedPlan.toString
    lateJoinsBroadcast(pF, "funnelAdvanceLate")
    val sSt = Sessions.advance(Sessions.emptyState(spark), hist,
      col("user_id"), col("ts"), col("value"), 1800L).localCheckpoint()
    val pS = Sessions.advanceLate(sSt, late, hist,
        col("user_id"), col("ts"), col("value"), 1800L, wm, maxPushdown = 0)
      .queryExecution.executedPlan.toString
    lateJoinsBroadcast(pS, "Sessions.advanceLate")

    // tier 3 (maxBroadcast = 0 too): a backfill-sized affected set must
    // never be FORCED to broadcast — the hint is withheld (Spark's own
    // size statistics may still pick BHJ for a genuinely small set, which
    // is exactly the adaptive behavior the fallback wants; what the tier
    // guarantees is no unconditional driver-side build)
    val q3 = Aggregates.funnelAdvanceLate(st, late, hist,
        col("user_id"), col("ts"), steps, wm,
        maxPushdown = 0, maxBroadcast = 0L)
    val l3 = q3.queryExecution.analyzed.toString
    assert(!l3.contains("ResolvedHint"),
      s"backfill tier must not hint a broadcast:\n" + l3.take(3000))
    val l2 = Aggregates.funnelAdvanceLate(st, late, hist,
        col("user_id"), col("ts"), steps, wm, maxPushdown = 0)
      .queryExecution.analyzed.toString
    assert(l2.contains("ResolvedHint"),
      s"broadcast tier lost its hint:\n" + l2.take(3000))
  }

  test("late-data rescan against a CLUSTERED parquet history: the isin slice reaches the scan as a pushed filter") {
    import org.apache.spark.sql.functions._
    import graft.operators.Aggregates
    val dir = java.nio.file.Files.createTempDirectory("graft_hist_clustered").toString
    val ev = Tables.events(spark, sf)
    val wm = java.sql.Timestamp.valueOf("2024-01-16 00:00:00")
    val steps = Seq("a" -> (col("event_type") === "view"),
      "b" -> (col("event_type") === "click"),
      "c" -> (col("event_type") === "purchase"))
    // history persisted clustered+sorted by entity — the layout the
    // scaladoc's pruning claim assumes (SinkV2 clusterBy/sortBy land the
    // same shape; plain parquet keeps the spec self-contained)
    ev.filter(col("ts") < lit(wm))
      .select("user_id", "ts", "event_type")
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts")
      .write.mode("overwrite").parquet(dir)
    val hist = spark.read.parquet(dir)
    val st = Aggregates.funnelAdvance(
      Aggregates.funnelEmptyState(spark, 3), hist,
      col("user_id"), col("ts"), steps).localCheckpoint()
    val lateUsers = ev.select("user_id").distinct().limit(3)
      .collect().map(_.getLong(0))
    val late = ev.filter(col("user_id").isin(lateUsers.toIndexedSeq: _*))
      .select("user_id", "ts", "event_type")
    val out = Aggregates.funnelAdvanceLate(st, late, hist,
      col("user_id"), col("ts"), steps, wm)
    val p = out.queryExecution.executedPlan.toString
    // the slice must reach the parquet scan as a PushedFilters In — that
    // is what prunes row groups/pages on the clustered layout at 100 TB
    assert("PushedFilters: \\[.*In\\(user_id".r.findFirstIn(p).isDefined,
      s"history rescan's isin did not push to the parquet scan:\n" + p.take(4000))
    // and the route stays EXACT: equals the from-scratch cascade state
    val full = Aggregates.funnelAdvance(
      Aggregates.funnelEmptyState(spark, 3),
      hist.unionByName(late), col("user_id"), col("ts"), steps)
    val a = out.orderBy("_e").collect().map(_.toString).toSeq
    val b = full.orderBy("_e").collect().map(_.toString).toSeq
    assert(a == b)
  }

  test("kmeansStatsAdvance: batch-only scan, k*dim-bounded state merge — never the corpus") {
    import org.apache.spark.sql.functions._
    import graft.operators.Features
    val emb = Tables.embeddings(spark, sf)
    val frozen = Features.kmeansCentroids(emb, "vec_id", "embedding", 4, 1)
    val st = Features.kmeansCellStats(emb, "vec_id", "embedding", frozen)
      .localCheckpoint()
    val batch = emb.limit(50)
    val df = Features.kmeansStatsAdvance(st, batch, "vec_id", "embedding", frozen)
    val p = df.queryExecution.executedPlan.toString
    // assignment is a pure broadcast-literal projection; the only hash
    // exchanges are the batch's (cell,pos) aggregate and the tiny
    // full-outer state merge
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3,
      s"$exchanges hash exchanges — the advance must not shuffle the corpus:\n" + p.take(3000))
  }

  test("q140 incremental IVF: append is a projection — no corpus shuffle before the probe join") {
    // frozen-quantizer assignment is a broadcast projection pass; the only
    // exchanges allowed are the cell-keyed probe join and the per-query
    // top-k window
    val p = plan("q140_ann_ivf_incremental")
    assert(!p.contains("SortMergeJoin"), p.take(3000))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges <= 3,
      s"$exchanges hash exchanges — assignment should not shuffle the corpus:\n" + p.take(3000))
  }
}
