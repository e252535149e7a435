package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Text
import graft.operators.Dedup

/** Text-analysis + deduplication queries over the documents table — the
  * training-data-pipeline slice: token counting, quality scoring, language
  * ID, exact dedup, n-gram Jaccard near-dup, MinHash-LSH and SimHash
  * candidates. All hash pipelines use engine-portable integer arithmetic
  * (PortableHash), so every query here — including MinHash and SimHash —
  * is verified against a DuckDB oracle that rebuilds the same pipeline.
  */
object TextQueries {

  /** Stopwords present in the fixture vocabulary. */
  val Stopwords: Seq[String] = Seq("the", "a")

  /** Marker sets for the language-ID heuristic (first wins ties). */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "fast", "slow"),
    "es" -> Seq("data", "row", "table"),
    "de" -> Seq("scan", "merge", "hash"))

  /** Corpus with deterministic duplicate rows injected: every doc reappears
    * with doc_id+1000000 — gives exact dedup and the LSH specs known dups. */
  def corpusWithClones(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs.unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
  }

  /** The ONE prefix-twin construction (first 40 tokens re-joined; token
    * re-join + re-split is identity on \s+-split text, so twin spans hash
    * equal) — q83's and q90's fixtures and their oracles' shared corpus CTE
    * all assume this exact shape, so it must not fork. */
  private def prefixTwins(docs: DataFrame, offset: Long): DataFrame =
    docs.filter(col("doc_id") % 2 === 0)
      .withColumn("doc_id", col("doc_id") + offset)
      .withColumn("text", array_join(slice(Text.tokens(col("text")), 1, 40), " "))

  /** Partial-duplication fixture: every even doc gets a twin holding only its
    * first 40 tokens — substring-level duplication with no whole-doc clone,
    * the case span-fraction scoring exists for. */
  def corpusWithPrefixClones(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    docs.unionByName(prefixTwins(docs, 1000000L))
  }

  /** Curation-funnel fixture: the corpus plus full clones (caught by exact
    * dedup) plus 40-token prefix twins of even docs (caught by the span
    * filter), all keeping their language. */
  def corpusForCuration(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir).select("doc_id", "text", "lang")
    docs
      .unionByName(docs.withColumn("doc_id", col("doc_id") + 1000000L))
      .unionByName(prefixTwins(docs, 2000000L))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The whole cleaning DAG as ONE verified funnel: exact dedup kills the
    // full clones, the span filter kills the prefix twins, the per-language
    // percentile cut and benchmark decontamination run on exactly the
    // populations that survive to them. Five hash-checked stage counts.
    // The PERSISTED form is the registered entry: each stage materializes
    // once (localCheckpoint) instead of the counts union re-deriving the
    // shared prefix per stage row — bit-identical results (TextDedupSpec
    // pins the equivalence). Bench note: at sf0.1 both forms sit near the
    // Σ-of-stage-costs floor (≈ q27+q83+q68+q74 ≈ 3.4 s — AQE exchange
    // reuse already deduped most of the lazy union's recompute); what the
    // persisted form buys is the GUARANTEE: no stage's scan/shuffle runs
    // more than once regardless of plan-reuse luck, which is the term that
    // multiplies with corpus size at 100 TB.
    "q90_curation_funnel" -> { (s, dir) =>
      graft.operators.Curate.funnelPersisted(corpusForCuration(s, dir),
          "doc_id", "text", "lang", Stopwords,
          evalPred = col("doc_id") % 50 === 0)
        .counts.orderBy("stage")
    },

    // C4-style line-level boilerplate removal: the corpus has no newlines,
    // so the fixture folds each document into 8-token lines and appends a
    // shared footer line to every even doc — the footer's doc-frequency
    // (~250) crosses the threshold and must vanish from every document
    // while genuine content lines survive in order. Both engines build
    // the identical fixture (q82's list-slice conventions).
    "q93_boilerplate_lines" -> { (s, dir) =>
      val lined = Tables.documents(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("__w"))
        .filter(size(col("__w")) > 0)
        .select(col("doc_id"),
          concat_ws("\n", transform(
            sequence(lit(0), floor((size(col("__w")) - 1) / 8).cast("int")),
            i => concat_ws(" ", slice(col("__w"), i * 8 + 1, lit(8))))).as("text"))
        .select(col("doc_id"),
          when(col("doc_id") % 2 === 0,
            concat(col("text"), lit("\nshared boilerplate footer line")))
            .otherwise(col("text")).as("text"))
      graft.operators.Dedup.dropBoilerplateLines(lined, "doc_id", "text",
          minDocFreq = 3L)
        .orderBy("doc_id")
    },

    // token counting: whitespace + BPE-ish regex tokens, per document.
    "q24_token_stats" -> { (s, dir) =>
      Tables.documents(s, dir).select(
          col("doc_id"),
          Text.tokenCount(col("text")).as("n_tokens"),
          Text.bpeishTokenCount(col("text")).as("n_bpeish"))
        .orderBy("doc_id")
    },

    // Corpus data-card report: per-source composition stats — the summary
    // table published alongside every training corpus. One aggregation
    // shuffle; the mean is an exact DECIMAL sum divided once (order-
    // independent, vs an avg() of doubles whose value depends on partition
    // order); the median is Spark's exact percentile ↔ DuckDB quantile_cont
    // (q48 parity convention).
    "q100_corpus_report" -> { (s, dir) =>
      import graft.functions.Rounding.roundLikeC
      val base = Tables.documents(s, dir).select(
        col("source"), col("lang"),
        Text.tokenCount(col("text")).as("n_tokens"),
        Text.qualityScore(col("text"), Stopwords).as("q"))
      base.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_tokens").cast("long")).as("total_tokens"),
          expr("percentile(n_tokens, 0.5D)").as("__p50"),
          sum(col("q").cast("decimal(18,4)")).as("__qsum"),
          sum(when(col("lang") === "en", 1L).otherwise(0L)).as("__en"))
        .select(col("source"), col("n_docs"), col("total_tokens"),
          roundLikeC(col("__p50"), 4).as("p50_tokens"),
          roundLikeC(col("__qsum").cast("double") / col("n_docs").cast("double"), 4)
            .as("mean_quality"),
          roundLikeC(col("__en").cast("double") / col("n_docs").cast("double"), 4)
            .as("pct_en"))
        .orderBy("source")
    },

    // HTML-to-text extraction: a deterministic fixture wraps each document
    // in a full page (title, style+script payloads containing < > &&, an
    // entity-laden footer incl. the double-encoded &amp;copy;) in BOTH
    // engines; extraction is a zero-shuffle projection. The script strip
    // must precede the tag strip — the payload's bare < > would otherwise
    // corrupt tag boundaries — and &amp; decodes LAST (single decode).
    "q99_html_extract" -> { (s, dir) =>
      val id = col("doc_id")
      val html = concat(
        lit("<html><head><title>Doc "), id.cast("string"),
        lit("</title><style type=\"text/css\">p { margin: 0; }</style>"),
        lit("<script>var n = 1 < 2 && 3 > 2;</script></head><body><h1>Doc "),
        id.cast("string"), lit("</h1><p>"), col("text"),
        lit("</p><p>Footer &amp;copy; example &lt;inc&gt; &quot;quoted&quot; &#39;q&#39;</p></body></html>"))
      Tables.documents(s, dir)
        .select(id.as("doc_id"), graft.functions.Html.toText(html).as("text"))
        .withColumn("n_chars", length(col("text")))
        .orderBy("doc_id")
    },

    // character entropy (compression-ratio proxy): the histogram is built
    // INSIDE the row (sorted char array -> run lengths), so the whole
    // query is a zero-shuffle projection; the float fold runs in
    // sorted-char order on both engines.
    "q98_char_entropy" -> { (s, dir) =>
      Tables.documents(s, dir).select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          Text.charEntropy(col("text")).as("entropy"))
        .orderBy("doc_id")
    },

    // quality scoring: length/punct/stopword heuristics blended.
    "q25_quality_scores" -> { (s, dir) =>
      Tables.documents(s, dir).select(
          col("doc_id"),
          length(col("text")).as("n_chars"),
          graft.functions.Rounding.roundLikeC(Text.punctRatio(col("text")), 4).as("punct_ratio"),
          graft.functions.Rounding.roundLikeC(
            Text.stopwordRatio(col("text"), Stopwords), 4).as("stopword_ratio"),
          Text.qualityScore(col("text"), Stopwords).as("quality"))
        .orderBy("doc_id")
    },

    // language-ID heuristic vs the metadata lang column.
    "q26_lang_id" -> { (s, dir) =>
      Tables.documents(s, dir).select(
          col("doc_id"), col("lang"),
          Text.langId(col("text"), LangMarkers).as("predicted_lang"))
        .orderBy("doc_id")
    },

    // exact dedup over the cloned corpus: survivor = min doc_id per hash.
    "q27_exact_dedup" -> { (s, dir) =>
      Dedup.exact(corpusWithClones(s, dir), "text", Seq(col("doc_id")))
        .select("doc_id", "fingerprint")
        .orderBy("doc_id")
    },

    // exact pairwise token-set Jaccard (the near-dup verifier).
    "q28_jaccard_pairs" -> { (s, dir) =>
      Dedup.jaccardPairs(
          Tables.documents(s, dir).filter(col("doc_id") < 300),
          "doc_id", "text", threshold = 0.8)
        .orderBy("id_a", "id_b")
    },

    // Bounded edit-distance near-dup pairs — the character-level dedup
    // member (typo fixes, date stamps, template fills): trigram-shingle
    // blocking -> |len gap| prefilter -> thresholded-Levenshtein verify.
    // Fixture plants three variant classes per base doc: a 1-char
    // substitution (edits=1), a 3-char append (edits=3, the boundary),
    // and an 11-char append (dropped by the sound length filter before
    // the DP ever runs).
    "q160_edit_distance_dedup" -> { (s, dir) =>
      val base = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select("doc_id", "text")
      val sub1 = base.filter(col("doc_id") % 5 === 0).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        concat(substring(col("text"), 1, 3), lit("Z"),
          expr("substring(text, 5)")).as("text"))
      val app3 = base.filter(col("doc_id") % 7 === 0).select(
        (col("doc_id") + 2000000L).as("doc_id"),
        concat(col("text"), lit(" zz")).as("text"))
      val far = base.filter(col("doc_id") % 11 === 0).select(
        (col("doc_id") + 3000000L).as("doc_id"),
        concat(col("text"), lit(" zzzzzzzzzz")).as("text"))
      val corpus = base.unionByName(sub1).unionByName(app3).unionByName(far)
      Dedup.editDistancePairs(corpus, "doc_id", "text", maxEdits = 3)
        .select(col("id_a"), col("id_b"), col("edits").cast("long").as("edits"))
        .orderBy("id_a", "id_b")
    },

    // Incremental edit-distance dedup — q160's character-level member
    // joins the incremental family: the seen corpus's trigram-hash index
    // is probed by the batch (seen docs read for the exact verify, never
    // re-shingled). Batch = fresh docs + planted seen-doc variants at
    // edits 1 and 3 (the boundary) and 11 (dropped by the length filter).
    "q164_edit_distance_incremental" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val seen = docs.filter(col("doc_id") < 300)
      val batch = docs.filter(col("doc_id") >= 300)
        .unionByName(seen.filter(col("doc_id") % 5 === 0).select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(substring(col("text"), 1, 3), lit("Z"),
            expr("substring(text, 5)")).as("text")))
        .unionByName(seen.filter(col("doc_id") % 7 === 0).select(
          (col("doc_id") + 2000000L).as("doc_id"),
          concat(col("text"), lit(" zz")).as("text")))
        .unionByName(seen.filter(col("doc_id") % 11 === 0).select(
          (col("doc_id") + 3000000L).as("doc_id"),
          concat(col("text"), lit(" zzzzzzzzzz")).as("text")))
      val idx = Dedup.buildEditIndex(seen, "doc_id", "text")
      Dedup.editDistanceIncremental(batch, seen, idx, "doc_id", "text",
          maxEdits = 3)
        .select(col("batch_id"), col("seen_id"),
          col("edits").cast("long").as("edits"))
        .orderBy("batch_id", "seen_id")
    },

    // Chained incremental edit-distance (the q138/q139/q155/q156 pattern on
    // the character modality — the last member of the incremental family to
    // get a driver-verified chain): batch 1 probes the seen trigram index
    // and plants 1-edit variants of seen docs; the index advances on
    // batch-1 survivors via the NAMED advanceEditIndex (survivor text
    // appended to seenDocs); batch 2 plants 3-edit variants of batch-1
    // FRESH docs — caught only via the advanced index + seenDocs.
    "q165_edit_distance_chain" -> { (s, dir) =>
      val d = Tables.documents(s, dir).select("doc_id", "text")
      val seen = d.filter(col("doc_id") < 300)
      val b1 = d.filter(col("doc_id") >= 300 && col("doc_id") < 400)
        .unionByName(seen.filter(col("doc_id") % 5 === 0).select(
          (col("doc_id") + 1000000L).as("doc_id"),
          concat(substring(col("text"), 1, 3), lit("Z"),
            expr("substring(text, 5)")).as("text")))
      val b2 = d.filter(col("doc_id") >= 400)
        .unionByName(d.filter(col("doc_id") >= 300 && col("doc_id") < 400 &&
            col("doc_id") % 4 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"),
            concat(col("text"), lit(" zz")).as("text")))
      val idx = Dedup.buildEditIndex(seen, "doc_id", "text")
      val p1 = Dedup.editDistanceIncremental(b1, seen, idx, "doc_id", "text",
          maxEdits = 3)
        .localCheckpoint() // 2 consumers: output union + survivor anti-join
      val survivors = b1.join(
        p1.select(col("batch_id").as("doc_id")).distinct(),
        Seq("doc_id"), "left_anti")
      val p2 = Dedup.editDistanceIncremental(b2,
        seen.unionByName(survivors),
        Dedup.advanceEditIndex(idx, survivors, "doc_id", "text"),
        "doc_id", "text", maxEdits = 3)
      p1.withColumn("batch", lit(1))
        .unionByName(p2.withColumn("batch", lit(2)))
        .select(col("batch"), col("batch_id"), col("seen_id"),
          col("edits").cast("long").as("edits"))
        .orderBy("batch", "batch_id", "seen_id")
    },

    // VERBATIM canary scan — the exact-substring member of the
    // decontamination family (q74 flags gram OVERLAP; this flags a
    // character-for-character eval string inside a training doc — the
    // test run for injected canaries and verbatim benchmark leaks, where
    // a single changed character must NOT flag). Canaries = 40-char
    // mid-doc slices of every 50th doc; the train side adds planted
    // leak docs that embed a canary from ANOTHER doc verbatim.
    //
    // Scale shape: the canary set is small by construction (canaries are
    // curated strings, not a corpus) — it BROADCASTS, and each train doc
    // pays O(n_canaries) substring searches in one codegen'd projection;
    // nothing corpus-sized shuffles before the per-doc aggregate. When
    // the needle set is itself corpus-scale, this is the wrong tool —
    // that regime is q74's inverted gram index.
    "q171_canary_scan" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      // full-length slices only: a doc shorter than the slice window would
      // yield a truncated (worst case EMPTY) canary, and contains('') is
      // true for every row — one short doc would silently flag the whole
      // corpus as contaminated. A canary that can't fill its window isn't
      // a canary.
      val canaries = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("canary_id"),
          substring(col("text"), 20, 40).as("s"))
        .filter(length(col("s")) === 40)
      val planted = docs.filter(col("doc_id") % 23 === 3)
        .withColumn("canary_id", (col("doc_id") % 10) * 50)
        .join(canaries, "canary_id")
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" "), col("s")).as("text"))
      val train = docs.unionByName(planted)
      val hits = train.crossJoin(broadcast(canaries))
        .filter(col("text").contains(col("s")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("__n"), min("canary_id").as("__mc"))
      train.select("doc_id").join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("__n").isNotNull.as("is_contaminated"),
          coalesce(col("__n"), lit(0L)).as("n_canaries"),
          col("__mc").as("min_canary_id"))
        .orderBy("doc_id")
    },

    // Canary PAIRS through the corpus-scale-needles path — q171's verdict
    // computed by Dedup.canaryPairs (bipartite interior-gram inverted
    // index + exact verbatim verify on candidates, short needles escaping
    // to the broadcast scan) instead of the all-pairs broadcast contains.
    // The pair set is PROVABLY identical to the contains scan (see the
    // canaryPairs scaladoc), so the oracle is the plain contains join —
    // the gram index is an optimization the oracle never needs to see.
    // Same fixture as q171: planted leak docs embed another doc's canary.
    "q172_canary_pairs" -> { (s, dir) =>
      import graft.operators.Dedup
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val canaries = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").as("canary_id"),
          substring(col("text"), 20, 40).as("s"))
        .filter(length(col("s")) === 40)
      val planted = docs.filter(col("doc_id") % 23 === 3)
        .withColumn("canary_id", (col("doc_id") % 10) * 50)
        .join(canaries, "canary_id")
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" "), col("s")).as("text"))
      val train = docs.unionByName(planted)
      Dedup.canaryPairs(train, canaries, "doc_id", "text", "canary_id", "s")
        .select(col("train_id").as("doc_id"),
          col("needle_id").as("canary_id"))
        .orderBy("doc_id", "canary_id")
    },

    // asymmetric sub-document containment |A∩B|/|A| over distinct word
    // 3-grams: the subset-duplicate detector symmetric Jaccard misses (an
    // excerpt embedded in a longer doc scores ~0 Jaccard, 1.0 containment).
    // Fixture: the prefix-twin corpus — every even doc's 40-token prefix
    // twin is containment-1.0 inside its original at every SF.
    "q141_containment_pairs" -> { (s, dir) =>
      val corpus = corpusWithPrefixClones(s, dir).filter(
        col("doc_id") < 300 ||
          (col("doc_id") >= 1000000L && col("doc_id") < 1000300L))
      Dedup.containmentPairs(corpus, "doc_id", "text", threshold = 0.9)
        .orderBy("id_sub", "id_super")
    },

    // Leakage-safe train/eval split: q50's cluster closure over a cloned
    // corpus, every CLUSTER assigned to a side by the mix2 hash rate —
    // a clone can never straddle the split (the contamination mode a
    // per-document random split is blind to).
    "q150_leakage_safe_split" -> { (s, dir) =>
      val base = Tables.documents(s, dir).filter(col("doc_id") < 300)
        .select("doc_id", "text")
      val corpus = base.unionByName(
        base.select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.8)
      graft.operators.Packing.leakageSafeSplit(corpus, "doc_id", pairs,
          evalFraction = 0.25)
        .orderBy("doc_id")
    },

    // Duplicate clusters: connected components over the q28 near-dup pairs
    // (min-label propagation, one shuffle per round); every doc labeled
    // with its cluster representative (min reachable doc_id).
    "q50_dup_clusters" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.8)
      Dedup.dupClusters(docs, "doc_id", pairs)
        .orderBy("doc_id")
    },

    // MinHash-LSH candidates over the cloned corpus. Every arithmetic step
    // (poly-31 shingle hash, mix2-derived hash family, banded signature
    // buckets) is engine-portable integer math, so the oracle rebuilds the
    // full pipeline — signatures, bands, bucket join — in DuckDB.
    "q29_minhash_candidates" -> { (s, dir) =>
      Dedup.minhashLshCandidates(corpusWithClones(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")
    },

    // Dedup-pipeline quality report: MinHash-LSH candidates measured
    // against the DESIGNED ground truth (every doc's +1000000 clone is a
    // true duplicate pair). One row: counts + precision/recall — the
    // regression gate to run whenever LSH knobs change.
    "q102_dedup_quality" -> { (s, dir) =>
      val cands = Dedup.minhashLshCandidates(corpusWithClones(s, dir), "doc_id", "text")
      val truth = Tables.documents(s, dir).select(col("doc_id").as("id_a"),
        (col("doc_id") + 1000000L).as("id_b"))
      graft.operators.Features.candidateQuality(cands, truth, "id_a", "id_b")
    },

    // Paragraph-grain global exact dedup: every repeated paragraph keeps
    // exactly its FIRST (doc, pos) occurrence corpus-wide; docs re-assemble
    // from survivors. Fixture synthesizes 3-paragraph docs (12-token head,
    // a shared viral paragraph, the remainder) in both engines.
    "q104_paragraph_dedup" -> { (s, dir) =>
      val paraDocs = Tables.documents(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("__w"))
        .filter(size(col("__w")) > 0)
        .select(col("doc_id"),
          concat_ws("\n\n",
            concat_ws(" ", slice(col("__w"), 1, 12)),
            lit("subscribe to our newsletter for updates"),
            concat_ws(" ", slice(col("__w"), 13, 1000000))).as("text"))
      Dedup.dropDuplicateParagraphs(paraDocs, "doc_id", "text")
        .orderBy("doc_id")
    },

    // SimHash near-dup pairs over the cloned corpus. The 60-bit fingerprint
    // is four 15-bit polynomial hashes with integer bit votes — the oracle
    // recomputes fingerprints, pigeonhole chunks, and hamming verification.
    "q30_simhash_pairs" -> { (s, dir) =>
      Dedup.simhashPairs(corpusWithClones(s, dir), "doc_id", "text")
        .orderBy("id_a", "id_b")
    },

    // Incremental SimHash: the batch's chunked signatures BROADCAST-probe
    // the persisted seen index on (chunk_idx, chunk) — seen docs are never
    // re-tokenized, per-batch cost is one index scan regardless of history
    // size. Batch plants exact clones of 20 seen docs (hamming 0).
    "q143_simhash_incremental" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val seen = d.filter(col("doc_id") < 350).select("doc_id", "text")
      val batch = d.filter(col("doc_id") >= 350).select("doc_id", "text")
        .unionByName(d.filter(col("doc_id") < 20)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val idx = Dedup.buildSimhashIndex(seen, "doc_id", "text")
      Dedup.simhashIncrementalPairs(batch, idx, "doc_id", "text")
        .orderBy("batch_id", "seen_id")
    },

    // Chained incremental SimHash (the q138/q139/q156 pattern on the
    // SimHash modality): batch 1 probes the seen chunk index, the index
    // advances on batch-1 survivors, batch 2 plants exact clones of
    // batch-1 fresh docs — caught only via the advanced index.
    "q155_simhash_incremental_chain" -> { (s, dir) =>
      val d = Tables.documents(s, dir)
      val seen = d.filter(col("doc_id") < 350).select("doc_id", "text")
      val b1 = d.filter(col("doc_id") >= 350 && col("doc_id") < 425)
        .select("doc_id", "text")
        .unionByName(d.filter(col("doc_id") < 20)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val b2 = d.filter(col("doc_id") >= 425).select("doc_id", "text")
        .unionByName(d.filter(col("doc_id") >= 350 && col("doc_id") < 425 &&
            col("doc_id") % 4 === 0)
          .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
      val idx = Dedup.buildSimhashIndex(seen, "doc_id", "text")
      val p1 = Dedup.simhashIncrementalPairs(b1, idx, "doc_id", "text")
        .localCheckpoint()
      val survivors = b1.join(
        p1.select(col("batch_id").as("doc_id")).distinct(), Seq("doc_id"), "left_anti")
      val p2 = Dedup.simhashIncrementalPairs(b2,
        Dedup.advanceSimhashIndex(idx, survivors, "doc_id", "text"),
        "doc_id", "text")
      p1.withColumn("batch", lit(1))
        .unionByName(p2.withColumn("batch", lit(2)))
        .orderBy("batch", "batch_id", "seen_id")
    },

    // Incremental MinHash-LSH: a batch of clones banded against the SEEN
    // corpus's persisted signature index — candidates are (batch, seen)
    // pairs only; the corpus is never re-shingled. Portable arithmetic →
    // full-pipeline oracle.
    "q72_minhash_incremental" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      val index = Dedup.bandedSignatures(docs, "doc_id", "text")
      val batch = docs.withColumn("doc_id", col("doc_id") + 1000000L)
      Dedup.minhashIncrementalCandidates(batch, index, "doc_id", "text")
        .orderBy("batch_id", "seen_id")
    },

    // Corpus curation composition: quality-score every document, then drop
    // the bottom decile PER LANGUAGE (percent_rank cut) — the standard
    // pre-training filter shape. One projection + one shuffle on lang.
    "q68_quality_filter" -> { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          Text.qualityScore(col("text"), Stopwords).as("quality"))
        .withColumn("pr", percent_rank().over(
          Window.partitionBy("lang").orderBy(col("quality"), col("doc_id"))))
        .filter(col("pr") >= 0.1)
        .select("doc_id", "lang", "quality")
        .orderBy("doc_id")
    },

    // Winnowing (MOSS) document fingerprints: word-3-gram rolling hashes,
    // window-of-4 minima, distinct per doc. Engine-portable hash — the
    // oracle reproduces it bit-for-bit in DuckDB.
    "q59_winnow_fingerprints" -> { (s, dir) =>
      Dedup.winnowFingerprints(
          Tables.documents(s, dir).filter(col("doc_id") < 200), "doc_id", "text")
        .orderBy("doc_id", "fp")
    },

    // Benchmark decontamination: training docs (doc_id % 50 != 0) sharing
    // any distinct word 3-gram with the held-out eval slice (% 50 == 0);
    // bipartite inverted-index join, eval side broadcast.
    "q74_decontaminate" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Dedup.decontaminationPairs(
          docs.filter(col("doc_id") % 50 =!= 0),
          docs.filter(col("doc_id") % 50 === 0),
          "doc_id", "text")
        .orderBy("train_id", "eval_id")
    },

    // Boilerplate mining: top-50 word-3-grams by document frequency (>= 3
    // docs); ties at the cut break by gram asc on both engines.
    "q75_repeated_ngrams" -> { (s, dir) =>
      Dedup.frequentNgrams(Tables.documents(s, dir), "doc_id", "text",
          k = 3, minDf = 3L, topN = 50)
        .orderBy(col("doc_freq").desc, col("gram"))
    },

    // Content-defined chunk dedup over the cloned corpus: poly-31 boundary
    // rule, repeated chunk texts with doc counts and keeper ids.
    "q76_cdc_chunk_dedup" -> { (s, dir) =>
      Dedup.chunkDedup(corpusWithClones(s, dir), "doc_id", "text")
        .orderBy("chunk")
    },

    // Unicode NFC ahead of fingerprinting: every doc gets a DECOMPOSED
    // accent suffix (e + combining acute, 2 codepoints); NFC composes it,
    // so the char count drops by one and the md5 is the composed form's —
    // the native UnicodeNormalize expression, proven cross-engine.
    "q88_unicode_nfc" -> { (s, dir) =>
      // explicit escape: "e" + U+0301 combining acute — the source file must
      // carry the DECOMPOSED sequence regardless of editor normalization
      val suffixed = concat(col("text"), lit(" cafe\u0301"))
      Tables.documents(s, dir).select(
          col("doc_id"),
          length(suffixed).as("len_raw"),
          length(Text.normalizeUnicode(suffixed)).as("len_nfc"),
          md5(Text.normalizeUnicode(suffixed)).as("fp_nfc"))
        .orderBy("doc_id")
    },

    // Per-doc duplicate-span fraction over the prefix-cloned corpus: even
    // docs' first two 20-token spans exist in their truncated twins, so the
    // score separates partial copies from clean docs without any whole-doc
    // fingerprint match.
    "q83_dup_span_frac" -> { (s, dir) =>
      Dedup.dupSpanFraction(corpusWithPrefixClones(s, dir), "doc_id", "text",
          spanTokens = 20, flagAt = 0.5)
        .orderBy("doc_id")
    },

    // BM25 top-20 for a fixed keyword query: one stats pass broadcast back
    // over the corpus, pure-projection score, TakeOrderedAndProject cut.
    "q77_bm25_topk" -> { (s, dir) =>
      graft.operators.Bm25.topK(Tables.documents(s, dir), "doc_id", "text",
        Bm25Terms, k = 20)
    },

    // Unigram-LM quality scoring: mean token NLL per document, summed with
    // an ORDERED fold so the float total is engine-reproducible.
    "q78_unigram_nll" -> { (s, dir) =>
      graft.operators.LmScore.unigramNll(Tables.documents(s, dir), "doc_id", "text")
        .orderBy("doc_id")
    },

    // q77's incremental twin: the BM25 corpus stats (N, Σlen, per-term df)
    // are ONE row of integer sums — a monoid — so each ingest batch folds
    // in by addition without rescanning the corpus (the incremental
    // search-index discipline). Top-20 scored from the state after each
    // fold; the oracle recomputes stats from both cumulative slices.
    "q204_incremental_bm25" -> { (s, dir) =>
      val bm = graft.operators.Bm25
      val docs = Tables.documents(s, dir)
      val st1 = bm.statsOf(docs.filter(col("doc_id") % 2 === 0),
        "text", Bm25Terms).localCheckpoint()
      val st2 = bm.statsAdvance(st1, docs.filter(col("doc_id") % 2 =!= 0),
        "text", Bm25Terms).localCheckpoint()
      def top(stats: org.apache.spark.sql.DataFrame, phase: String) =
        bm.scoreWith(docs, "doc_id", "text", Bm25Terms, stats)
          .orderBy(col("score").desc, col("doc_id")).limit(20)
          .withColumn("phase", lit(phase))
      top(st1, "1_after_b1").unionByName(top(st2, "2_after_b2"))
        .select("phase", "doc_id", "score")
        .orderBy(col("phase"), col("score").desc, col("doc_id"))
    }
  )

  /** q77 query terms (present in the fixture vocabulary). */
  val Bm25Terms: Seq[String] = Seq("table", "merge", "spark")

  /** The BM25 pipeline as DuckDB CTEs, ending in `sc(doc_id, raw)` — ONE
    * definition shared by the q77 oracle and q79's lexical leg (a change to
    * `Bm25.score`'s op order or constants is mirrored in exactly one
    * place). Identical IEEE op order to Bm25.score: ((idf * tf) * (k1+1)) /
    * (tf + k1*((1-b) + b*len/avglen)); all literals exact doubles; raw
    * (unrounded) score so callers replicate the raw-positivity filter. */
  /** One BM25 stats+score chain over the shared `w` tf projection, names
    * prefixed so q204 instantiates TWO stats slices (scoring ALL docs each
    * time) in one oracle; ends in `<p>sc(doc_id, raw)`. */
  private def bm25ChainOn(p: String, statsWhere: String): String =
    s"""${p}s AS (
       |  SELECT COUNT(*) AS n, SUM(dlen) AS sumlen,
       |         SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
       |         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
       |         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
       |  FROM w WHERE $statsWhere),
       |${p}p AS (
       |  SELECT doc_id,
       |         CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
       |           + CAST(0.75 AS DOUBLE) * CAST(dlen AS DOUBLE)
       |             / (CAST(sumlen AS DOUBLE) / CAST(n AS DOUBLE))) AS nrm,
       |         CAST(tf0 AS DOUBLE) AS d0, CAST(tf1 AS DOUBLE) AS d1, CAST(tf2 AS DOUBLE) AS d2,
       |         LN(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - df0 + CAST(0.5 AS DOUBLE)) / (df0 + CAST(0.5 AS DOUBLE))) AS idf0,
       |         LN(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - df1 + CAST(0.5 AS DOUBLE)) / (df1 + CAST(0.5 AS DOUBLE))) AS idf1,
       |         LN(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - df2 + CAST(0.5 AS DOUBLE)) / (df2 + CAST(0.5 AS DOUBLE))) AS idf2
       |  FROM w CROSS JOIN ${p}s),
       |${p}sc AS (
       |  SELECT doc_id,
       |         idf0 * d0 * CAST(2.2 AS DOUBLE) / (d0 + nrm)
       |             + idf1 * d1 * CAST(2.2 AS DOUBLE) / (d1 + nrm)
       |             + idf2 * d2 * CAST(2.2 AS DOUBLE) / (d2 + nrm) AS raw
       |  FROM ${p}p)""".stripMargin

  private[analytics] val Bm25OracleCtes: String =
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
      |w AS (
      |  SELECT doc_id, len(toks) AS dlen,
      |         len(list_filter(toks, x -> x = 'table')) AS tf0,
      |         len(list_filter(toks, x -> x = 'merge')) AS tf1,
      |         len(list_filter(toks, x -> x = 'spark')) AS tf2
      |  FROM t),
      |s AS (
      |  SELECT COUNT(*) AS n, SUM(dlen) AS sumlen,
      |         SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS df0,
      |         SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS df1,
      |         SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS df2
      |  FROM w),
      |p AS (
      |  SELECT doc_id,
      |         CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE)
      |           + CAST(0.75 AS DOUBLE) * CAST(dlen AS DOUBLE)
      |             / (CAST(sumlen AS DOUBLE) / CAST(n AS DOUBLE))) AS nrm,
      |         CAST(tf0 AS DOUBLE) AS d0, CAST(tf1 AS DOUBLE) AS d1, CAST(tf2 AS DOUBLE) AS d2,
      |         LN(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - df0 + CAST(0.5 AS DOUBLE)) / (df0 + CAST(0.5 AS DOUBLE))) AS idf0,
      |         LN(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - df1 + CAST(0.5 AS DOUBLE)) / (df1 + CAST(0.5 AS DOUBLE))) AS idf1,
      |         LN(CAST(1.0 AS DOUBLE) + (CAST(n AS DOUBLE) - df2 + CAST(0.5 AS DOUBLE)) / (df2 + CAST(0.5 AS DOUBLE))) AS idf2
      |  FROM w CROSS JOIN s),
      |sc AS (
      |  SELECT doc_id,
      |         idf0 * d0 * CAST(2.2 AS DOUBLE) / (d0 + nrm)
      |             + idf1 * d1 * CAST(2.2 AS DOUBLE) / (d1 + nrm)
      |             + idf2 * d2 * CAST(2.2 AS DOUBLE) / (d2 + nrm) AS raw
      |  FROM p)""".stripMargin

  def rowsOnly: Set[String] = Set.empty

  private val winnowOracle: String =
    """WITH w AS (
      |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
      |  FROM documents WHERE doc_id < 200),
      |kg AS (
      |  SELECT doc_id,
      |         list_transform(range(1, len(w) - 1),
      |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]) AS kg
      |  FROM w WHERE len(w) >= 3),
      |h AS (
      |  SELECT doc_id,
      |         list_transform(kg, g -> list_reduce(
      |           list_prepend(0::BIGINT,
      |             list_transform(range(1, length(g) + 1),
      |                            i -> ascii(substr(g, i, 1))::BIGINT)),
      |           (acc, x) -> (acc * 31 + x) % 1000000007)) AS h
      |  FROM kg),
      |m AS (
      |  SELECT doc_id,
      |         list_distinct(list_transform(range(1, len(h) - 2),
      |                                      j -> list_min(h[j:j+3]))) AS fps
      |  FROM h WHERE len(h) >= 4)
      |SELECT doc_id, unnest(fps) AS fp FROM m ORDER BY doc_id, fp""".stripMargin

  def oracleSql: Map[String, String] = Map(

    // Identical fixture (8-token lines via the q82 slice conventions +
    // even-doc footer), then the same global pipeline: line doc-frequency,
    // df >= 3 lines dropped, survivors re-joined in position order.
    // string_agg over zero kept rows is NULL where Spark's concat_ws over
    // an empty array is '' — coalesce pins the all-boilerplate-doc case.
    "q93_boilerplate_lines" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |s AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
        |lined AS (
        |  SELECT doc_id,
        |         array_to_string(list_transform(range(0, ((n-1)//8)+1),
        |           i -> array_to_string(w[i*8+1 : i*8+8], ' ')), chr(10))
        |         || CASE WHEN doc_id % 2 = 0
        |                 THEN chr(10) || 'shared boilerplate footer line'
        |                 ELSE '' END AS text
        |  FROM s),
        |l AS (
        |  SELECT doc_id, (i - 1)::INT AS pos, ls[i] AS line
        |  FROM (SELECT doc_id, ls, unnest(range(1, len(ls) + 1)) AS i
        |        FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM lined))),
        |freq AS (SELECT line, count(DISTINCT doc_id) AS df FROM l GROUP BY line),
        |keepl AS (SELECT l.doc_id, l.pos, l.line
        |          FROM l JOIN freq USING (line) WHERE freq.df < 3),
        |agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text,
        |               count(*) AS n_kept
        |        FROM keepl GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS nt FROM l GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.text, '') AS text,
        |       coalesce(a.n_kept, 0)::BIGINT AS n_kept,
        |       (t.nt - coalesce(a.n_kept, 0))::BIGINT AS n_dropped
        |FROM tot t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // The full funnel in SQL, each stage assembled from the proven oracle
    // fragments: q27's fingerprint dedup, q83's span fractions, q68's
    // quality percentile cut, q74's shingle decontamination.
    "q90_curation_funnel" ->
      """WITH base AS (SELECT doc_id, text, lang FROM documents),
        |corpus AS (
        |  SELECT doc_id, text, lang FROM base
        |  UNION ALL SELECT doc_id + 1000000, text, lang FROM base
        |  UNION ALL
        |  SELECT doc_id + 2000000,
        |         array_to_string((list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))[1:40], ' '),
        |         lang
        |  FROM base WHERE doc_id % 2 = 0),
        |fp AS (
        |  SELECT doc_id, text, lang,
        |         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS f
        |  FROM corpus),
        |s1 AS (
        |  SELECT doc_id, text, lang FROM fp
        |  QUALIFY row_number() OVER (PARTITION BY f ORDER BY doc_id) = 1),
        |tw AS (SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w FROM s1),
        |sp AS (
        |  SELECT doc_id, md5(array_to_string(w[ci*20+1 : ci*20+20], ' ')) AS sfp
        |  FROM (SELECT doc_id, w, unnest(range(0, ((len(w)-1)//20)+1)) AS ci
        |        FROM tw WHERE len(w) > 0)),
        |d AS (SELECT DISTINCT doc_id, sfp FROM sp),
        |ndf AS (SELECT sfp, count(*) AS ndocs FROM d GROUP BY sfp),
        |fracs AS (
        |  SELECT d.doc_id,
        |         sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END)::DOUBLE / count(*) AS frac
        |  FROM d JOIN ndf USING (sfp) GROUP BY d.doc_id),
        |s2 AS (SELECT s1.* FROM s1 JOIN fracs USING (doc_id) WHERE frac < 0.5),
        |t AS (
        |  SELECT doc_id, text, lang,
        |         length(text) AS n_chars,
        |         length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g')) AS n_punct,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM s2),
        |q AS (
        |  SELECT doc_id, text, lang,
        |         ROUND(LEAST(CAST(n_chars AS DOUBLE)/500.0, 1.0)*0.4
        |               + (1.0 - CASE WHEN n_chars > 0
        |                             THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END)*0.4
        |               + (1.0 - ABS(CASE WHEN len(toks) > 0
        |                                 THEN CAST(len(list_filter(toks, x -> x IN ('the','a'))) AS DOUBLE)/len(toks)
        |                                 ELSE 0.0 END - 0.1))*0.2, 4) AS quality
        |  FROM t),
        |r AS (
        |  SELECT *, percent_rank() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS pr
        |  FROM q),
        |s3 AS (SELECT doc_id, text, lang FROM r WHERE pr >= 0.1),
        |evt AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM corpus WHERE doc_id % 50 = 0),
        |trt AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM s3 WHERE doc_id % 50 <> 0),
        |evg AS (
        |  SELECT DISTINCT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END)) AS gram
        |  FROM evt),
        |trg AS (
        |  SELECT DISTINCT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END)) AS gram
        |  FROM trt),
        |bad AS (SELECT DISTINCT t.id FROM trg t JOIN evg e USING (gram)),
        |s4 AS (
        |  SELECT * FROM s3
        |  WHERE doc_id % 50 <> 0 AND doc_id NOT IN (SELECT id FROM bad))
        |SELECT 's0_input' AS stage, count(*)::BIGINT AS n_docs FROM corpus
        |UNION ALL SELECT 's1_exact_dedup', count(*)::BIGINT FROM s1
        |UNION ALL SELECT 's2_span_dedup', count(*)::BIGINT FROM s2
        |UNION ALL SELECT 's3_quality', count(*)::BIGINT FROM s3
        |UNION ALL SELECT 's4_decontaminated', count(*)::BIGINT FROM s4
        |ORDER BY stage""".stripMargin,

    // Full MinHash-LSH pipeline in SQL: word 3-shingles → poly-31 base hash
    // → 32 universal-hash minima (family (a,b) from the mix2 LCG, exactly
    // as Dedup.hashFamily derives them for seed 42) → 8 bands of 4 → bucket
    // key = poly-31 fold of the band slice mod 1e9+7 (the operator's
    // fixed-width long shuffle key) with the [2, 1000] bucket-size gate.
    "q29_minhash_candidates" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents),
        |t AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM corpus),
        |sh AS (
        |  SELECT id, CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END AS sh
        |  FROM t),
        |hv AS (
        |  SELECT id, list_transform(sh, g -> list_reduce(
        |      list_prepend(0::BIGINT, list_transform(range(1, length(g)+1), i -> ascii(substr(g,i,1))::BIGINT)),
        |      (acc,x) -> (acc*31+x) % 1000000007)) AS hv
        |  FROM sh),
        |fams AS (
        |  SELECT j,
        |    ((((42*131 + 2*j) % 2147483648) * 1664525 + 1013904223) % 2147483648 * 1103515245 + 12345) % 2147483648 % 1073741824 + 1 AS a,
        |    ((((42*131 + 2*j + 1) % 2147483648) * 1664525 + 1013904223) % 2147483648 * 1103515245 + 12345) % 2147483648 % 1073741824 AS b
        |  FROM (SELECT unnest(range(32)) AS j)),
        |mins AS (
        |  SELECT hv.id, f.j, MIN((f.a * h.h + f.b) % 4294967311) AS mn
        |  FROM hv, unnest(hv.hv) AS h(h), fams f
        |  GROUP BY hv.id, f.j),
        |sigs AS (
        |  SELECT id, list(mn ORDER BY j) AS sig FROM mins GROUP BY id),
        |banded AS (
        |  SELECT id, b.band,
        |         list_reduce(list_prepend(0::BIGINT, sig[b.band*4+1 : b.band*4+4]),
        |                     (acc,x) -> (acc*31+x) % 1000000007) AS bucket
        |  FROM sigs, (SELECT unnest(range(8)) AS band) b),
        |kept AS (
        |  SELECT id, band, bucket FROM (
        |    SELECT id, band, bucket, COUNT(*) OVER (PARTITION BY band, bucket) AS bsz
        |    FROM banded)
        |  WHERE bsz BETWEEN 2 AND 1000)
        |SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |FROM kept a JOIN kept b USING (band, bucket)
        |WHERE a.id < b.id
        |ORDER BY id_a, id_b""".stripMargin,

    // q102: the q29 candidate pipeline verbatim, measured against the
    // designed truth (each doc ↔ its +1000000 clone) with INTERSECT/EXCEPT
    // set algebra and 6dp C-rounded ratios.
    "q102_dedup_quality" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents),
        |t AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM corpus),
        |sh AS (
        |  SELECT id, CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END AS sh
        |  FROM t),
        |hv AS (
        |  SELECT id, list_transform(sh, g -> list_reduce(
        |      list_prepend(0::BIGINT, list_transform(range(1, length(g)+1), i -> ascii(substr(g,i,1))::BIGINT)),
        |      (acc,x) -> (acc*31+x) % 1000000007)) AS hv
        |  FROM sh),
        |fams AS (
        |  SELECT j,
        |    ((((42*131 + 2*j) % 2147483648) * 1664525 + 1013904223) % 2147483648 * 1103515245 + 12345) % 2147483648 % 1073741824 + 1 AS a,
        |    ((((42*131 + 2*j + 1) % 2147483648) * 1664525 + 1013904223) % 2147483648 * 1103515245 + 12345) % 2147483648 % 1073741824 AS b
        |  FROM (SELECT unnest(range(32)) AS j)),
        |mins AS (
        |  SELECT hv.id, f.j, MIN((f.a * h.h + f.b) % 4294967311) AS mn
        |  FROM hv, unnest(hv.hv) AS h(h), fams f
        |  GROUP BY hv.id, f.j),
        |sigs AS (
        |  SELECT id, list(mn ORDER BY j) AS sig FROM mins GROUP BY id),
        |banded AS (
        |  SELECT id, b.band,
        |         list_reduce(list_prepend(0::BIGINT, sig[b.band*4+1 : b.band*4+4]),
        |                     (acc,x) -> (acc*31+x) % 1000000007) AS bucket
        |  FROM sigs, (SELECT unnest(range(8)) AS band) b),
        |kept AS (
        |  SELECT id, band, bucket FROM (
        |    SELECT id, band, bucket, COUNT(*) OVER (PARTITION BY band, bucket) AS bsz
        |    FROM banded)
        |  WHERE bsz BETWEEN 2 AND 1000),
        |cands AS (
        |  SELECT DISTINCT a.id AS pa, b.id AS pb
        |  FROM kept a JOIN kept b USING (band, bucket)
        |  WHERE a.id < b.id),
        |truth AS (SELECT doc_id AS pa, doc_id + 1000000 AS pb FROM documents),
        |tp AS (SELECT pa, pb FROM cands INTERSECT SELECT pa, pb FROM truth),
        |c AS (
        |  SELECT (SELECT COUNT(*) FROM cands) AS n_candidates,
        |         (SELECT COUNT(*) FROM truth) AS n_truth,
        |         (SELECT COUNT(*) FROM tp) AS tp)
        |SELECT n_candidates, n_truth, tp,
        |       n_candidates - tp AS fp,
        |       n_truth - tp AS fn,
        |       CASE WHEN n_candidates > 0
        |            THEN ROUND(CAST(tp AS DOUBLE) / n_candidates, 6) + 0.0 ELSE 0.0 END AS precision,
        |       CASE WHEN n_truth > 0
        |            THEN ROUND(CAST(tp AS DOUBLE) / n_truth, 6) + 0.0 ELSE 0.0 END AS recall
        |FROM c""".stripMargin,

    // q104: paragraph explode with the q93 position idiom; survivor =
    // lexicographic-min (doc, pos) per paragraph, realized as min-doc then
    // min-pos within it; survivors re-join by their own coordinates.
    "q104_paragraph_dedup" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |f AS (
        |  -- coalesce matters: DuckDB array_to_string([]) is NULL, and a
        |  -- NULL tail would null the whole concat, silently dropping every
        |  -- <=12-token document (Spark concat_ws is ''-safe)
        |  SELECT doc_id,
        |         coalesce(array_to_string(w[1:12], ' '), '')
        |         || chr(10) || chr(10) || 'subscribe to our newsletter for updates'
        |         || chr(10) || chr(10) || coalesce(array_to_string(w[13:], ' '), '') AS text
        |  FROM t WHERE len(w) > 0),
        |p AS (
        |  SELECT doc_id, (i - 1)::INT AS pos, ps[i] AS para
        |  FROM (SELECT doc_id, ps, unnest(range(1, len(ps) + 1)) AS i
        |        FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS ps FROM f))),
        |sd AS (SELECT para, min(doc_id) AS sdoc FROM p GROUP BY para),
        |surv AS (
        |  SELECT p.para, p.doc_id, min(p.pos) AS spos
        |  FROM p JOIN sd ON p.para = sd.para AND p.doc_id = sd.sdoc
        |  GROUP BY p.para, p.doc_id),
        |keep AS (
        |  SELECT p.doc_id, p.pos, p.para
        |  FROM p JOIN (SELECT doc_id, spos AS pos FROM surv) s USING (doc_id, pos)),
        |agg AS (
        |  SELECT doc_id, string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text,
        |         count(*) AS n_kept
        |  FROM keep GROUP BY doc_id),
        |tot AS (SELECT doc_id, count(*) AS nt FROM p GROUP BY doc_id)
        |SELECT t.doc_id, coalesce(a.text, '') AS text,
        |       coalesce(a.n_kept, 0)::BIGINT AS n_kept,
        |       (t.nt - coalesce(a.n_kept, 0))::BIGINT AS n_dropped
        |FROM tot t LEFT JOIN agg a USING (doc_id)
        |ORDER BY t.doc_id""".stripMargin,

    // q72: the batch is a clone of the corpus, so signatures compute once;
    // seen-side hub cap (inert here: no bucket exceeds 1000) applies to the
    // index side only, exactly as the operator does.
    "q72_minhash_incremental" ->
      """WITH t AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (
        |  SELECT id, CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END AS sh
        |  FROM t),
        |hv AS (
        |  SELECT id, list_transform(sh, g -> list_reduce(
        |      list_prepend(0::BIGINT, list_transform(range(1, length(g)+1), i -> ascii(substr(g,i,1))::BIGINT)),
        |      (acc,x) -> (acc*31+x) % 1000000007)) AS hv
        |  FROM sh),
        |fams AS (
        |  SELECT j,
        |    ((((42*131 + 2*j) % 2147483648) * 1664525 + 1013904223) % 2147483648 * 1103515245 + 12345) % 2147483648 % 1073741824 + 1 AS a,
        |    ((((42*131 + 2*j + 1) % 2147483648) * 1664525 + 1013904223) % 2147483648 * 1103515245 + 12345) % 2147483648 % 1073741824 AS b
        |  FROM (SELECT unnest(range(32)) AS j)),
        |mins AS (
        |  SELECT hv.id, f.j, MIN((f.a * h.h + f.b) % 4294967311) AS mn
        |  FROM hv, unnest(hv.hv) AS h(h), fams f
        |  GROUP BY hv.id, f.j),
        |sigs AS (
        |  SELECT id, list(mn ORDER BY j) AS sig FROM mins GROUP BY id),
        |banded AS (
        |  SELECT id, b.band,
        |         list_reduce(list_prepend(0::BIGINT, sig[b.band*4+1 : b.band*4+4]),
        |                     (acc,x) -> (acc*31+x) % 1000000007) AS bucket
        |  FROM sigs, (SELECT unnest(range(8)) AS band) b),
        |seen AS (
        |  SELECT id AS seen_id, band, bucket FROM (
        |    SELECT id, band, bucket, COUNT(*) OVER (PARTITION BY band, bucket) AS bsz
        |    FROM banded)
        |  WHERE bsz <= 1000),
        |batchb AS (
        |  SELECT id + 1000000 AS batch_id, band, bucket FROM banded)
        |SELECT DISTINCT batch_id, seen_id
        |FROM batchb JOIN seen USING (band, bucket)
        |ORDER BY batch_id, seen_id""".stripMargin,

    // q143: the q30 signature chain keyed (side, id); pairs are the
    // seen-side × batch-side chunk join only.
    // q155: the q143 signature chain with THREE sides (seen 's', batch-1
    // 'x', batch-2 'y'); probe 1 = s×x, batch-1 survivors join the index
    // side, probe 2 = (s ∪ surviving x)×y — the advance rule replayed.
    "q155_simhash_incremental_chain" ->
      """WITH corpus AS (
        |  SELECT 's' AS side, doc_id, text FROM documents WHERE doc_id < 350
        |  UNION ALL
        |  SELECT 'x', doc_id, text FROM documents WHERE doc_id >= 350 AND doc_id < 425
        |  UNION ALL
        |  SELECT 'x', doc_id + 1000000, text FROM documents WHERE doc_id < 20
        |  UNION ALL
        |  SELECT 'y', doc_id, text FROM documents WHERE doc_id >= 425
        |  UNION ALL
        |  SELECT 'y', doc_id + 2000000, text FROM documents
        |  WHERE doc_id >= 350 AND doc_id < 425 AND doc_id % 4 = 0),
        |t AS (
        |  SELECT side, doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM corpus),
        |th AS (SELECT side, id, unnest(toks) AS tok FROM t),
        |hh AS (
        |  SELECT side, id, tok,
        |    (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*31+x) % 1000000007) % 32768) * 35184372088832
        |  + (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*131+x) % 1000000007) % 32768) * 1073741824
        |  + (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*137+x) % 1000000007) % 32768) * 32768
        |  + (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*139+x) % 1000000007) % 32768) AS h
        |  FROM th),
        |votes AS (
        |  SELECT side, id, b.bit,
        |         SUM(CASE WHEN (h // (1::BIGINT << b.bit)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM hh CROSS JOIN (SELECT unnest(range(60)) AS bit) b
        |  GROUP BY side, id, b.bit),
        |sig AS (
        |  SELECT side, id, SUM(CASE WHEN v > 0 THEN 1::BIGINT << bit ELSE 0 END) AS simhash
        |  FROM votes GROUP BY side, id),
        |chunked AS (
        |  SELECT side, id, simhash, c.c AS chunk_idx,
        |         (simhash // (1::BIGINT << (c.c * 15))) % 32768 AS chunk
        |  FROM sig, (SELECT unnest(range(4)) AS c) c),
        |p1 AS (
        |  SELECT batch_id, seen_id, hamming FROM (
        |    SELECT DISTINCT b.id AS batch_id, a.id AS seen_id,
        |           bit_count(xor(a.simhash, b.simhash)) AS hamming
        |    FROM chunked a JOIN chunked b USING (chunk_idx, chunk)
        |    WHERE a.side = 's' AND b.side = 'x')
        |  WHERE hamming <= 3),
        |surv AS (
        |  SELECT DISTINCT id FROM t WHERE side = 'x'
        |    AND id NOT IN (SELECT batch_id FROM p1)),
        |idx2 AS (
        |  SELECT id, simhash, chunk_idx, chunk FROM chunked WHERE side = 's'
        |  UNION ALL
        |  SELECT c.id, c.simhash, c.chunk_idx, c.chunk
        |  FROM chunked c JOIN surv ON c.id = surv.id
        |  WHERE c.side = 'x'),
        |p2 AS (
        |  SELECT batch_id, seen_id, hamming FROM (
        |    SELECT DISTINCT b.id AS batch_id, a.id AS seen_id,
        |           bit_count(xor(a.simhash, b.simhash)) AS hamming
        |    FROM idx2 a JOIN chunked b USING (chunk_idx, chunk)
        |    WHERE b.side = 'y')
        |  WHERE hamming <= 3)
        |SELECT 1 AS batch, batch_id, seen_id, hamming FROM p1
        |UNION ALL
        |SELECT 2 AS batch, batch_id, seen_id, hamming FROM p2
        |ORDER BY batch, batch_id, seen_id""".stripMargin,

    "q143_simhash_incremental" ->
      """WITH corpus AS (
        |  SELECT 's' AS side, doc_id, text FROM documents WHERE doc_id < 350
        |  UNION ALL
        |  SELECT 'b', doc_id, text FROM documents WHERE doc_id >= 350
        |  UNION ALL
        |  SELECT 'b', doc_id + 1000000, text FROM documents WHERE doc_id < 20),
        |t AS (
        |  SELECT side, doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM corpus),
        |th AS (SELECT side, id, unnest(toks) AS tok FROM t),
        |hh AS (
        |  SELECT side, id, tok,
        |    (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*31+x) % 1000000007) % 32768) * 35184372088832
        |  + (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*131+x) % 1000000007) % 32768) * 1073741824
        |  + (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*137+x) % 1000000007) % 32768) * 32768
        |  + (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*139+x) % 1000000007) % 32768) AS h
        |  FROM th),
        |votes AS (
        |  SELECT side, id, b.bit,
        |         SUM(CASE WHEN (h // (1::BIGINT << b.bit)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM hh CROSS JOIN (SELECT unnest(range(60)) AS bit) b
        |  GROUP BY side, id, b.bit),
        |sig AS (
        |  SELECT side, id, SUM(CASE WHEN v > 0 THEN 1::BIGINT << bit ELSE 0 END) AS simhash
        |  FROM votes GROUP BY side, id),
        |chunked AS (
        |  SELECT side, id, simhash, c.c AS chunk_idx,
        |         (simhash // (1::BIGINT << (c.c * 15))) % 32768 AS chunk
        |  FROM sig, (SELECT unnest(range(4)) AS c) c)
        |SELECT batch_id, seen_id, hamming FROM (
        |  SELECT DISTINCT b.id AS batch_id, a.id AS seen_id,
        |         bit_count(xor(a.simhash, b.simhash)) AS hamming
        |  FROM chunked a JOIN chunked b USING (chunk_idx, chunk)
        |  WHERE a.side = 's' AND b.side = 'b')
        |WHERE hamming <= 3
        |ORDER BY batch_id, seen_id""".stripMargin,

    // Full SimHash pipeline in SQL: 60-bit token hash (four 15-bit poly
    // hashes, bases 31/131/137/139), per-bit integer votes, 15-bit
    // pigeonhole chunks, bit_count(xor) hamming verification.
    "q30_simhash_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents),
        |t AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM corpus),
        |th AS (SELECT id, unnest(toks) AS tok FROM t),
        |hh AS (
        |  SELECT id, tok,
        |    (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*31+x) % 1000000007) % 32768) * 35184372088832
        |  + (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*131+x) % 1000000007) % 32768) * 1073741824
        |  + (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*137+x) % 1000000007) % 32768) * 32768
        |  + (list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1), i -> ascii(substr(tok,i,1))::BIGINT)), (acc,x) -> (acc*139+x) % 1000000007) % 32768) AS h
        |  FROM th),
        |votes AS (
        |  SELECT id, b.bit,
        |         SUM(CASE WHEN (h // (1::BIGINT << b.bit)) % 2 = 1 THEN 1 ELSE -1 END) AS v
        |  FROM hh CROSS JOIN (SELECT unnest(range(60)) AS bit) b
        |  GROUP BY id, b.bit),
        |sig AS (
        |  SELECT id, SUM(CASE WHEN v > 0 THEN 1::BIGINT << bit ELSE 0 END) AS simhash
        |  FROM votes GROUP BY id),
        |chunked AS (
        |  SELECT id, simhash, c.c AS chunk_idx,
        |         (simhash // (1::BIGINT << (c.c * 15))) % 32768 AS chunk
        |  FROM sig, (SELECT unnest(range(4)) AS c) c)
        |SELECT id_a, id_b, hamming FROM (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b,
        |         bit_count(xor(a.simhash, b.simhash)) AS hamming
        |  FROM chunked a JOIN chunked b USING (chunk_idx, chunk)
        |  WHERE a.id < b.id)
        |WHERE hamming <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    "q24_token_stats" ->
      """SELECT doc_id,
        |       len(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS n_tokens,
        |       len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpeish
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "q25_quality_scores" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         length(text) AS n_chars,
        |         length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g')) AS n_punct,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_chars,
        |         CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END AS pr,
        |         CASE WHEN len(toks) > 0
        |              THEN CAST(len(list_filter(toks, x -> x IN ('the','a'))) AS DOUBLE)/len(toks)
        |              ELSE 0.0 END AS sr
        |  FROM t)
        |SELECT doc_id, n_chars,
        |       ROUND(pr, 4) AS punct_ratio,
        |       ROUND(sr, 4) AS stopword_ratio,
        |       ROUND(LEAST(CAST(n_chars AS DOUBLE)/500.0, 1.0)*0.4
        |             + (1.0 - pr)*0.4
        |             + (1.0 - ABS(sr - 0.1))*0.2, 4) AS quality
        |FROM r
        |ORDER BY doc_id""".stripMargin,

    // The oracle builds the char histogram relationally (unnest + GROUP BY)
    // but accumulates the SAME k·ln(k) terms in the SAME sorted-char order
    // as the in-row Spark fold, then applies the same
    // (ln n − S/n)/ln 2 op sequence; ln(2) is the pinned literal, `+ 0.0`
    // normalizes the single-run -0.0 on both sides.
    // Shares q25's quality formula; mean via exact DECIMAL sum / count
    // (one division on both sides), median via quantile_cont (q48 parity).
    "q100_corpus_report" ->
      """WITH t AS (
        |  SELECT doc_id, source, lang, length(text) AS n_chars,
        |         length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g')) AS n_punct,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, source, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |         CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END AS pr,
        |         CASE WHEN len(toks) > 0
        |              THEN CAST(len(list_filter(toks, x -> x IN ('the','a'))) AS DOUBLE)/len(toks)
        |              ELSE 0.0 END AS sr,
        |         n_chars
        |  FROM t),
        |q AS (
        |  SELECT doc_id, source, lang, n_tokens,
        |         ROUND(LEAST(CAST(n_chars AS DOUBLE)/500.0, 1.0)*0.4
        |               + (1.0 - pr)*0.4 + (1.0 - ABS(sr - 0.1))*0.2, 4) AS quality
        |  FROM r)
        |SELECT source, COUNT(*) AS n_docs, SUM(n_tokens)::BIGINT AS total_tokens,
        |       ROUND(quantile_cont(n_tokens, 0.5), 4) AS p50_tokens,
        |       ROUND(CAST(SUM(CAST(quality AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 4) AS mean_quality,
        |       ROUND(CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 4) AS pct_en
        |FROM q GROUP BY source
        |ORDER BY source""".stripMargin,

    // Replays Html.toText step by step on the same synthesized page; DuckDB
    // regexp_replace needs the explicit 'g' flag (Spark's is always
    // global); the '-quote replacement uses CHR(39) to dodge SQL escaping.
    "q99_html_extract" ->
      """WITH f AS (
        |  SELECT doc_id,
        |         '<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
        |         '</title><style type="text/css">p { margin: 0; }</style>' ||
        |         '<script>var n = 1 < 2 && 3 > 2;</script></head><body><h1>Doc ' ||
        |         CAST(doc_id AS VARCHAR) || '</h1><p>' || text ||
        |         '</p><p>Footer &amp;copy; example &lt;inc&gt; &quot;quoted&quot; &#39;q&#39;</p></body></html>' AS html
        |  FROM documents),
        |s1 AS (SELECT doc_id, regexp_replace(html, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS x FROM f),
        |s2 AS (SELECT doc_id, regexp_replace(x, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS x FROM s1),
        |s3 AS (SELECT doc_id, regexp_replace(x, '<[^>]*>', ' ', 'g') AS x FROM s2),
        |s4 AS (SELECT doc_id,
        |         replace(replace(replace(replace(replace(x,
        |           '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', CHR(39)), '&amp;', '&') AS x
        |       FROM s3),
        |s5 AS (SELECT doc_id, trim(regexp_replace(x, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS text FROM s4)
        |SELECT doc_id, text, length(text)::INT AS n_chars
        |FROM s5 ORDER BY doc_id""".stripMargin,

    "q98_char_entropy" ->
      """WITH ch AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[^\n]')) AS c FROM documents),
        |cnt AS (SELECT doc_id, c, count(*) AS k FROM ch GROUP BY doc_id, c),
        |tot AS (SELECT doc_id, sum(k) AS n FROM cnt GROUP BY doc_id),
        |arr AS (SELECT doc_id,
        |               list(CAST(k AS DOUBLE) * LN(CAST(k AS DOUBLE)) ORDER BY c) AS terms
        |        FROM cnt GROUP BY doc_id),
        |e AS (
        |  SELECT a.doc_id,
        |         ROUND((LN(CAST(t.n AS DOUBLE))
        |                - list_reduce(list_prepend(CAST(0.0 AS DOUBLE), a.terms),
        |                              (acc, x) -> acc + x) / CAST(t.n AS DOUBLE))
        |               / 0.6931471805599453, 4) + 0.0 AS entropy
        |  FROM arr a JOIN tot t USING (doc_id))
        |SELECT d.doc_id, length(d.text)::INT AS n_chars, COALESCE(e.entropy, 0.0) AS entropy
        |FROM documents d LEFT JOIN e USING (doc_id)
        |ORDER BY doc_id""".stripMargin,

    "q26_lang_id" ->
      """WITH t AS (
        |  SELECT doc_id, lang, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |h AS (
        |  SELECT doc_id, lang,
        |         len(list_filter(toks, x -> x IN ('the','a','fast','slow'))) AS h_en,
        |         len(list_filter(toks, x -> x IN ('data','row','table'))) AS h_es,
        |         len(list_filter(toks, x -> x IN ('scan','merge','hash'))) AS h_de
        |  FROM t)
        |SELECT doc_id, lang,
        |       CASE WHEN h_en >= h_es AND h_en >= h_de THEN 'en'
        |            WHEN h_es >= h_de THEN 'es'
        |            ELSE 'de' END AS predicted_lang
        |FROM h
        |ORDER BY doc_id""".stripMargin,

    "q88_unicode_nfc" ->
      """SELECT doc_id,
        |       length(text || ' cafe' || chr(769))::INT AS len_raw,
        |       length(nfc_normalize(text || ' cafe' || chr(769)))::INT AS len_nfc,
        |       md5(nfc_normalize(text || ' cafe' || chr(769))) AS fp_nfc
        |FROM documents ORDER BY doc_id""".stripMargin,

    // Span fingerprints mirror the q82 chunking oracle (20-token windows,
    // stride = size); the prefix-clone corpus mirrors corpusWithPrefixClones.
    "q83_dup_span_frac" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         array_to_string((list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))[1:40], ' ')
        |  FROM documents WHERE doc_id % 2 = 0),
        |t AS (SELECT doc_id,
        |             list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |      FROM corpus),
        |s AS (SELECT doc_id, w, len(w) AS n FROM t WHERE len(w) > 0),
        |sp AS (
        |  SELECT doc_id, md5(array_to_string(w[ci*20+1 : ci*20+20], ' ')) AS fp
        |  FROM (SELECT doc_id, w, unnest(range(0, ((n-1)//20)+1)) AS ci FROM s)),
        |d AS (SELECT DISTINCT doc_id, fp FROM sp),
        |f AS (SELECT fp, count(*) AS ndocs FROM d GROUP BY fp),
        |agg AS (
        |  SELECT d.doc_id, count(*) AS n_spans,
        |         sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS n_dup_spans
        |  FROM d JOIN f USING (fp) GROUP BY d.doc_id)
        |SELECT doc_id, n_spans::BIGINT AS n_spans, n_dup_spans::BIGINT AS n_dup_spans,
        |       round(n_dup_spans::DOUBLE / n_spans, 6) AS dup_frac,
        |       n_dup_spans::DOUBLE / n_spans >= 0.5 AS is_dup
        |FROM agg ORDER BY doc_id""".stripMargin,

    "q27_exact_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents),
        |fp AS (
        |  SELECT doc_id,
        |         md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
        |  FROM corpus)
        |SELECT doc_id, fingerprint FROM fp
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) = 1
        |ORDER BY doc_id""".stripMargin,

    "q28_jaccard_pairs" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id AS id, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
        |  FROM documents WHERE doc_id < 300),
        |sizes AS (SELECT id, COUNT(*) AS n FROM toks GROUP BY id),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
        |  GROUP BY 1, 2)
        |SELECT id_a, id_b,
        |       ROUND(CAST(n_common AS DOUBLE)/(sa.n + sb.n - n_common), 4) AS jaccard
        |FROM inter
        |JOIN sizes sa ON sa.id = id_a
        |JOIN sizes sb ON sb.id = id_b
        |WHERE ROUND(CAST(n_common AS DOUBLE)/(sa.n + sb.n - n_common), 4) >= 0.8
        |ORDER BY id_a, id_b""".stripMargin,

    // q160: same variant synthesis; the q141 shingle CTE (with its
    // under-3-token fallback) generates candidates, the length gap
    // prefilters, plain levenshtein() verifies (DuckDB has no banded
    // variant — values agree on every surviving row).
    "q160_edit_distance_dedup" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 1, 3) || 'Z' || substr(text, 5)
        |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' zz'
        |  FROM documents WHERE doc_id % 7 = 0 AND doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 3000000, text || ' zzzzzzzzzz'
        |  FROM documents WHERE doc_id % 11 = 0 AND doc_id < 300),
        |t AS (
        |  SELECT doc_id AS id, text, length(text) AS len,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM corpus),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END) AS grams
        |  FROM t),
        |g AS (SELECT id, unnest(grams) AS gram FROM sh),
        |cand AS (
        |  SELECT DISTINCT a.id AS id_a, b.id AS id_b
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id),
        |v AS (
        |  SELECT c.id_a, c.id_b, levenshtein(ta.text, tb.text) AS edits
        |  FROM cand c
        |  JOIN t ta ON ta.id = c.id_a
        |  JOIN t tb ON tb.id = c.id_b
        |  WHERE abs(ta.len - tb.len) <= 3)
        |SELECT id_a, id_b, CAST(edits AS BIGINT) AS edits
        |FROM v WHERE edits <= 3
        |ORDER BY id_a, id_b""".stripMargin,

    // q164: the q160 variant synthesis restricted cross-side; candidates
    // via the SAME poly-31 trigram hash the stored index uses (a hash
    // collision adds the identical candidate in both engines), then the
    // length filter + plain levenshtein verify.
    "q164_edit_distance_incremental" ->
      """WITH seen AS (SELECT doc_id, text FROM documents WHERE doc_id < 300),
        |batch AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id >= 300
        |  UNION ALL
        |  SELECT doc_id + 1000000, substr(text, 1, 3) || 'Z' || substr(text, 5)
        |  FROM seen WHERE doc_id % 5 = 0
        |  UNION ALL
        |  SELECT doc_id + 2000000, text || ' zz' FROM seen WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT doc_id + 3000000, text || ' zzzzzzzzzz' FROM seen WHERE doc_id % 11 = 0),
        |st AS (
        |  SELECT doc_id AS id, text, length(text) AS len,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM seen),
        |bt AS (
        |  SELECT doc_id AS id, text, length(text) AS len,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM batch),
        |sg AS (
        |  SELECT DISTINCT id,
        |         list_reduce(list_prepend(0::BIGINT,
        |           list_transform(range(1, length(gram)+1), i -> ascii(substr(gram,i,1))::BIGINT)),
        |           (acc,x) -> (acc*31+x) % 1000000007) AS gh
        |  FROM (SELECT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |          THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |          ELSE [array_to_string(toks, ' ')] END)) AS gram FROM st)),
        |bg AS (
        |  SELECT DISTINCT id,
        |         list_reduce(list_prepend(0::BIGINT,
        |           list_transform(range(1, length(gram)+1), i -> ascii(substr(gram,i,1))::BIGINT)),
        |           (acc,x) -> (acc*31+x) % 1000000007) AS gh
        |  FROM (SELECT id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |          THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |          ELSE [array_to_string(toks, ' ')] END)) AS gram FROM bt)),
        |cand AS (
        |  SELECT DISTINCT b.id AS batch_id, s.id AS seen_id
        |  FROM bg b JOIN sg s ON b.gh = s.gh),
        |v AS (
        |  SELECT c.batch_id, c.seen_id, levenshtein(b.text, s.text) AS edits
        |  FROM cand c
        |  JOIN bt b ON b.id = c.batch_id
        |  JOIN st s ON s.id = c.seen_id
        |  WHERE abs(b.len - s.len) <= 3)
        |SELECT batch_id, seen_id, CAST(edits AS BIGINT) AS edits
        |FROM v WHERE edits <= 3
        |ORDER BY batch_id, seen_id""".stripMargin,

    // q171: identical slicing (both engines' substr/substring are
    // 1-based and character-counted), identical planted-leak synthesis,
    // contains() on both sides.
    "q171_canary_scan" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |c AS (
        |  SELECT doc_id AS canary_id, substr(text, 20, 40) AS s
        |  FROM docs WHERE doc_id % 50 = 0
        |    AND length(substr(text, 20, 40)) = 40),
        |planted AS (
        |  SELECT d.doc_id + 1000000 AS doc_id, d.text || ' ' || c.s AS text
        |  FROM docs d JOIN c ON c.canary_id = (d.doc_id % 10) * 50
        |  WHERE d.doc_id % 23 = 3),
        |train AS (SELECT * FROM docs UNION ALL SELECT * FROM planted),
        |hits AS (
        |  SELECT t.doc_id, COUNT(*) AS n, MIN(c.canary_id) AS mc
        |  FROM train t JOIN c ON contains(t.text, c.s)
        |  GROUP BY t.doc_id)
        |SELECT t.doc_id, h.doc_id IS NOT NULL AS is_contaminated,
        |       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_canaries,
        |       h.mc AS min_canary_id
        |FROM train t LEFT JOIN hits h ON t.doc_id = h.doc_id
        |ORDER BY t.doc_id""".stripMargin,

    // q172: the pair form of q171 — identical fixture, pairs instead of
    // the per-doc report. The oracle is the broadcast contains join; the
    // Spark side's gram-index routing is result-invisible by construction.
    "q172_canary_pairs" ->
      """WITH docs AS (SELECT doc_id, text FROM documents),
        |c AS (
        |  SELECT doc_id AS canary_id, substr(text, 20, 40) AS s
        |  FROM docs WHERE doc_id % 50 = 0
        |    AND length(substr(text, 20, 40)) = 40),
        |planted AS (
        |  SELECT d.doc_id + 1000000 AS doc_id, d.text || ' ' || c.s AS text
        |  FROM docs d JOIN c ON c.canary_id = (d.doc_id % 10) * 50
        |  WHERE d.doc_id % 23 = 3),
        |train AS (SELECT * FROM docs UNION ALL SELECT * FROM planted)
        |SELECT t.doc_id, c.canary_id
        |FROM train t JOIN c ON contains(t.text, c.s)
        |ORDER BY t.doc_id, c.canary_id""".stripMargin,

    // q165: the q164 probe rule chained over three sides (seen 's',
    // batch-1 'x', batch-2 'y') — the q155 shape on the character
    // modality. Probe 1 = s×x via the poly-31 trigram hash; batch-1
    // survivors join the index AND the text side; probe 2 =
    // (s ∪ surviving x)×y — the advanceEditIndex rule replayed.
    "q165_edit_distance_chain" ->
      """WITH corpus AS (
        |  SELECT 's' AS side, doc_id, text FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT 'x', doc_id, text FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 400
        |  UNION ALL
        |  SELECT 'x', doc_id + 1000000, substr(text, 1, 3) || 'Z' || substr(text, 5)
        |  FROM documents WHERE doc_id % 5 = 0 AND doc_id < 300
        |  UNION ALL
        |  SELECT 'y', doc_id, text FROM documents WHERE doc_id >= 400
        |  UNION ALL
        |  SELECT 'y', doc_id + 2000000, text || ' zz' FROM documents
        |  WHERE doc_id >= 300 AND doc_id < 400 AND doc_id % 4 = 0),
        |t AS (
        |  SELECT side, doc_id AS id, text, length(text) AS len,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM corpus),
        |g AS (
        |  SELECT DISTINCT side, id,
        |         list_reduce(list_prepend(0::BIGINT,
        |           list_transform(range(1, length(gram)+1), i -> ascii(substr(gram,i,1))::BIGINT)),
        |           (acc,x) -> (acc*31+x) % 1000000007) AS gh
        |  FROM (SELECT side, id, unnest(list_distinct(CASE WHEN len(toks) >= 3
        |          THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |          ELSE [array_to_string(toks, ' ')] END)) AS gram FROM t)),
        |p1 AS (
        |  SELECT batch_id, seen_id, edits FROM (
        |    SELECT c.batch_id, c.seen_id, levenshtein(b.text, s.text) AS edits
        |    FROM (SELECT DISTINCT b.id AS batch_id, s.id AS seen_id
        |          FROM g b JOIN g s ON b.gh = s.gh
        |          WHERE b.side = 'x' AND s.side = 's') c
        |    JOIN t b ON b.id = c.batch_id AND b.side = 'x'
        |    JOIN t s ON s.id = c.seen_id AND s.side = 's'
        |    WHERE abs(b.len - s.len) <= 3)
        |  WHERE edits <= 3),
        |surv AS (
        |  SELECT DISTINCT id FROM t WHERE side = 'x'
        |    AND id NOT IN (SELECT batch_id FROM p1)),
        |idx2 AS (
        |  SELECT id, gh FROM g WHERE side = 's'
        |  UNION ALL
        |  SELECT g.id, g.gh FROM g JOIN surv ON g.id = surv.id WHERE g.side = 'x'),
        |s2 AS (
        |  SELECT id, text, len FROM t WHERE side = 's'
        |  UNION ALL
        |  SELECT t.id, t.text, t.len FROM t JOIN surv ON t.id = surv.id
        |  WHERE t.side = 'x'),
        |p2 AS (
        |  SELECT batch_id, seen_id, edits FROM (
        |    SELECT c.batch_id, c.seen_id, levenshtein(b.text, s.text) AS edits
        |    FROM (SELECT DISTINCT b.id AS batch_id, s.id AS seen_id
        |          FROM g b JOIN idx2 s ON b.gh = s.gh WHERE b.side = 'y') c
        |    JOIN t b ON b.id = c.batch_id AND b.side = 'y'
        |    JOIN s2 s ON s.id = c.seen_id
        |    WHERE abs(b.len - s.len) <= 3)
        |  WHERE edits <= 3)
        |SELECT 1 AS batch, batch_id, seen_id, CAST(edits AS BIGINT) AS edits FROM p1
        |UNION ALL
        |SELECT 2 AS batch, batch_id, seen_id, CAST(edits AS BIGINT) AS edits FROM p2
        |ORDER BY batch, batch_id, seen_id""".stripMargin,

    "q141_containment_pairs" ->
      """WITH corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 1000000,
        |         array_to_string((list_filter(string_split_regex(trim(text), '\s+'), x -> x <> ''))[1:40], ' ')
        |  FROM documents WHERE doc_id % 2 = 0 AND doc_id < 300),
        |t AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM corpus),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END) AS grams
        |  FROM t),
        |g AS (SELECT id, unnest(grams) AS gram FROM sh),
        |sizes AS (SELECT id, COUNT(*) AS n FROM g GROUP BY id),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
        |  FROM g a JOIN g b ON a.gram = b.gram AND a.id < b.id
        |  GROUP BY 1, 2),
        |d AS (
        |  SELECT id_a AS id_sub, id_b AS id_super,
        |         ROUND(CAST(n_common AS DOUBLE)/sa.n, 4) AS containment
        |  FROM inter JOIN sizes sa ON sa.id = id_a
        |  UNION ALL
        |  SELECT id_b, id_a, ROUND(CAST(n_common AS DOUBLE)/sb.n, 4)
        |  FROM inter JOIN sizes sb ON sb.id = id_b)
        |SELECT id_sub, id_super, containment FROM d
        |WHERE containment >= 0.9
        |ORDER BY id_sub, id_super""".stripMargin,

    // q150: q50's recursive closure over the cloned slice, split by the
    // mix2 rate on the cluster id (floor(0.25 * 2^31) = 536870912)
    "q150_leakage_safe_split" ->
      """WITH RECURSIVE corpus AS (
        |  SELECT doc_id, text FROM documents WHERE doc_id < 300
        |  UNION ALL
        |  SELECT doc_id + 1000000, text FROM documents WHERE doc_id < 300),
        |toks AS (
        |  SELECT DISTINCT doc_id AS id, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
        |  FROM corpus),
        |sizes AS (SELECT id, COUNT(*) AS n FROM toks GROUP BY id),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM inter
        |  JOIN sizes sa ON sa.id = id_a
        |  JOIN sizes sb ON sb.id = id_b
        |  WHERE ROUND(CAST(n_common AS DOUBLE)/(sa.n + sb.n - n_common), 4) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM corpus
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src),
        |cl AS (SELECT id AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY id)
        |SELECT doc_id, cluster_id,
        |       CASE WHEN (((cluster_id % 2147483648) * 1664525 + 1013904223) % 2147483648
        |                  * 1103515245 + 12345) % 2147483648 < 536870912
        |            THEN 'eval' ELSE 'train' END AS split
        |FROM cl
        |ORDER BY doc_id""".stripMargin,

    // transitive closure via recursive CTE; cluster = min reachable node
    "q50_dup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT DISTINCT doc_id AS id, unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS tok
        |  FROM documents WHERE doc_id < 300),
        |sizes AS (SELECT id, COUNT(*) AS n FROM toks GROUP BY id),
        |inter AS (
        |  SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS n_common
        |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT id_a, id_b
        |  FROM inter
        |  JOIN sizes sa ON sa.id = id_a
        |  JOIN sizes sb ON sb.id = id_b
        |  WHERE ROUND(CAST(n_common AS DOUBLE)/(sa.n + sb.n - n_common), 4) >= 0.8),
        |edges AS (
        |  SELECT id_a AS src, id_b AS dst FROM pairs
        |  UNION
        |  SELECT id_b, id_a FROM pairs),
        |reach(id, r) AS (
        |  SELECT doc_id, doc_id FROM documents WHERE doc_id < 300
        |  UNION
        |  SELECT reach.id, e.dst FROM reach JOIN edges e ON reach.r = e.src)
        |SELECT id AS doc_id, MIN(r) AS cluster_id
        |FROM reach
        |GROUP BY id
        |ORDER BY doc_id""".stripMargin,

    "q59_winnow_fingerprints" -> winnowOracle,

    "q68_quality_filter" ->
      """WITH t AS (
        |  SELECT doc_id, lang,
        |         length(text) AS n_chars,
        |         length(lower(text)) - length(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g')) AS n_punct,
        |         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, lang,
        |         ROUND(LEAST(CAST(n_chars AS DOUBLE)/500.0, 1.0)*0.4
        |               + (1.0 - CASE WHEN n_chars > 0
        |                             THEN CAST(n_punct AS DOUBLE)/n_chars ELSE 0.0 END)*0.4
        |               + (1.0 - ABS(CASE WHEN len(toks) > 0
        |                                 THEN CAST(len(list_filter(toks, x -> x IN ('the','a'))) AS DOUBLE)/len(toks)
        |                                 ELSE 0.0 END - 0.1))*0.2, 4) AS quality
        |  FROM t),
        |r AS (
        |  SELECT *, percent_rank() OVER (PARTITION BY lang ORDER BY quality, doc_id) AS pr
        |  FROM q)
        |SELECT doc_id, lang, quality FROM r WHERE pr >= 0.1
        |ORDER BY doc_id""".stripMargin,

    // distinct word-3-grams per doc (q72's shingle CTE), bipartite
    // train×eval join on the gram, shared-gram count per pair
    "q74_decontaminate" ->
      """WITH t AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END) AS grams
        |  FROM t),
        |g AS (SELECT id, unnest(grams) AS gram FROM sh)
        |SELECT tr.id AS train_id, ev.id AS eval_id, COUNT(*) AS n_shared
        |FROM g tr JOIN g ev ON tr.gram = ev.gram
        |WHERE tr.id % 50 <> 0 AND ev.id % 50 = 0
        |GROUP BY 1, 2
        |HAVING COUNT(*) >= 1
        |ORDER BY train_id, eval_id""".stripMargin,

    "q75_repeated_ngrams" ->
      """WITH t AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |sh AS (
        |  SELECT id, list_distinct(CASE WHEN len(toks) >= 3
        |    THEN list_transform(range(1, len(toks)-1), i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
        |    ELSE [array_to_string(toks, ' ')] END) AS grams
        |  FROM t),
        |g AS (SELECT id, unnest(grams) AS gram FROM sh)
        |SELECT gram, COUNT(*) AS doc_freq
        |FROM g
        |GROUP BY gram
        |HAVING COUNT(*) >= 3
        |ORDER BY doc_freq DESC, gram
        |LIMIT 50""".stripMargin,

    // CDC chunking as a window: a token ends its chunk when its poly-31
    // hash is 0 mod 8; chunk_id = boundaries strictly before the position.
    "q76_cdc_chunk_dedup" ->
      """WITH t AS (
        |  SELECT doc_id AS id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |corpus AS (SELECT id, toks FROM t UNION ALL SELECT id + 1000000, toks FROM t),
        |tok AS (
        |  SELECT id, pos, tok,
        |         CASE WHEN list_reduce(
        |             list_prepend(0::BIGINT, list_transform(range(1, length(tok)+1),
        |                                                    i -> ascii(substr(tok,i,1))::BIGINT)),
        |             (acc, x) -> (acc*31 + x) % 1000000007) % 8 = 0
        |           THEN 1 ELSE 0 END AS b
        |  FROM (SELECT id, unnest(toks) AS tok, generate_subscripts(toks, 1) AS pos
        |        FROM corpus)),
        |ch AS (
        |  SELECT id, pos, tok,
        |         COALESCE(SUM(b) OVER (PARTITION BY id ORDER BY pos
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_id
        |  FROM tok),
        |chunks AS (
        |  SELECT id, chunk_id, string_agg(tok, ' ' ORDER BY pos) AS chunk
        |  FROM ch GROUP BY id, chunk_id)
        |SELECT chunk, COUNT(DISTINCT id) AS n_docs, MIN(id) AS keeper
        |FROM chunks
        |WHERE chunk <> ''
        |GROUP BY chunk
        |HAVING COUNT(DISTINCT id) >= 2
        |ORDER BY chunk""".stripMargin,

    // identical IEEE op order to Bm25.score (see Bm25OracleCtes)
    "q77_bm25_topk" ->
      s"""$Bm25OracleCtes
         |SELECT doc_id, ROUND(raw, 4) AS score FROM sc
         |WHERE raw > 0
         |ORDER BY score DESC, doc_id
         |LIMIT 20""".stripMargin,

    // The chained incremental-BM25 oracle: stats recomputed from both
    // cumulative slices, all docs scored against each — equality with the
    // engine's folded 1-row state is the advance ≡ recompute proof.
    "q204_incremental_bm25" ->
      s"""WITH t AS (
         |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS toks FROM documents),
         |w AS (
         |  SELECT doc_id, len(toks) AS dlen,
         |         len(list_filter(toks, x -> x = 'table')) AS tf0,
         |         len(list_filter(toks, x -> x = 'merge')) AS tf1,
         |         len(list_filter(toks, x -> x = 'spark')) AS tf2
         |  FROM t),
         |${bm25ChainOn("u", "doc_id % 2 = 0")},
         |${bm25ChainOn("v", "TRUE")}
         |SELECT phase, doc_id, score FROM (
         |  SELECT '1_after_b1' AS phase, doc_id, score FROM (
         |    SELECT doc_id, ROUND(raw, 4) AS score FROM usc
         |    WHERE raw > 0 ORDER BY score DESC, doc_id LIMIT 20)
         |  UNION ALL
         |  SELECT '2_after_b2', doc_id, score FROM (
         |    SELECT doc_id, ROUND(raw, 4) AS score FROM vsc
         |    WHERE raw > 0 ORDER BY score DESC, doc_id LIMIT 20))
         |ORDER BY phase, score DESC, doc_id""".stripMargin,

    // same ordered fold as LmScore.unigramNll: nll list in pos order,
    // list_reduce left fold seeded with 0.0, divide by n, round 4dp
    "q78_unigram_nll" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks FROM documents),
        |tok AS (
        |  SELECT doc_id, generate_subscripts(toks, 1) - 1 AS pos, unnest(toks) AS tok
        |  FROM t),
        |c AS (SELECT tok, COUNT(*) AS cnt FROM tok GROUP BY tok),
        |tot AS (SELECT COUNT(*) AS total FROM tok),
        |j AS (
        |  SELECT doc_id, pos,
        |         -LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE)) AS nll
        |  FROM tok JOIN c USING (tok) CROSS JOIN tot),
        |a AS (SELECT doc_id, list(nll ORDER BY pos) AS arr FROM j GROUP BY doc_id)
        |SELECT doc_id, CAST(len(arr) AS INT) AS n_tokens,
        |       ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), arr),
        |                         (acc, x) -> acc + x) / CAST(len(arr) AS DOUBLE), 4) AS avg_nll
        |FROM a
        |ORDER BY doc_id""".stripMargin
  )
}
