package graft

import org.apache.spark.sql.functions._
import graft.analytics.TextQueries
import graft.functions.Text
import graft.operators.Dedup

/** Text-analysis expressions: token counts, ratios, quality, lang-ID. */
class TextSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount and bpeishTokenCount") {
    val df = Seq("the fast  join", "ab, cd 12", "x").toDF("t")
      .select(Text.tokenCount(col("t")).as("w"), Text.bpeishTokenCount(col("t")).as("b"))
    assert(df.as[(Int, Int)].collect().toSeq === Seq((3, 3), (3, 4), (1, 1)))
  }

  test("Html.toText: script/style payloads dropped whole, entities decode once, whitespace collapses") {
    val cases = Seq(
      // script body with bare < > && must vanish BEFORE tag stripping
      "<p>a</p><script>if (1 < 2 && 3 > 2) x();</script><p>b</p>" -> "a b",
      "<STYLE>p > em { color: red }</STYLE>hello" -> "hello",
      // &amp; decodes LAST: &amp;lt; -> &lt; (one decode, not <)
      "x &amp;lt; y &lt; z" -> "x &lt; y < z",
      "&quot;q&quot; &#39;s&#39; a&amp;b" -> "\"q\" 's' a&b",
      "  <div> spaced \n out </div>  " -> "spaced out",
      "no markup at all" -> "no markup at all")
    val got = cases.map(_._1).toDF("h")
      .select(graft.functions.Html.toText(col("h")).as("t")).as[String].collect().toSeq
    assert(got === cases.map(_._2))
  }

  test("charEntropy: 0 for one repeated char, log2(k) for uniform k chars, 0 for empty") {
    val df = Seq("aaaa", "abab", "abcdabcd", "", "aab").toDF("t")
      .select(Text.charEntropy(col("t")).as("e"))
    val got = df.as[Double].collect().toSeq
    // uniform over k chars -> log2(k) exactly at these sizes
    assert(got(0) === 0.0 && got(1) === 1.0 && got(2) === 2.0 && got(3) === 0.0)
    // 2/3,1/3 mix: -(2/3·log2(2/3) + 1/3·log2(1/3)) ≈ 0.9183
    assert(got(4) === 0.9183)
    assert(!got.exists(e => e.toString.startsWith("-")), "never -0.0")
  }

  test("charEntropy counts every char except \\n — CR and U+2028 included (RE2 parity)") {
    // '[^\n]' (not '.') is the contract both engines share: Java '.' would
    // skip \r and U+2028 while DuckDB's RE2 '.' keeps them — the chars must
    // COUNT here or CRLF documents break q98's oracle parity
    val df = Seq("a\r\nb", "a" + 0x2028.toChar + "b").toDF("t")
      .select(Text.charEntropy(col("t")).as("e"))
    val got = df.as[Double].collect().toSeq
    // "a\r\nb": histogram {a, \r, b} uniform over 3 -> log2(3) ≈ 1.585
    assert(got(0) === 1.585, s"CR must be histogrammed: ${got(0)}")
    // "a\\u2028b": {a, U+2028, b} -> log2(3) too
    assert(got(1) === 1.585, s"U+2028 must be histogrammed: ${got(1)}")
  }

  test("Html.toText collapses vertical tab like the oracle's explicit class") {
    // Java \s includes \x0B, RE2's does not; the spelled-out class means
    // both engines collapse it
    val got = Seq("a" + 0x0B.toChar + "b").toDF("h")
      .select(graft.functions.Html.toText(col("h")).as("t")).as[String].collect()
    assert(got.head === "a b")
  }

  test("charEntropy query is a zero-shuffle projection") {
    val p = Tables.documents(spark, sf)
      .select(col("doc_id"), Text.charEntropy(col("text")).as("e"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"entropy must not shuffle:\n${p.take(1500)}")
  }

  test("normalizeUnicode: NFC composes, NFD decomposes, dedup fingerprints converge") {
    val decomposed = "cafe\u0301"  // e + combining acute, 5 codepoints
    val composed = "caf\u00e9"     // é, 4 codepoints
    val df = Seq((decomposed, composed)).toDF("d", "c")
    val row = df.select(
      Text.normalizeUnicode(col("d")).as("nfc_d"),
      Text.normalizeUnicode(col("c")).as("nfc_c"),
      Text.normalizeUnicode(col("c"), "NFD").as("nfd_c"),
      length(col("d")).as("lr"),
      length(Text.normalizeUnicode(col("d"))).as("ln"))
      .as[(String, String, String, Int, Int)].head()
    assert(row._1 === composed && row._2 === composed, "NFC must compose both spellings")
    assert(row._3 === decomposed, "NFD must decompose")
    assert(row._4 === 5 && row._5 === 4)
    // the dedup motivation: same visible text, one fingerprint after NFC
    val fps = Seq((1L, decomposed), (2L, composed)).toDF("doc_id", "text")
      .select(Text.fingerprint(Text.normalizeUnicode(col("text"))).as("fp"))
      .as[String].collect()
    assert(fps.distinct.length === 1, "NFC must unify composed/decomposed fingerprints")
    // null passthrough + bad form fails at construction
    assert(df.select(Text.normalizeUnicode(lit(null).cast("string"))).head().isNullAt(0))
    intercept[IllegalArgumentException] { Text.normalizeUnicode(col("d"), "NFX") }
  }

  test("empty and whitespace-only text has ZERO tokens, not one phantom") {
    val counts = Seq("", "   ", "\t\n", "a").toDF("t")
      .select(Text.tokenCount(col("t")).as("n")).as[Int].collect().toSeq
    assert(counts === Seq(0, 0, 0, 1))
    // quality metrics on blank rows: no divide-by-phantom, no lang vote
    val s = Seq("").toDF("t")
      .select(Text.stopwordRatio(col("t"), Seq("a")).as("s")).as[Double].head()
    assert(s === 0.0)
    val l = Seq("").toDF("t")
      .select(Text.langId(col("t"), TextQueries.LangMarkers).as("l")).as[String].head()
    assert(l === TextQueries.LangMarkers.head._1) // zero votes everywhere -> first
  }

  test("punctRatio and stopwordRatio") {
    val df = Seq("a, b!").toDF("t").select(Text.punctRatio(col("t")).as("p"))
    assert(math.abs(df.as[Double].head() - 2.0 / 5.0) < 1e-12)
    val s = Seq("a b c a").toDF("t")
      .select(Text.stopwordRatio(col("t"), Seq("a")).as("s")).as[Double].head()
    assert(math.abs(s - 0.5) < 1e-12)
  }

  test("qualityScore stays in [0,1]") {
    val scores = Tables.documents(spark, sf)
      .select(Text.qualityScore(col("text"), TextQueries.Stopwords).as("q"))
      .as[Double].collect()
    assert(scores.nonEmpty && scores.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("langId: highest marker count wins, first language wins ties") {
    val df = Seq(
      "the fast scan",       // en 2, de 1 → en
      "data row merge hash", // es 2, de 2 → tie → es? no: en=0, es=2, de=2 → first-listed max is es... order in LangMarkers: en, es, de → es wins
      "scan merge hash"      // de 3 → de
    ).toDF("t").select(Text.langId(col("t"), TextQueries.LangMarkers).as("l"))
    assert(df.as[String].collect().toSeq === Seq("en", "es", "de"))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("A  b C", "a b c")).toDF("x", "y")
      .select((Text.fingerprint(col("x")) === Text.fingerprint(col("y"))).as("eq"))
    assert(df.as[Boolean].head())
  }

  test("RRF fusion: both-lists beats one-list; absent contributes zero; exact terms") {
    import graft.operators.Rrf
    val lex = Seq((10L, 3.0), (11L, 2.0), (12L, 1.0)).toDF("doc_id", "score")
    val sem = Seq((10L, 0.9), (13L, 0.8)).toDF("doc_id", "score")
    val fused = Rrf.fuse(Seq(
        Rrf.ranked(lex, "doc_id", "score"),
        Rrf.ranked(sem, "doc_id", "score")), "doc_id", k = 60, topN = 10)
      .as[(Long, Double)].collect().toSeq
    def t(r: Int) = 1.0 / (60.0 + r)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    // doc 10: rank 1 in both; doc 11: lex rank 2 only; doc 13: sem rank 2 only
    assert(fused.head === ((10L, r6(t(1) + t(1)))))
    assert(fused.toMap.apply(11L) === r6(t(2) + 0.0))
    assert(fused.toMap.apply(13L) === r6(0.0 + t(2)))
    // both-lists presence dominates any single-list rank here
    assert(fused.map(_._1).head === 10L && fused.length === 4)
  }

  test("unigram NLL: uniform corpus scores ln(2); rare tokens score higher") {
    import graft.operators.LmScore
    val uniform = Seq((1L, "a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = LmScore.unigramNll(uniform, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Int, Double)].collect().toSeq
    // counts: a=2, b=2, total=4 -> every token p=0.5, nll=ln 2
    val ln2 = math.round(math.log(2.0) * 1e4) / 1e4
    assert(got === Seq((1L, 3, ln2), (2L, 1, ln2)))

    val skewed = Seq((1L, "a a a a"), (2L, "a z")).toDF("doc_id", "text")
    val s = LmScore.unigramNll(skewed, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Int, Double)].collect()
    assert(s(1)._3 > s(0)._3, "the rare-token doc must score higher NLL")
  }

  test("BM25: more matching terms rank higher, saturation caps tf, zero scores drop") {
    import graft.operators.Bm25
    val docs = Seq(
      (1L, "table merge spark"),            // all three terms
      (2L, "table merge other words here"), // two terms
      (3L, "table alone with filler text"), // one term
      (4L, "table table table table table table table table"), // tf saturates
      (5L, "nothing relevant at all"))      // zero -> dropped
      .toDF("doc_id", "text")
    val terms = Seq("table", "merge", "spark")
    val got = Bm25.topK(docs, "doc_id", "text", terms, k = 10)
      .as[(Long, Double)].collect()
    assert(!got.map(_._1).contains(5L))
    val rank = got.map(_._1).toSeq
    // doc1 covers all terms and is shortest -> top; term coverage beats
    // repeating one term (BM25's tf saturation): doc4's 8x "table" cannot
    // outrank doc2's two distinct terms
    assert(rank.head === 1L)
    assert(rank.indexOf(2L) < rank.indexOf(4L))
    assert(rank.indexOf(4L) < rank.indexOf(3L) || got.length === 4)
    // scores strictly ordered desc with doc_id tiebreak
    assert(got.sortBy(r => (-r._2, r._1)).toSeq === got.toSeq)
  }
}

/** Dedup operators: exact, Jaccard verifier, MinHash-LSH, SimHash. */
class CanaryScanSpec extends SparkSpec {
  import spark.implicits._

  test("q171 rule: a verbatim canary flags; one changed character does not") {
    val canary = "the quick brown fox jumps over the lazy dog"
    val canaries = Seq((0L, canary)).toDF("canary_id", "s")
    val train = Seq(
      (1L, s"prefix $canary suffix"),                    // verbatim -> flags
      (2L, "prefix " + canary.replace('q', 'Q') + " suffix"), // 1 char off -> clean
      (3L, canary)).toDF("doc_id", "text")               // the canary itself
    val hits = train.crossJoin(broadcast(canaries))
      .filter(col("text").contains(col("s")))
      .select("doc_id").as[Long].collect().toSet
    assert(hits === Set(1L, 3L),
      s"exact-substring semantics must be character-exact: $hits")
  }

  test("q171 length floor: a short doc's truncated canary never floods the corpus") {
    // q171 slices substring(text, 20, 40) and keeps ONLY full-length
    // slices — a sub-20-char doc yields an EMPTY slice and contains('')
    // is true for every row, so without the floor one short doc would
    // flag the entire corpus as contaminated
    val docs = Seq(
      (0L, "short"), // canary-eligible (id % 50 == 0) but sub-window
      (50L, "x" * 19 ++ "a full forty character canary slice okay!" ++ "tail"),
      (7L, "an ordinary clean train document with plenty of text in it"))
      .toDF("doc_id", "text")
    val canaries = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("canary_id"),
        substring(col("text"), 20, 40).as("s"))
      .filter(length(col("s")) === 40)
    // doc 0's degenerate slice must be filtered out entirely
    assert(canaries.filter(col("canary_id") === 0L).isEmpty)
    val flagged = docs.crossJoin(broadcast(canaries))
      .filter(col("text").contains(col("s")))
      .select("doc_id").as[Long].collect().toSet
    assert(!flagged.contains(7L),
      s"the clean doc must not be flagged by a truncated canary: $flagged")
    assert(flagged === Set(50L), s"only the canary's own doc self-matches: $flagged")
  }

  test("canaryPairs: an empty needle is dropped, never flags the corpus") {
    val needles = Seq(
      (1L, ""), // degenerate: contains('') is true everywhere
      (2L, "   "), // whitespace-only: zero tokens, but contains matches literally
      (3L, "genuine canary needle")).toDF("nid", "s")
    val train = Seq(
      (10L, "has the genuine canary needle inside"),
      (11L, "a perfectly clean document"),
      (12L, "another clean one")).toDF("doc_id", "text")
    val got = Dedup.canaryPairs(train, needles, "doc_id", "text", "nid", "s")
      .as[(Long, Long)].collect().toSet
    assert(!got.exists(_._2 == 1L),
      s"the empty needle must be dropped by the length floor: $got")
    assert(got.contains((10L, 3L)), s"real needles still flag: $got")
    assert(!got.exists(_._1 == 11L) && !got.exists(_._1 == 12L),
      s"clean docs stay clean: $got")
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = TextQueries.corpusWithClones(spark, sf)
  private lazy val nDocs = Tables.documents(spark, sf).count()

  test("editDistancePairs: exact distances, threshold boundary, length-filter drop, blocking recall") {
    // a long shared base so trigram blocking always has an intact shingle
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val docs = Seq(
      (1L, base),
      (2L, base),                                      // exact dup -> edits 0
      (3L, base.replace("gamma", "gamXa")),            // 1 substitution
      (4L, base + " xyz"),                             // 4 appended chars -> dropped at maxEdits 3
      (5L, base.replace("alpha ", "")),                // 6 deletions -> dropped
      (6L, "totally different words here entirely")    // shares no trigram
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(docs, "doc_id", "text", maxEdits = 3)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(got === Seq((1L, 2L, 0), (1L, 3L, 1), (2L, 3L, 1)))
    // raising the budget admits the 4-char append; doc 3 stays out of
    // reach of doc 4 (substitution + append = 5 edits)
    val got4 = Dedup.editDistancePairs(docs, "doc_id", "text", maxEdits = 4)
      .filter(col("id_b") === 4L).orderBy("id_a")
      .as[(Long, Long, Int)].collect().toSeq
    assert(got4 === Seq((1L, 4L, 4), (2L, 4L, 4)))
    // hub pruning trades the completeness bound loudly documented: with
    // every trigram pruned, no candidates remain
    assert(Dedup.editDistancePairs(docs, "doc_id", "text", 3,
      dfMaxFraction = 0.0).count() === 0L)
  }

  test("editDistanceIncremental: probe == cross-side restriction of the batch pairs; advance chains") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val seen = Seq((1L, base), (2L, base + " extra tail words here")).toDF("doc_id", "text")
    val fresh = "one two three four five six seven eight nine ten eleven"
    val batch = Seq(
      (10L, base),                             // exact dup of seen 1
      (11L, base.replace("gamma", "gamXa")),   // 1 edit from seen 1
      (12L, fresh)                             // nothing seen is close
    ).toDF("doc_id", "text")
    val idx = Dedup.buildEditIndex(seen, "doc_id", "text")
    val got = Dedup.editDistanceIncremental(batch, seen, idx, "doc_id", "text",
        maxEdits = 3)
      .orderBy("batch_id", "seen_id").as[(Long, Long, Int)].collect().toSeq
    assert(got === Seq((10L, 1L, 0), (11L, 1L, 1)))
    // cross-side restriction of the batch operator over the union
    val union = Dedup.editDistancePairs(seen.unionByName(batch), "doc_id",
        "text", maxEdits = 3)
      .filter(col("id_a") < 10L && col("id_b") >= 10L)
      .select(col("id_b").as("batch_id"), col("id_a").as("seen_id"), col("edits"))
      .orderBy("batch_id", "seen_id").as[(Long, Long, Int)].collect().toSeq
    assert(union === got)
    // advance: the fresh survivor joins the index + seenDocs; a later twin
    // of it is caught ONLY via the advanced state
    val surv = batch.filter(col("doc_id") === 12L)
    val idx2 = Dedup.advanceEditIndex(idx, surv, "doc_id", "text")
    val seen2 = seen.unionByName(surv)
    val b2 = Seq((20L, fresh + " x")).toDF("doc_id", "text") // 2 appended chars
    assert(Dedup.editDistanceIncremental(b2, seen, idx, "doc_id", "text", 3).isEmpty)
    val hits2 = Dedup.editDistanceIncremental(b2, seen2, idx2, "doc_id", "text", 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(hits2 === Seq((20L, 12L, 2)))
  }

  test("editDistancePairs: shortDocExact recovers under-bound pairs trigram blocking misses") {
    // 3-token docs sit far under the 6*maxEdits+2 = 20 bound: each yields
    // ONE shingle (the whole string), a single edit changes it entirely,
    // so blocking finds NO shared gram — the documented completeness hole
    val a = "aa bb cc"
    val b = "aa bb cX" // 1 substitution, same length
    val c = "zz yy xx" // unrelated, same length (must NOT pair: DP kills it)
    val long1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi"
    val docs = Seq((1L, a), (2L, b), (3L, c), (4L, long1)).toDF("doc_id", "text")
    val blockedOnly = Dedup.editDistancePairs(docs, "doc_id", "text", maxEdits = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(blockedOnly.isEmpty, s"blocking alone must miss the planted pair: $blockedOnly")
    val exact = Dedup.editDistancePairs(docs, "doc_id", "text", maxEdits = 3,
        shortDocExact = true)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(exact === Seq((1L, 2L, 1)), s"shortDocExact must recover (1,2,1): $exact")
    // over-bound corpora are untouched by the knob: the randomized
    // ground-truth fixture has >= 20-token docs only
    val base = Seq((10L, long1), (11L, long1 + " extra"), (12L, long1.replace("pi", "pQ")))
      .toDF("doc_id", "text")
    val off = Dedup.editDistancePairs(base, "doc_id", "text", maxEdits = 3)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    val on = Dedup.editDistancePairs(base, "doc_id", "text", maxEdits = 3,
        shortDocExact = true)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(on === off, "the knob must not change over-bound results")
  }

  test("editDistancePairs: randomized ground truth — 100 docs, planted k-edit variants, exact distances") {
    // docs have >= 20 tokens, so the 6*maxEdits+2 completeness bound
    // applies: EVERY true pair within 3 edits must be found. Ground truth
    // from a driver-side DP.
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(j =>
        if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rnd = new scala.util.Random(23)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron")
    val bases = (0 until 50).map { i =>
      (i.toLong, Seq.fill(22)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    // each base gets ONE variant with k = i % 5 random char edits
    // (substitutions at interior positions — never a space, so token
    // structure and the blocking bound stay intact)
    val variants = bases.map { case (i, t) =>
      val k = (i % 5).toInt
      val chars = t.toCharArray
      var applied = 0
      while (applied < k) {
        val p = rnd.nextInt(chars.length)
        if (chars(p) != ' ' && chars(p) != 'Q') { chars(p) = 'Q'; applied += 1 }
      }
      (i + 500L, new String(chars))
    }
    val docs = (bases ++ variants).toDF("doc_id", "text")
    val all = (bases ++ variants)
    val expected = (for {
      (ia, ta) <- all; (ib, tb) <- all if ia < ib
      d = lev(ta, tb) if d <= 3
    } yield (ia, ib, d)).sortBy(t => (t._1, t._2))
    val got = Dedup.editDistancePairs(docs, "doc_id", "text", maxEdits = 3)
      .orderBy("id_a", "id_b").as[(Long, Long, Int)].collect().toSeq
    assert(got === expected,
      s"missed: ${expected.toSet -- got.toSet}; extra: ${got.toSet -- expected.toSet}")
    assert(expected.nonEmpty && expected.exists(_._3 == 3))
  }

  test("exact dedup removes all injected clones, keeps min doc_id") {
    val out = Dedup.exact(corpus, "text", Seq(col("doc_id")))
    // every clone (doc_id+1M) has its original → survivors all original,
    // plus originals may collapse among themselves
    assert(out.count() <= nDocs)
    assert(out.filter(col("doc_id") >= 1000000L).count() === 0)
  }

  test("curation funnel: each stage catches its designed victim, order matters") {
    import graft.operators.Curate
    val good = (1 to 30).map(i => s"w$i").mkString(" ") // 30 distinct tokens
    val docs = Seq(
      (1L, good, "en"),                                   // survives everything
      (2L, good, "en"),                                   // exact clone -> dies s1
      (3L, (1 to 10).map(i => s"w$i").mkString(" "), "en"), // 10-token prefix copy -> dies s2 (both spans shared with doc 1)
      (4L, "x1 x2 x3", "en"),                             // short+unique -> lowest quality -> dies s3
      (50L, "e1 e2 e3 e4 e5 e6", "en"),                   // eval doc (50 % 50 == 0) -> excluded at s4
      (5L, "e2 e3 e4 zz yy xx qq rr ss tt uu vv ww aa bb cc dd ee ff gg", "en") // shares eval 3-gram -> dies s4
    ).toDF("doc_id", "text", "lang")
    val f = Curate.funnel(docs, "doc_id", "text", "lang", Seq("the", "a"),
      evalPred = col("doc_id") % 50 === 0, spanTokens = 5, qualityCut = 0.2)
    val counts = f.counts.as[(String, Long)].collect().toMap
    assert(counts("s0_input") === 6L)
    assert(counts("s1_exact_dedup") === 5L, "clone must die at exact dedup")
    val survivors = f.survivors.select("doc_id").as[Long].collect().toSet
    assert(!survivors.contains(2L) && !survivors.contains(3L),
      "clone and prefix copy must not survive")
    assert(!survivors.contains(50L), "eval docs never enter the training set")
    assert(!survivors.contains(5L), "contaminated doc must die at s4")
    assert(survivors.contains(1L), "the clean doc survives the whole funnel")
  }

  test("funnelPersisted is bit-identical to the lazy funnel") {
    import graft.operators.Curate
    val docs = corpus.limit(200)
      .withColumn("lang", concat(lit("l"), col("doc_id") % 3))
    def run(f: (org.apache.spark.sql.DataFrame, String, String, String, Seq[String],
                org.apache.spark.sql.Column, Int, Double, Double) => Curate.Funnel) = {
      val fn = f(docs, "doc_id", "text", "lang", Seq("the", "a"),
        col("doc_id") % 50 === 0, 5, 0.5, 0.2)
      (fn.counts.as[(String, Long)].collect().sortBy(_._1).toSeq,
        fn.survivors.select("doc_id").as[Long].collect().sorted.toSeq)
    }
    val lazyRes = run(Curate.funnel(_, _, _, _, _, _, _, _, _))
    val persisted = run(Curate.funnelPersisted(_, _, _, _, _, _, _, _, _))
    assert(persisted === lazyRes)
  }

  test("dupSpanFraction scores partial copies; self-repetition is not duplication") {
    // doc 1: 8 tokens = 2 spans of 4; doc 2 copies doc 1's first span only;
    // doc 3 is clean; doc 4 repeats ITS OWN span twice (self-repetition)
    val df = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d x1 x2 x3 x4"),
      (3L, "p q r s t u v w"),
      (4L, "m n o p m n o p")
    ).toDF("doc_id", "text")
    val got = Dedup.dupSpanFraction(df, "doc_id", "text", spanTokens = 4, flagAt = 0.5)
      .select("doc_id", "n_spans", "n_dup_spans", "dup_frac", "is_dup")
      .as[(Long, Long, Long, Double, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === Seq(
      (1L, 2L, 1L, 0.5, true),   // half of doc 1 lives in doc 2
      (2L, 2L, 1L, 0.5, true),
      (3L, 2L, 0L, 0.0, false),
      (4L, 1L, 0L, 0.0, false))) // distinct spans: own repeat collapses, no other doc has it
  }

  test("Bloom-prefiltered incremental dedup is bit-identical to the anti-join form") {
    val docs = graft.Tables.documents(spark, sf)
    val batch = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val seen = docs.filter(col("doc_id") < 250)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "fingerprint").collect().map(_.toSeq).toSet
    val exact = rows(Dedup.incremental(batch, seen, "text"))
    assert(rows(Dedup.incrementalBloom(batch, seen, "text")) === exact)
    // degenerate 64-bit filter: everything collides to "maybe", the exact
    // anti-join confirms every row — correctness never depends on sizing
    assert(rows(Dedup.incrementalBloom(batch, seen, "text",
      expectedSeen = 10L, numBits = 64L)) === exact)
  }

  test("incremental minhash candidates find every clone against the seen index") {
    import spark.implicits._
    val docs = graft.Tables.documents(spark, sf)
    val index = Dedup.bandedSignatures(docs, "doc_id", "text")
    val batch = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val cands = Dedup.minhashIncrementalCandidates(batch, index, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ids = docs.select("doc_id").as[Long].collect()
    // identical text → identical signature → collision in EVERY band
    assert(ids.forall(id => cands.contains((id + 1000000L, id))))
    // candidates only pair batch against seen — never seen-seen or batch-batch
    assert(cands.forall { case (b, s) => b >= 1000000L && s < 1000000L })
  }

  test("minhash LSH finds every exact-clone pair") {
    val cands = Dedup.minhashLshCandidates(corpus, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // all 500 (id, id+1M) pairs must be candidates: identical text ⇒
    // identical signature ⇒ all bands collide
    val missing = (0L until nDocs).map(i => (i, i + 1000000L)).filterNot(cands.contains)
    assert(missing.isEmpty, s"missing clone pairs: ${missing.take(5)}")
  }

  test("minhash candidates verified by jaccard contain the clone pairs and nothing below threshold") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 100)
    val sub = TextQueries.corpusWithClones(spark, sf).filter(
      col("doc_id") < 100 || (col("doc_id") >= 1000000L && col("doc_id") < 1000100L))
    val cands = Dedup.minhashLshCandidates(sub, "doc_id", "text")
    val verified = Dedup.jaccardPairs(sub, "doc_id", "text", threshold = 1.0)
      .join(cands, Seq("id_a", "id_b"), "left_semi")
      .as[(Long, Long, Double)].collect().toSet
    val clonePairs = (0L until 100L).map(i => (i, i + 1000000L, 1.0)).toSet
    assert(clonePairs.subsetOf(verified))
    assert(docs.count() === 100)
  }

  test("containmentPairs: embedded excerpt scores 1.0 where Jaccard stays below threshold") {
    val long = (1 to 60).map(i => s"w$i").mkString(" ")     // 58 distinct 3-grams
    val excerpt = (20 to 29).map(i => s"w$i").mkString(" ") // 8 grams, all inside `long`
    val unrelated = (100 to 130).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, long), (2L, excerpt), (3L, unrelated)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // only the excerpt→long direction survives: 8/8 = 1.0; the reverse is
    // 8/58 ≈ 0.138 and is filtered, as is the unrelated doc entirely
    assert(cont === Set((2L, 1L, 1.0)))
    // symmetric Jaccard on the same pair: 8/58 ≈ 0.138 — invisible at 0.5
    val jac = Dedup.jaccardPairs(df, "doc_id", "text", threshold = 0.5)
    assert(jac.count() === 0L, "Jaccard must miss the subset-duplicate containment catches")
  }

  test("containmentPairs: identical docs contain each other both ways at 1.0") {
    val t = (1 to 20).map(i => s"w$i").mkString(" ")
    val df = Seq((7L, t), (9L, t)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.99)
      .as[(Long, Long, Double)].collect().toSet
    assert(cont === Set((7L, 9L, 1.0), (9L, 7L, 1.0)))
  }

  test("simhash pairs include clones at hamming 0") {
    val sub = corpus.filter((col("doc_id") % 25 === 0))
    val pairs = Dedup.simhashPairs(sub, "doc_id", "text")
      .as[(Long, Long, Int)].collect()
    val cloneIds = sub.filter(col("doc_id") < 1000000L).select("doc_id")
      .as[Long].collect()
    val found = pairs.filter(p => p._2 === p._1 + 1000000L)
    assert(found.length === cloneIds.length && found.forall(_._3 === 0))
  }

  test("simhash incremental: index probe catches seen clones, advance chains batches") {
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 50)
      .select("doc_id", "text")
    val idx = Dedup.buildSimhashIndex(docs, "doc_id", "text")
    val fresh = (1 to 40).map(i => s"z$i").mkString(" ")
    val batch1 = docs.filter(col("doc_id") === 10)
      .select((col("doc_id") + 900000L).as("doc_id"), col("text"))
      .unionByName(Seq((800L, fresh)).toDF("doc_id", "text"))
    val p1 = Dedup.simhashIncrementalPairs(batch1, idx, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(p1.contains((900010L, 10L, 0)), s"clone pair missing: $p1")
    assert(!p1.exists(_._1 == 800L), s"fresh doc must not pair: $p1")
    // advance on batch-1 survivors; a clone of the fresh doc is catchable
    // only via the advanced index
    val idx2 = Dedup.advanceSimhashIndex(idx,
      Seq((800L, fresh)).toDF("doc_id", "text"), "doc_id", "text")
    val batch2 = Seq((901800L, fresh)).toDF("doc_id", "text")
    val p2 = Dedup.simhashIncrementalPairs(batch2, idx2, "doc_id", "text")
      .as[(Long, Long, Int)].collect().toSet
    assert(p2.contains((901800L, 800L, 0)), s"advanced-index pair missing: $p2")
    val p2stale = Dedup.simhashIncrementalPairs(batch2, idx, "doc_id", "text")
      .as[(Long, Long, Int)].collect()
    assert(!p2stale.exists(_._2 == 800L), "stale index cannot know doc 800")
  }

  test("minhash and simhash tolerate null text like the exact path") {
    val df = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(Dedup.minhashSignatures(df, "doc_id", "text", 3, 8).count() === 2)
    assert(Dedup.simhash(df, "doc_id", "text").count() === 2)
  }

  test("digitGuardInt: int-overflowing digit strings yield the default") {
    import org.apache.spark.sql.functions.col
    val v = Seq("99999999999").toDF("x")
      .select(graft.functions.Coercions.digitGuardInt(col("x")).as("v"))
      .as[Int].head()
    assert(v === 0)
  }

  test("shingles produce k-grams; short docs fall back to full text") {
    val df = Seq("a b c d", "x y").toDF("t")
      .select(Dedup.shingles(col("t"), 3).as("s"))
    assert(df.as[Seq[String]].collect().toSeq
      === Seq(Seq("a b c", "b c d"), Seq("x y")))
  }

  test("dupClusters chains transitively (A~B, B~C but not A~C) and keeps singletons") {
    import org.apache.spark.sql.functions.col
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L).toDF("doc_id")
    // 1-2-3-4 is a path (diameter 3, no shortcut edges); 10-11 a pair; 99 alone
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("id_a", "id_b")
    val got = Dedup.dupClusters(nodes, "doc_id", pairs)
      .orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("dupClusters on the clone corpus: every clone joins its original's cluster") {
    import org.apache.spark.sql.functions.col
    val corpus = graft.analytics.TextQueries.corpusWithClones(spark, sf)
      .filter(col("doc_id") % 1000000L < 50)
    val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = 0.99)
    val clusters = Dedup.dupClusters(corpus.select("doc_id"), "doc_id", pairs)
    val byId = clusters.as[(Long, Long)].collect().toMap
    (0L until 50L).filter(byId.contains).foreach { id =>
      assert(byId(id + 1000000L) === byId(id),
        s"clone of $id landed in a different cluster")
    }
  }

  test("winnowFingerprints: shared run >= w+k-1 words guarantees a shared fingerprint") {
    import org.apache.spark.sql.functions.col
    // k=3, w=4 → any common run of 6+ words must share a selected min-hash
    val shared = "alpha beta gamma delta epsilon zeta"
    val df = Seq(
      (1L, s"one two $shared three four"),
      (2L, s"five six seven $shared eight"),
      (3L, "totally different words everywhere all over the place now"),
      (4L, "too short")).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSeq
    val byDoc = fps.groupBy(_._1).map { case (d, v) => d -> v.map(_._2).toSet }
    assert((byDoc(1L) & byDoc(2L)).nonEmpty, "shared run produced no common fingerprint")
    assert((byDoc(1L) & byDoc(3L)).isEmpty, "unrelated docs should not collide")
    assert(!byDoc.contains(4L), "docs shorter than w+k-1 words emit no fingerprints")
    // deterministic: same input, same fingerprints
    val again = Dedup.winnowFingerprints(df, "doc_id", "text")
      .as[(Long, Long)].collect().toSeq
    assert(again.toSet === fps.toSet)
  }

  test("simhashPairs rejects maxHamming beyond the pigeonhole guarantee") {
    val df = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 4).collect()
    }
    assert(e.getMessage.contains("pigeonhole"))
  }

  test("dupClusters fails loudly when a component's diameter exceeds maxIter") {
    // a 6-node chain needs ~5 propagation rounds; cap at 2 and expect the
    // loud failure instead of silently split clusters
    val nodes = (1L to 6L).toDF("doc_id")
    val chain = (1L to 5L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val e = intercept[IllegalStateException] {
      Dedup.dupClusters(nodes, "doc_id", chain, maxIter = 2)
    }
    assert(e.getMessage.contains("maxIter"))
    // with room to converge the same chain is one cluster
    val ok = Dedup.dupClusters(nodes, "doc_id", chain, maxIter = 10)
    assert(ok.select("cluster_id").distinct().count() === 1)
  }

  test("dropBoilerplateLines removes corpus-frequent lines, keeps order, keeps emptied docs") {
    val df = Seq(
      (1L, "keep one\nFOOTER\nkeep two"),
      (2L, "FOOTER\nunique a"),
      (3L, "unique b\nFOOTER"),
      (4L, "FOOTER")).toDF("doc_id", "text")
    val out = Dedup.dropBoilerplateLines(df, "doc_id", "text", minDocFreq = 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out === Seq(
      (1L, "keep one\nkeep two", 2L, 1L), // order preserved around the cut
      (2L, "unique a", 1L, 1L),
      (3L, "unique b", 1L, 1L),
      (4L, "", 0L, 1L))) // fully-boilerplate doc stays visible, empty
    intercept[IllegalArgumentException] {
      Dedup.dropBoilerplateLines(df, "doc_id", "text", minDocFreq = 1)
    }
  }

  test("dupClusters pointer doubling: a 64-chain converges within ceil(log2 64)+1 rounds") {
    // worst-case component shape for label propagation. Plain min-diffusion
    // needs ~63 rounds; the label(label) shortcut doubles reach per round,
    // so the cap at ceil(log2 64)+1 = 7 (6 changing rounds + 1 confirming)
    // must suffice — if the doubling regresses, this throws the maxIter
    // IllegalStateException
    val n = 64L
    val nodes = (1L to n).toDF("doc_id")
    val chain = (1L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val clusters = Dedup.dupClusters(nodes, "doc_id", chain, maxIter = 7)
      .as[(Long, Long)].collect()
    assert(clusters.length === 64 && clusters.forall(_._2 === 1L),
      "the whole chain must collapse to cluster 1")
  }

  test("decontamination flags exactly the train docs sharing eval k-grams") {
    val train = Seq(
      (1L, "alpha beta gamma delta"), // shares "alpha beta gamma"
      (2L, "unrelated words entirely here"),
      (3L, "beta gamma qq alpha beta gamma")) // shares both eval grams
      .toDF("doc_id", "text")
    val eval = Seq((100L, "alpha beta gamma qq")).toDF("doc_id", "text")
    val got = Dedup.decontaminationPairs(train, eval, "doc_id", "text")
      .orderBy("train_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 100L, 1L), (3L, 100L, 2L)))
    // distinct grams: doc 3 repeats "alpha beta gamma" but counts it once
    val strict = Dedup.decontaminationPairs(train, eval, "doc_id", "text",
      minShared = 2L).as[(Long, Long, Long)].collect().toSeq
    assert(strict === Seq((3L, 100L, 2L)))
    // shuffle fallback path is result-identical to the broadcast path
    val noBc = Dedup.decontaminationPairs(train, eval, "doc_id", "text",
      broadcastEval = false).as[(Long, Long, Long)].collect().toSet
    assert(noBc === got.toSet)
  }

  test("canaryPairs: gram-index path is pair-identical to the broadcast contains scan; no crossJoin for long needles") {
    // train docs: a verbatim embed (mid-text), a one-char-off near miss
    // (must NOT flag), a doc embedding TWO needles, a needle fused to
    // adjacent characters (still verbatim — prefix/suffix chars touch the
    // needle's FIRST/LAST token, the case interior-gram indexing exists
    // for), and clean docs
    val needles = Seq(
      (100L, "red fox jumps over the lazy dog"), // 7 tokens: gram path
      (101L, "quantum leap basis vector rotation"), // 5 tokens: gram path
      (102L, "tiny pair")) // 2 tokens: short-needle escape path
      .toDF("nid", "s")
    val train = Seq(
      (1L, "prefix words red fox jumps over the lazy dog suffix words"),
      (2L, "prefix words red fox jumps over the hazy dog suffix words"), // near miss
      (3L, "a quantum leap basis vector rotation b tiny pair c"), // two hits
      (4L, "unrelated content with no needles at all whatsoever"),
      (5L, "fusedred fox jumps over the lazy dogfused"), // verbatim, fused ends
      (6L, "red fox JUMPS over the lazy dog")) // case differs: no verbatim hit
      .toDF("doc_id", "text")
    val got = Dedup.canaryPairs(train, needles, "doc_id", "text", "nid", "s")
      .as[(Long, Long)].collect().toSet
    // reference: the q171-shaped broadcast contains scan
    val ref = train.crossJoin(broadcast(needles))
      .filter(col("text").contains(col("s")))
      .select(col("doc_id"), col("nid"))
      .as[(Long, Long)].collect().toSet
    assert(got === ref)
    assert(got === Set((1L, 100L), (3L, 101L), (3L, 102L), (5L, 100L)))
    // plan guard: with every needle long enough for the gram index, the
    // plan carries NO cartesian/nested-loop join — the whole point of the
    // corpus-scale path (the short-needle escape is the only consumer of
    // the broadcast scan, and it wasn't built here)
    val longOnly = needles.filter(col("nid") < 102L)
    val plan = Dedup.canaryPairs(train, longOnly, "doc_id", "text", "nid", "s")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"gram path must not cross-join: $plan")
    // shuffled-needles fallback is result-identical
    val noBc = Dedup.canaryPairs(train, needles, "doc_id", "text", "nid", "s",
      broadcastNeedles = false).as[(Long, Long)].collect().toSet
    assert(noBc === ref)
  }

  test("cdcChunks partition the token stream; an inserted token only reshapes its chunk") {
    import org.apache.spark.sql.functions.col
    val base = "key agg row scan slow fast table value part hash merge batch spark line sort window"
    val df = Seq((1L, base)).toDF("doc_id", "text")
    val chunks = Dedup.cdcChunks(df, "doc_id", "text")
      .orderBy("pos").as[(Long, Int, String)].collect().map(_._3).toSeq
    // reconstruction: chunks in pos order rebuild the tokenized text
    assert(chunks.mkString(" ") === base)
    assert(chunks.size > 1, "boundary rule never fired — pick a longer fixture")
    // content-defined: prepending a token shifts positions but the chunking
    // resynchronizes at the first boundary — the tail chunks are unchanged
    val shifted = Dedup.cdcChunks(Seq((1L, s"zzz $base")).toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("pos").as[(Long, Int, String)].collect().map(_._3).toSeq
    assert(shifted.mkString(" ") === s"zzz $base")
    assert(chunks.tail.toSet.subsetOf(shifted.toSet),
      "chunks after the first boundary must survive a prefix insertion")
    // dedup: a cloned doc shares every chunk; keeper is the lower id
    val dup = Dedup.chunkDedup(
      Seq((1L, base), (1000001L, base), (2L, "totally different words here")).toDF("doc_id", "text"),
      "doc_id", "text")
    val rows = dup.as[(String, Long, Long)].collect()
    assert(rows.length === chunks.size)
    rows.foreach { case (_, n, keeper) => assert(n === 2L && keeper === 1L) }
  }

  test("frequentNgrams counts document frequency once per doc, orders by (df, gram)") {
    val df = Seq(
      (1L, "foo bar baz foo bar baz"), // "foo bar baz" twice -> counts once
      (2L, "foo bar baz something else here"),
      (3L, "aaa bbb ccc ddd"),
      (4L, "aaa bbb ccc")).toDF("doc_id", "text")
    val got = Dedup.frequentNgrams(df, "doc_id", "text", k = 3, minDf = 2L)
      .as[(String, Long)].collect().toSeq
    // both df=2; tie broken by gram ascending
    assert(got === Seq(("aaa bbb ccc", 2L), ("foo bar baz", 2L)))
    val top1 = Dedup.frequentNgrams(df, "doc_id", "text", k = 3, minDf = 2L,
      topN = 1).as[(String, Long)].collect().toSeq
    assert(top1 === Seq(("aaa bbb ccc", 2L)))
  }
}
