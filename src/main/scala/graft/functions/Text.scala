package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expressions for large-scale document pipelines: token
  * counting, quality scoring, language-ID heuristic, fingerprinting. All are
  * pure `Column` compositions (codegen-friendly, no UDF), designed to run
  * inside a single projection over a 100 TB documents table.
  */
object Text {

  /** Whitespace-collapsed, lower-cased canonical form — the dedup key input. */
  def normalize(c: Column): Column =
    regexp_replace(trim(lower(c)), "\\s+", " ")

  /** Whitespace tokenization. */
  // the empty-string filter matters: split(trim(''), '\s+') is [""] — one
  // phantom token — so empty/whitespace-only documents would count 1 token,
  // divide quality ratios by 1, and vote in langId. Non-empty text never
  // produces empty parts under \s+, so this only changes the degenerate case.
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  /** Token count (whitespace). */
  def tokenCount(c: Column): Column = size(tokens(c))

  /** Unicode normalization (default NFC) — run it BEFORE fingerprinting or
    * dedup: composed vs decomposed text hashes differently while rendering
    * identically. Native expression (codegen), zero-dependency JDK
    * normalizer. */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.graft.UnicodeNormalize.column(c, form)

  /** BPE-ish token count: letter runs, digit runs, and single punctuation
    * marks each count as one token — the usual cheap proxy for subword
    * tokenizer cost. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"
  def bpeishTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit(BpePattern), lit(0)))

  /** Count of punctuation (non-alphanumeric, non-space) characters. */
  def punctCount(c: Column): Column =
    length(lower(c)) - length(regexp_replace(lower(c), "[^a-z0-9\\s]", ""))

  /** Punctuation character ratio in [0,1]; empty text → 0. */
  def punctRatio(c: Column): Column = {
    val len = length(c)
    when(len > 0, punctCount(c).cast("double") / len).otherwise(lit(0.0))
  }

  /** Fraction of tokens that are stopwords; empty → 0. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val toks = tokens(c)
    val hits = size(filter(toks, t => t.isInCollection(stopwords)))
    when(size(toks) > 0, hits.cast("double") / size(toks)).otherwise(lit(0.0))
  }

  /** Shannon character entropy in bits/char, 4dp — the cheap
    * compression-ratio proxy: near-0 flags repeated-character spam,
    * near-log₂(alphabet) is normal prose; pair with [[qualityScore]] as a
    * pre-filter signal. Empty text → 0.0.
    *
    * Zero-shuffle by construction: the histogram is built IN THE ROW as a
    * single left fold over the sorted char array — state (prev, run, Σk·lnk,
    * n) — using H = (ln n − Σk·ln k / n) / ln 2. The sorted array appears
    * ONLY as the fold's input: Spark re-evaluates non-trivial expressions at
    * every reference site inside a lambda body (no CSE across lambda
    * boundaries), so the earlier index-probing formulation re-ran the
    * regexp+sort PER ELEMENT — O(n²) per row, a multi-hour hang on real
    * documents. Run terms accumulate in sorted-char order (deterministic
    * float order across partitionings and engines; the q98 oracle replays
    * the same fold over `list(k ORDER BY c)`), and ln(2) is pinned as a
    * literal so both engines divide by the same double.
    */
  def charEntropy(c: Column): Column = {
    // '[^\n]', not '.': Java-regex '.' excludes \r, U+0085, U+2028, U+2029,
    // while RE2 (the oracle engine) excludes only \\n - a CRLF document would
    // histogram differently in the two engines. The explicit negated class
    // means the same thing in both: every char except newline.
    val s = sort_array(regexp_extract_all(c, lit("[^\\n]"), lit(0)))
    val ln2 = 0.6931471805599453 // Math.log(2.0), bit-exact in both engines
    def runTerm(run: Column): Column =
      when(run > 0, run.cast("double") * log(run.cast("double"))).otherwise(lit(0.0))
    val h = aggregate(
      s,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0.0).as("sum"), lit(0L).as("cnt")),
      (st, ch) => {
        val same = ch === st.getField("prev")
        struct(
          ch.as("prev"),
          when(same, st.getField("run") + 1L).otherwise(lit(1L)).as("run"),
          when(same, st.getField("sum"))
            .otherwise(st.getField("sum") + runTerm(st.getField("run"))).as("sum"),
          (st.getField("cnt") + 1L).as("cnt"))
      },
      st => {
        val n = st.getField("cnt").cast("double")
        val total = st.getField("sum") + runTerm(st.getField("run"))
        when(st.getField("cnt") === 0L, lit(0.0))
          .otherwise((log(n) - total / n) / lit(ln2))
      })
    // `+ 0.0` normalizes the single-run case (-0.0) on BOTH sides (the
    // oracle mirrors it): -0.0 and 0.0 stringify differently in the gate
    Rounding.roundLikeC(h, 4) + lit(0.0)
  }

  /** Composite quality score in [0,1]: length saturation (500 chars → full
    * marks), low punctuation, moderate stopword share — the standard
    * cheap-heuristics blend used to pre-filter training corpora. */
  def qualityScore(c: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(length(c).cast("double") / 500.0, lit(1.0))
    val punctScore = lit(1.0) - punctRatio(c)
    val stopScore = lit(1.0) - abs(stopwordRatio(c, stopwords) - 0.1)
    Rounding.roundLikeC(lenScore * 0.4 + punctScore * 0.4 + stopScore * 0.2, 4)
  }

  /** Marker-token language-ID heuristic: count hits from per-language marker
    * sets; highest count wins, ties break by the order given (first wins).
    * A real system uses char n-gram profiles; the operator shape — one
    * projection, argmax over per-language scores — is identical. */
  def langId(c: Column, markers: Seq[(String, Seq[String])]): Column = {
    val toks = tokens(c)
    val hits = markers.map { case (lang, ms) =>
      lang -> size(filter(toks, t => t.isInCollection(ms)))
    }
    // first language whose hit count equals the row-wise maximum
    val maxHits = greatest(hits.map(_._2): _*)
    hits.reverse.foldLeft(lit(markers.head._1)) { case (acc, (lang, h)) =>
      when(h === maxHits, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: md5 of the normalized text — the exact-dedup key. */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** In-document repetition metrics (the Gopher Appendix A1 repetition
    * family [[gopherFlags]] doesn't cover — those rules are corpus-shape,
    * these are SELF-repetition): duplicate-line fraction and
    * duplicate-line CHARACTER fraction, the two signals that catch
    * boilerplate-padded and copy-looped pages. ZERO-shuffle by
    * construction — both metrics are in-row folds:
    *
    *  - dup_line_frac = (n_lines − n_distinct_lines) / n_lines;
    *  - dup_line_char_frac = (Σ len(line) − Σ len(distinct line)) /
    *    Σ len(line) — the numerator is exactly the characters spent on
    *    second-and-later copies of repeated lines.
    *
    * All counts are exact integers; each fraction is one IEEE division,
    * 4dp C-rounded with the −0.0 guard. Empty text (one empty line) scores
    * 0 on both. */
  def repetitionFlags(c: Column, maxDupLineFrac: Double = 0.3,
                      maxDupCharFrac: Double = 0.2): Column = {
    val lines = split(c, "\n")
    val distinctLines = array_distinct(lines)
    def totalLen(a: Column): Column =
      aggregate(a, lit(0L), (acc, x) => acc + length(x))
    val n = size(lines)
    val nd = size(distinctLines)
    val tl = totalLen(lines)
    val dl = totalLen(distinctLines)
    def frac(num: Column, den: Column): Column =
      (Rounding.roundLikeC(
        when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0)),
        4) + lit(0.0))
    val lineFrac = frac((n - nd).cast("long"), n)
    val charFrac = frac(tl - dl, tl)
    struct(
      n.as("n_lines"),
      lineFrac.as("dup_line_frac"),
      charFrac.as("dup_line_char_frac"),
      (lineFrac <= maxDupLineFrac).as("ok_dup_lines"),
      (charFrac <= maxDupCharFrac).as("ok_dup_chars"))
  }

  /** Gopher's required-word set (Rae et al. 2021, Appendix A1.1.2): a page
    * must contain at least two of these to pass the stopword rule. */
  val GopherRequiredWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher quality rules (Rae et al. 2021, Appendix A) as ONE codegen'd
    * projection — per-rule boolean flags plus the conjunction, so a corpus
    * report can show WHICH rule kills each document (the flags are the
    * audit trail; a bare keep/drop hides threshold bugs). Defaults are the
    * paper's thresholds.
    *
    * Everything derives from `toks` = whitespace tokens of the LOWERED text
    * (lengths and alpha-membership are case-invariant, and the required-word
    * rule needs the lowering; one token array keeps the engines' token
    * boundaries trivially identical). Ratios are single IEEE divisions of
    * exact integer counts — deterministic across engines and partitionings
    * (the q25/q98 discipline). Rules:
    *
    *  - word count in [minWords, maxWords];
    *  - mean word length in [minMeanWordLen, maxMeanWordLen];
    *  - (\# count + ASCII-"..." count) / words ≤ maxSymbolRatio (the
    *    Unicode ellipsis U+2026 is NOT folded into this ratio — it is
    *    handled only by the ellipsis-LINE rule below; the oracle replays
    *    the same ASCII-only count, so parity holds by construction);
    *  - ≤ maxBulletFrac of lines start with a bullet ("- ", "* ", "• ");
    *  - ≤ maxEllipsisFrac of lines end with "..." or "…";
    *  - ≥ minAlphaFrac of words contain an [a-zA-Z] character;
    *  - ≥ minRequiredHits distinct `requiredWords` appear.
    *
    * Empty text: every count is 0, ratios define to 0, and the word-count
    * rule fails — keep is false without any NaN/null leaking out. */
  def gopherFlags(c: Column,
                  requiredWords: Seq[String] = GopherRequiredWords,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanWordLen: Double = 3.0, maxMeanWordLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
                  maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
                  minRequiredHits: Int = 2): Column = {
    val toks = tokens(lower(c))
    val n = size(toks)
    val nd = n.cast("double")
    def frac(num: Column, den: Column): Column =
      when(den > 0, num.cast("double") / den.cast("double")).otherwise(lit(0.0))
    val meanLen = frac(
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)), n)
    val hashes = length(c) - length(regexp_replace(c, "#", ""))
    val dots = (length(c) - length(regexp_replace(c, "\\.\\.\\.", ""))) / lit(3)
    val symbolRatio = when(n > 0, (hashes + dots).cast("double") / nd)
      .otherwise(lit(0.0))
    val lines = split(c, "\n")
    val bullets = size(filter(lines, l =>
      ltrim(l).startsWith("- ") || ltrim(l).startsWith("* ") ||
        ltrim(l).startsWith("• ")))
    val ellipses = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
    val alphaWords = size(filter(toks, w => w.rlike("[a-zA-Z]")))
    val requiredHits = size(filter(typedlit(requiredWords),
      rw => array_contains(toks, rw)))
    val okWordCount = n >= minWords && n <= maxWords
    val okMeanLen = meanLen >= minMeanWordLen && meanLen <= maxMeanWordLen
    val okSymbol = symbolRatio <= maxSymbolRatio
    val okBullet = frac(bullets, size(lines)) <= maxBulletFrac
    val okEllipsis = frac(ellipses, size(lines)) <= maxEllipsisFrac
    val okAlpha = frac(alphaWords, n) >= minAlphaFrac
    val okRequired = requiredHits >= minRequiredHits
    struct(
      n.as("n_words"),
      (Rounding.roundLikeC(meanLen, 4) + lit(0.0)).as("mean_word_len"),
      okWordCount.as("ok_word_count"),
      okMeanLen.as("ok_mean_word_len"),
      okSymbol.as("ok_symbol_ratio"),
      okBullet.as("ok_bullet_lines"),
      okEllipsis.as("ok_ellipsis_lines"),
      okAlpha.as("ok_alpha_words"),
      okRequired.as("ok_required_words"),
      (okWordCount && okMeanLen && okSymbol && okBullet && okEllipsis &&
        okAlpha && okRequired).as("keep"))
  }
}
