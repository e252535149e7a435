package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Token-vocabulary build + dictionary encoding — the id-ification step
  * between tokenization and packing training shards (every pretraining
  * pipeline stores token IDS, not strings; ids also make the packed
  * sequences of q57 byte-stable).
  *
  * Vocabulary ids are dense from 0 in (frequency DESC, token ASC) order —
  * deterministic, and the frequent-token-small-id property is what keeps
  * varint-style downstream encodings compact.
  *
  * Scale shape: the corpus-sized work is a map-side-combinable token count;
  * the rank window then runs over the VOCABULARY (distinct tokens, ~1e5–1e7
  * rows at 100 TB of text), so its single-partition sort is bounded by
  * vocab size no matter the corpus. Encoding broadcasts the vocab by
  * default (a 1e6-row dictionary is a few MB); pass `broadcastVocab =
  * false` to shuffle-join instead when a caller builds a giant vocab.
  */
object Vocab {

  /** (token, n, token_id) — ids dense from 0, ranked by (n DESC, token). */
  def build(df: DataFrame, textCol: String): DataFrame = {
    val counts = df.select(explode(Text.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
    counts.withColumn("token_id",
      (row_number().over(Window.orderBy(col("n").desc, col("token"))) - 1).cast("long"))
  }

  /** Symbol separator for the BPE fold's string accumulator — a control
    * char that never appears in corpus tokens (tokens come from whitespace
    * splitting, and U+001F is whitespace-adjacent control, not text). */
  private val BpeSep = "\u001F"

  /** One greedy left-to-right application of merge (a, b) → ab over a
    * symbol array, as a pure expression fold. The accumulator is a
    * SEP-delimited string (same element type as the lambda input — which is
    * what lets an external SQL oracle run the IDENTICAL fold via
    * list_reduce): if the accumulated sequence ends with symbol `a` and the
    * next symbol is `b`, append `b` directly (fusing the pair); otherwise
    * append with a separator. Matches the classic BPE regex-free merge:
    * overlapping matches resolve leftmost-first ("aaa" + (a,a) → [aa, a]),
    * and a freshly merged symbol can't re-merge in the same round (that
    * would require `ab == a`, i.e. an empty right side). */
  private def applyMergeExpr(syms: Column, a: String, b: String): Column = {
    val folded = aggregate(syms, lit(""), (acc, x) =>
      when(acc === "", x)
        .when(x === lit(b) && (acc === lit(a) || acc.endsWith(lit(BpeSep + a))),
          concat(acc, x))
        .otherwise(concat(acc, lit(BpeSep), x)))
    split(folded, java.util.regex.Pattern.quote(BpeSep))
  }

  /** Apply an ordered merge list (a [[bpeTrain]] result) to a symbol array
    * column — the encode path: chars in, trained subword segments out. */
  def bpeApply(syms: Column, merges: Seq[(String, String)]): Column =
    merges.foldLeft(syms) { case (s, (a, b)) => applyMergeExpr(s, a, b) }

  /** Character array of a token (the BPE base alphabet). Spark's
    * `split(w, "")` keeps a trailing "" (Java split with limit -1) — the
    * filter drops it so the alphabet is exactly the word's characters. */
  def charSyms(w: Column): Column =
    filter(split(w, ""), s => s =!= "")

  /** Distributed BPE tokenizer training (Sennrich et al. 2016): `numMerges`
    * rounds of "count adjacent symbol pairs, merge the most frequent".
    * Returns the trained merge table — (merge_rank, left, right, merged,
    * pair_count) — the artifact a tokenizer ships.
    *
    * The scalable shape is the classic one: the corpus is scanned ONCE
    * (a map-side-combinable word count); every training round then runs on
    * the word-frequency table — VOCABULARY-sized, not corpus-sized — so
    * 100 TB of text iterates over a few million rows. Per round: one
    * pair-count aggregate over the vocab (pairs weighted by word counts),
    * one TakeOrderedAndProject argmax (count DESC, then (left, right)
    * lexicographic — binary UTF-8 order in both engines, so ties break
    * identically), and one pure-projection merge application
    * ([[applyMergeExpr]]); the word table re-materializes via
    * localCheckpoint so the iterated fold doesn't nest the plan `numMerges`
    * deep. Only the 1-row argmax ever reaches the driver.
    *
    * Word-internal BPE (no cross-word pairs, no end-of-word marker): each
    * word contributes its own adjacent pairs, which is the standard
    * frequency-dictionary formulation. */
  def bpeTrain(df: DataFrame, textCol: String, numMerges: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    var words = df.select(explode(Text.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .select(charSyms(col("w")).as("syms"), col("cnt"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    for (r <- 1 to numMerges) {
      val pairs = words
        .select(col("cnt"), explode(
          when(size(col("syms")) >= 2,
            transform(sequence(lit(1), size(col("syms")) - 1),
              i => struct(element_at(col("syms"), i).as("a"),
                element_at(col("syms"), i + 1).as("b"))))
            .otherwise(array())).as("p"))
        .select(col("p.a").as("a"), col("p.b").as("b"), col("cnt"))
        .groupBy("a", "b").agg(sum(col("cnt")).as("c"))
      val top = pairs.orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).as[(String, String, Long)].collect()
      require(top.nonEmpty,
        s"BPE training exhausted all pairs after ${r - 1} merges — every " +
          s"word is a single symbol; ask for fewer than $numMerges merges")
      val (a, b, c) = top.head
      merges += ((r, a, b, c))
      words = words
        .select(applyMergeExpr(col("syms"), a, b).as("syms"), col("cnt"))
        .localCheckpoint()
    }
    merges.result().toDF("merge_rank", "left", "right", "pair_count")
      .select(col("merge_rank"), col("left"), col("right"),
        concat(col("left"), col("right")).as("merged"), col("pair_count"))
  }

  /** Encode documents against `vocab` (a [[build]] result): one
    * (id, pos, token_id) row per token, pos 0-based within the document.
    * Unknown tokens encode as `oovId` (left join — an inner join would
    * silently DROP positions and shift every later token left). */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocab: DataFrame, oovId: Long = -1L,
             broadcastVocab: Boolean = true): DataFrame = {
    val ex = docs.select(col(idCol),
      posexplode(Text.tokens(col(textCol))).as(Seq("pos", "token")))
    val v0 = vocab.select(col("token"), col("token_id"))
    val v = if (broadcastVocab) broadcast(v0) else v0
    ex.join(v, Seq("token"), "left")
      .select(col(idCol), col("pos"),
        coalesce(col("token_id"), lit(oovId)).as("token_id"))
  }
}
