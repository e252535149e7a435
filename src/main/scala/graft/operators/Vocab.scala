package graft.operators

import org.apache.spark.sql.DataFrame
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
