package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Text

/** Trained character-n-gram language identification (the Cavnar–Trenkle
  * profile method, the shape behind fastText/CLD-style LID): learn a top-K
  * character-trigram profile per language from a LABELED corpus slice, then
  * classify documents by profile-hit count. Upgrades `Text.langId` (fixed
  * marker words) to a model TRAINED on data — the difference between a
  * heuristic and the operator a real curation pipeline ships.
  *
  * Everything is exact integer arithmetic — trigram counts, top-K ranks
  * (count DESC, gram ASC — binary UTF-8 order in both engines), hit counts,
  * argmax with ties to the lexicographically first language — so the whole
  * train + predict pipeline is replayable by an external SQL oracle.
  *
  * Scale shape: training is one (lang, gram) aggregate (map-side partials;
  * the grouped table is alphabet³-bounded per language, NOT corpus-sized)
  * followed by a per-language top-K window over that bounded table.
  * Prediction broadcasts the profile (langs × topK rows — tiny by
  * construction) and the distinct-language list; per doc the work is one
  * projection (trigram set) plus a broadcast semi-join count. No
  * corpus-sized shuffle keys on a gram.
  */
object LangId {

  /** Distinct character trigrams of the normalized text, bound once per row
    * ([[Dedup.shingles]]' array-wrap idiom — referencing the char split
    * directly from the index lambda would re-run it per element, the O(n²)
    * q98 trap). Texts shorter than 3 chars yield an empty array. */
  def charTrigrams(c: Column): Column = {
    val chars = filter(split(Text.normalize(c), ""), s => s =!= "")
    val once = transform(array(chars), cs =>
      when(size(cs) >= 3,
        array_distinct(transform(sequence(lit(1), size(cs) - 2),
          i => concat(element_at(cs, i), element_at(cs, i + 1),
            element_at(cs, i + 2)))))
        .otherwise(array().cast("array<string>")))
    element_at(once, 1)
  }

  /** Train: (lang, gram, rank) — the top `topK` trigrams per language by
    * (occurrence count DESC, gram ASC). Counts use full multiplicity (not
    * per-doc distinct): frequent n-grams are what characterize a language. */
  def trainProfiles(docs: DataFrame, langCol: String, textCol: String,
                    topK: Int = 40): DataFrame = {
    val grams = docs.select(col(langCol).as("lang"),
        explode(transform(array(filter(split(Text.normalize(col(textCol)), ""),
          s => s =!= "")), cs =>
          when(size(cs) >= 3,
            transform(sequence(lit(1), size(cs) - 2),
              i => concat(element_at(cs, i), element_at(cs, i + 1),
                element_at(cs, i + 2))))
            .otherwise(array().cast("array<string>"))).getItem(0)).as("gram"))
    val counts = grams.groupBy("lang", "gram").agg(count(lit(1)).as("cnt"))
    counts
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(col("cnt").desc, col("gram"))))
      .filter(col("rank") <= topK)
      .select("lang", "gram", "rank")
  }

  /** Predict: (idCol, pred_lang, hits) — per document, the language whose
    * profile contains the most of the document's DISTINCT trigrams; ties
    * (including the all-zero short-text case) go to the lexicographically
    * first language, so every document gets a deterministic verdict. */
  def predict(docs: DataFrame, idCol: String, textCol: String,
              profiles: DataFrame): DataFrame = {
    val docGrams = docs.select(col(idCol), explode(charTrigrams(col(textCol)))
      .as("gram"))
    val hits = docGrams
      .join(broadcast(profiles.select("lang", "gram")), "gram")
      .groupBy(col(idCol), col("lang")).agg(count(lit(1)).as("hits"))
    val langs = profiles.select("lang").distinct()
    val full = docs.select(col(idCol)).crossJoin(broadcast(langs))
      .join(hits, Seq(idCol, "lang"), "left")
      .select(col(idCol), col("lang"), coalesce(col("hits"), lit(0L)).as("hits"))
    val pick = min(struct(-col("hits"), col("lang"), col("hits").as("h")))
    full.groupBy(col(idCol))
      .agg(pick.as("__p"))
      .select(col(idCol), col("__p.lang").as("pred_lang"),
        col("__p.h").as("hits"))
  }
}
