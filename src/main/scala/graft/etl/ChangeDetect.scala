// (Forget lives in this file with ChangeDetect: both are the anti-join
// family over keyed snapshots.)
package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Change detection: full-row diff then key-level split into modified vs
  * inserted (SURVEY §2.8 U3, §2.2 P11/P12; reference:
  * `ETL Incremental Load….ipynb` cells 18-20).
  *
  * The reference does this in driver-memory pandas (`~isin` over row tuples);
  * here it is one distributed plan: `exceptAll` (null-safe, unlike the pandas
  * NaN!=NaN quirk — documented drift, SURVEY §7.4) followed by a semi/anti
  * split on the business keys. Three shuffles on the same key set; Spark
  * reuses the exchange where plans share the `changes` subtree.
  *
  * Known Spark 4.1 quirk (GraftProperties works around it): feeding
  * `dropDuplicates` outputs from the SAME lineage into both sides of
  * `exceptAll` can hit INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND in BindReferences;
  * dedup upstream of the split (or from independent scans, the normal case)
  * is unaffected.
  */
object ChangeDetect {

  final case class ChangeSet(changed: DataFrame, modified: DataFrame, inserted: DataFrame)

  /** U3 + P12: changed = source ∖ target (all columns, multiset); modified =
    * changed rows whose key already exists in target; inserted = the rest. */
  def split(source: DataFrame, target: DataFrame, keys: Seq[String]): ChangeSet = {
    val changed = source.exceptAll(target)
    val targetKeys = target.select(keys.map(col): _*)
    ChangeSet(
      changed = changed,
      modified = changed.join(targetKeys, keys, "left_semi"),
      inserted = changed.join(targetKeys, keys, "left_anti"))
  }

  /** The partition property the notebooks rely on: modified ∪ inserted =
    * changed (tested in ChangeDetectSpec). */
  def tagged(source: DataFrame, target: DataFrame, keys: Seq[String]): DataFrame = {
    val cs = split(source, target, keys)
    cs.modified.withColumn("change_type", lit("modified"))
      .unionByName(cs.inserted.withColumn("change_type", lit("inserted")))
  }

  /** What [[forget]] hands back: the CLEANED table plans (write each via
    * `SnapshotIO.replace` to actually apply the deletion) plus the audit
    * rows the governance log wants. */
  final case class ForgetResult(cleaned: Map[String, DataFrame], audit: DataFrame)

  /** Delete propagation ("forget these subjects everywhere"): for each
    * named table, a broadcast anti-join plan with every row keyed to an id
    * in `subjects` removed (`cleaned` — the caller persists it; an audit
    * alone deletes nothing), and the audit —
    * (table_name, rows_before, rows_after, rows_deleted). The
    * deletion-request set is tiny next to the tables, so no fact table
    * shuffles. The audit costs ONE scan per table (a broadcast LEFT join
    * tags deleted rows and both counts fall out of one aggregate); each
    * cleaned plan pays its own scan only when actually written. */
  def forget(subjects: DataFrame, subjectKey: String,
             tables: Seq[(String, DataFrame, String)]): ForgetResult = {
    val keys = broadcast(subjects.select(col(subjectKey).as("__forget_id")).distinct())
    val audits = tables.map { case (name, df, keyCol) =>
      df.join(keys, df(keyCol) === col("__forget_id"), "left")
        .agg(count(lit(1)).as("rows_before"),
          count(col("__forget_id")).as("rows_deleted"))
        .select(lit(name).as("table_name"), col("rows_before"),
          (col("rows_before") - col("rows_deleted")).as("rows_after"),
          col("rows_deleted"))
    }
    val cleaned = tables.map { case (name, df, keyCol) =>
      name -> df.join(keys, df(keyCol) === col("__forget_id"), "left_anti")
    }.toMap
    ForgetResult(cleaned, audits.reduce(_ unionByName _))
  }
}
