package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed merge / upsert without a mutable store (SURVEY §2.8 U4-U8).
  *
  * The reference upserts via PG staging tables + `ON CONFLICT DO UPDATE`
  * (`dags/upsert_utils.py:44-89`); the snapshot-rewrite equivalent here is
  * `target ∖ keys(updates) ∪ updates`. Conflict resolution inside the updates
  * batch is last-write-wins by an ordering column (matches the watermark
  * ordering of the reference's extraction, `dags/hanger_lane.py:357`).
  *
  * Properties (ScalaCheck-tested): idempotent (re-merging the same batch is a
  * no-op) and key-unique output when inputs are key-unique.
  *
  * Scale: one shuffle of each side on the merge keys (anti join), plus the
  * window dedup of the (much smaller) updates batch. At 100 TB the target
  * side should be partitioned/bucketed by the keys so only matching files
  * rewrite — the operator itself never collects.
  */
object Merge {

  /** U4/U5/U8: upsert `updates` into `target` on `keys`. Null merge keys are
    * matched null-safely (a null-keyed target row IS replaced by a
    * null-keyed update) — a plain equi anti-join would never match them and
    * the re-merge would duplicate the row each run, breaking idempotence. */
  def upsert(target: DataFrame, updates: DataFrame, keys: Seq[String],
             lastWriteOrder: Option[Column] = None): DataFrame = {
    val deduped = lastWriteOrder match {
      case Some(ord) =>
        val w = Window.partitionBy(keys.map(col): _*).orderBy(ord.desc)
        updates.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
      case None => updates.dropDuplicates(keys)
    }
    val updateKeys = deduped.select(keys.map(k => col(k).as(s"__k_$k")): _*)
    val cond = keys.map(k => col(k) <=> col(s"__k_$k")).reduce(_ && _)
    target.join(updateKeys, cond, "left_anti")
      .unionByName(deduped)
  }

  /** U7: plain append branch (insert-only loads). */
  def append(target: DataFrame, inserts: DataFrame): DataFrame =
    target.unionByName(inserts)

  /** Partition-pruned snapshot merge — the 100 TB upsert: the target lives
    * as parquet partitioned by `partitionCol`, and only partitions that
    * contain updated keys are read and rewritten. With dynamic partition
    * overwrite, untouched partitions' files are never opened — merge cost
    * scales with the DELTA's partition footprint, not the snapshot size.
    *
    * Requires `partitionCol` functionally determined by the merge keys
    * (the reference's aggregate tables are keyed by date+dims, so the date
    * partition is part of the key — `create_target_pg_hl_table.py:75-77`).
    */
  def upsertPartitioned(spark: org.apache.spark.sql.SparkSession, targetDir: String,
                        updates: DataFrame, keys: Seq[String],
                        partitionCol: String): Unit = {
    import graft.etl.SnapshotIO
    if (!SnapshotIO.hasParquet(spark, targetDir)) {
      // bootstrap through the SAME key-dedup as every later load: a first
      // batch with duplicate keys written verbatim would key-duplicate the
      // snapshot and break re-run idempotence across the first-load boundary
      upsert(updates.limit(0), updates, keys)
        .write.partitionBy(partitionCol).mode("overwrite").parquet(targetDir)
      return
    }
    // driver-side scalar list of touched partitions → pruned scan. isin
    // never matches null, so a touched null partition needs its own
    // disjunct — without it the existing null-partition rows vanish from
    // the merge but their directory still gets swapped.
    val touched = updates.select(col(partitionCol)).distinct()
      .collect().map(_.get(0))
    val (nullTouched, nonNull) = touched.partition(_ == null)
    val partFilter = {
      val in = if (nonNull.nonEmpty) col(partitionCol).isin(nonNull: _*) else lit(false)
      if (nullTouched.nonEmpty) in || col(partitionCol).isNull else in
    }
    val target = spark.read.parquet(targetDir).filter(partFilter)
    val merged = upsert(target, updates, keys)
    // staging + per-partition swap: the merged plan reads the very files a
    // direct overwrite would delete mid-job (SnapshotIO scaladoc)
    SnapshotIO.replacePartitions(spark, merged, targetDir, partitionCol)
  }
}
