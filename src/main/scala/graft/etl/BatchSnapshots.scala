package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** THE snapshot-per-batch state discipline, in one place — shared by every
  * `foreachBatch` sink whose state is a monoid (RFM, skyline, k-means
  * stats, DSIR histograms) and therefore has no append form: advance(K)
  * re-derives from the latest snapshot STRICTLY BELOW K and
  * dynamic-overwrites `bid=K`, so an at-least-once replay re-derives from
  * the same predecessor and rewrites its own partition with identical
  * content; snapshots below the caller's replay barrier compact via
  * [[SnapshotIO.compactBatchPartitions]]-style folding or plain deletes.
  *
  * Versioning note (why bid partitions suffice where
  * [[VersionedSnapshot]] needs manifests): a snapshot-per-batch state is
  * REWRITTEN WHOLE each batch, so every `bid=K` partition already IS a
  * complete, immutable version — `latest(belowBid = K+1)` is exact time
  * travel to the state after batch K (BatchSnapshotsSpec pins it), the
  * replay barrier is the retention policy, and dynamic partition
  * overwrite is the commit. [[VersionedSnapshot]]'s manifest layer earns
  * its cost only for APPEND-form tables, where a version is a file SET
  * no single directory captures.
  *
  * Extracted after the pattern's FOURTH copy: the max(bid)-over-zero-rows
  * NPE had to be patched per copy in round 12 (rfmStateFrom, frontFrom) —
  * a drift class this single implementation retires. Two deliberate
  * details every caller inherits:
  *   - `bid` is a PARTITION column, so small values read back as INT —
  *     reads go through `Number.longValue`, never a long cast;
  *   - a dir with no snapshots (pre-first-commit, post-compaction) reads
  *     as the caller's EMPTY state, never an NPE. */
object BatchSnapshots {

  /** The latest snapshot under `dir` (optionally strictly below
    * `belowBid`), projected to `cols` — or `empty` when the dir is absent
    * or holds no qualifying snapshot. */
  def latest(spark: SparkSession, dir: String, cols: Seq[String],
             empty: => DataFrame, belowBid: Option[Long] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p)) return empty
    // a dir that EXISTS but holds no parquet footers (every bid= partition
    // compacted away, only _SUCCESS/markers left) must read as the empty
    // state too — spark.read.parquet would throw schema-inference instead
    if (!hasParquetFile(f, p)) return empty
    val all = spark.read.parquet(dir)
    val snaps = belowBid.fold(all)(b => all.filter(col("bid") < b))
    val last = snaps.agg(max(col("bid"))).head().getAs[Number](0)
    if (last == null) empty
    else snaps.filter(col("bid") === last.longValue).select(cols.map(col): _*)
  }

  /** Any non-hidden `.parquet` file under `p`, recursively — the
    * schema-inference guard for [[latest]]. The walk short-circuits on the
    * first hit and the dir is snapshot-sized (a handful of `bid=`
    * partitions between compactions), so this is not an O(table) listing. */
  private def hasParquetFile(f: org.apache.hadoop.fs.FileSystem,
                             p: org.apache.hadoop.fs.Path): Boolean =
    f.listStatus(p).exists { st =>
      val name = st.getPath.getName
      if (name.startsWith("_") || name.startsWith(".")) false
      else if (st.isDirectory) hasParquetFile(f, st.getPath)
      else name.endsWith(".parquet")
    }

  /** ALL rows landed by batches STRICTLY below `belowBid` — for APPEND
    * dirs (one partition per batch, each batch its own rows: the raw-event
    * history the late-data sinks rescan), where [[latest]]'s
    * one-snapshot-wins read would be wrong. Empty-safe like [[latest]]. */
  def allBelow(spark: SparkSession, dir: String, belowBid: Long,
               cols: Seq[String], empty: => DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val f = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!f.exists(p) || !hasParquetFile(f, p)) return empty
    spark.read.parquet(dir).filter(col("bid") < belowBid)
      .select(cols.map(col): _*)
  }

  /** Watermark floor for the late-aware sinks' first batch: nothing can
    * be "late" before anything was folded. Post-1582 on purpose — an
    * empty first micro-batch persists the floor, and Spark's parquet
    * writer (datetimeRebaseModeInWrite = EXCEPTION) refuses ancient
    * dates. */
  val TsFloor: java.sql.Timestamp =
    java.sql.Timestamp.valueOf("1900-01-01 00:00:00")

  private def floorDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(TsFloor).toDF("wm")
  }

  /** The late-aware sinks' shared events + watermark read step (extracted
    * at its second copy — the funnelBatch/sessionsBatch protocol must
    * never drift apart): land the batch's raw rows under
    * `stateDir/events/bid=batchId` FIRST (history reads filter
    * `bid < K`, so a crash between this write and the state landing
    * replays cleanly), then return the strictly-below-K history frame
    * and the running-max watermark strictly below K (the floor when no
    * batch has landed). The caller advances its state through a
    * late-aware route against exactly these two, then calls
    * [[advanceWatermark]]. */
  def landEventsAndWatermark(spark: SparkSession, stateDir: String,
                             batch: DataFrame, batchId: Long)
      : (DataFrame, java.sql.Timestamp) = {
    batch.withColumn("bid", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bid").parquet(s"$stateDir/events")
    val wmPrior = latest(spark, s"$stateDir/wm", Seq("wm"),
      floorDf(spark), belowBid = Some(batchId)).head().getTimestamp(0)
    val history = allBelow(spark, s"$stateDir/events", batchId,
      batch.columns.toSeq, batch.filter(lit(false)))
    (history, wmPrior)
  }

  /** [[landEventsAndWatermark]]'s closing half: fold the batch's max
    * event time into the 1-row watermark snapshot under
    * `stateDir/wm/bid=batchId`. `batchTs` is the batch projected to one
    * timestamp column (any name). */
  def advanceWatermark(spark: SparkSession, stateDir: String,
                       batchId: Long, batchTs: DataFrame): Unit = {
    advanceAndLand(spark, s"$stateDir/wm", batchId, Seq("wm"),
      floorDf(spark))(prior =>
      prior.unionByName(batchTs.toDF("wm"))
        .agg(max(col("wm")).as("wm"))
        .select(coalesce(col("wm"), lit(TsFloor)).as("wm")))
    ()
  }

  /** One sink step: advance the latest-below-`batchId` snapshot with
    * `advance`, land the result under `dir/bid=batchId` via dynamic
    * partition overwrite, return the landed (checkpointed) state. */
  def advanceAndLand(spark: SparkSession, dir: String, batchId: Long,
                     cols: Seq[String], empty: => DataFrame)
                    (advance: DataFrame => DataFrame): DataFrame = {
    val prior = latest(spark, dir, cols, empty, belowBid = Some(batchId))
    val next = advance(prior).localCheckpoint()
    next.withColumn("bid", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bid").parquet(dir)
    next
  }
}
