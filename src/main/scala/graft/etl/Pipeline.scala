package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Merge

/** The reference's flagship lifecycle as ONE composed Spark plan (SURVEY
  * §3.1/§7.2): watermark read → bootstrap → incremental scan → transform →
  * keyed merge into the target snapshot → log append.
  *
  * Where the reference crosses four process boundaries (Airflow task → MSSQL
  * cursor → PG bulk insert → Spark JDBC reread, `dags/hanger_lane.py:558-809`),
  * this collapses into: one incremental scan (cursor predicate pushed to the
  * source), the caller's transform (star join / decodes / rollup — all
  * lazy), one merge shuffle, one log-row append. No driver-side row bounce.
  */
object Pipeline {

  final case class RunReport(
      source: String,
      extracted: Long,
      watermarkBefore: Option[Timestamp],
      watermarkAfter: Option[Timestamp],
      skipped: Boolean)

  /** Run one incremental load.
    *
    * @param source     source table (any DataFrame; predicate pushes into it)
    * @param cursorCol  monotone extraction cursor (`created_at` in the reference)
    * @param transform  the business transform applied to the extracted slice
    * @param keys       merge keys of the target snapshot
    * @param targetDir  parquet snapshot dir (created on first run)
    * @param logDir     EtlLog dir (watermark state)
    * @param sourceName lineage tag (`source_connection`)
    * @param retry      transient-failure policy for the probe and the
    *                   snapshot write (ref `retry_on_exception`,
    *                   `dags/hanger_lane.py:81-109`); default = no retry
    * @param skipOnProbeFailure the reference's probe branch
    *                   (`hanger_lane.py:624-644`): when the extraction probe
    *                   still fails after retries, log-and-skip this source
    *                   (multi-source loops keep going) instead of raising
    * @param mergeOrder last-write-wins ordering for the merge when one
    *                   slice carries several rows per key (a key updated
    *                   twice between runs): without it the survivor is an
    *                   arbitrary dropDuplicates pick — possibly the STALE
    *                   row. Pass `Some(col(cursorCol))` whenever the
    *                   transform keeps the cursor column (the reference's
    *                   batches are cursor-ordered for the same reason,
    *                   `dags/hanger_lane.py:352-357`)
    */
  def runIncremental(spark: SparkSession, source: DataFrame, cursorCol: String,
                     transform: DataFrame => DataFrame, keys: Seq[String],
                     targetDir: String, logDir: String,
                     sourceName: String,
                     retry: Retry.Policy = Retry.none,
                     skipOnProbeFailure: Boolean = false,
                     mergeOrder: Option[Column] = None): RunReport = {
    val start = new Timestamp(System.currentTimeMillis())
    // never a wall-clock watermark: a skip/failure before any data exists
    // logs the epoch, which cannot mask rows landed later (ref invariant:
    // watermark comes from the DATA max, `dags/hanger_lane.py:475-480`)
    val epoch = new Timestamp(0L)
    val wmBefore = EtlLog.readWatermark(spark, logDir, sourceName)

    var extracted: DataFrame = null
    var n = 0L // visible to the failure log even if the probe itself fails
    try {
      // Extraction probe (ref `:606-615`): bootstrap → incremental slice →
      // count, retried AS A UNIT — a transient source failure during the
      // bootstrap min() retries the same as one during the count. If it
      // still fails and the caller chose skip-vs-abort (ref `:624-644`),
      // log the failure row and skip this source.
      val probed =
        try Right(Retry.withRetry(retry) {
          // bootstrap: first run starts from min(cursor) inclusive (ref `:235`)
          val slice = wmBefore match {
            case Some(wm) => EtlLog.incremental(source, cursorCol, wm, strict = true)
            case None =>
              EtlLog.bootstrap(source, cursorCol)
                .map(m => EtlLog.incremental(source, cursorCol, m, strict = false))
                .getOrElse(source.limit(0))
          }
          if (extracted != null) extracted.unpersist() // prior failed attempt
          extracted = slice.cache()
          extracted.count()
        }._1)
        catch { case e: Throwable if skipOnProbeFailure => Left(e) }
      probed match {
        case Left(e) =>
          EtlLog.append(spark, logDir, EtlLog.LogEntry(
            java.util.UUID.randomUUID().toString, sourceName, 0, start,
            new Timestamp(System.currentTimeMillis()),
            wmBefore.getOrElse(epoch), success = false, "skipped_probe_failed",
            String.valueOf(e.getMessage)))
          return RunReport(sourceName, 0, wmBefore, wmBefore, skipped = true)
        case Right(c) => n = c
      }
      if (n == 0) {
        EtlLog.append(spark, logDir, EtlLog.LogEntry(
          java.util.UUID.randomUUID().toString, sourceName, 0, start,
          new Timestamp(System.currentTimeMillis()),
          wmBefore.getOrElse(epoch), success = true, "skipped_no_new_data", ""))
        return RunReport(sourceName, 0, wmBefore, wmBefore, skipped = true)
      }

      // watermark advances to the DATA max, never the wall clock
      val wmAfter = Option(extracted.agg(max(col(cursorCol))).head().getTimestamp(0))

      val transformed = transform(extracted)
      // existence via the Hadoop FS (java.io.File lies on HDFS/S3); a READ
      // failure of an existing snapshot must raise — swallowing it would
      // silently truncate the target to this run's delta
      // first run routes through the SAME per-key dedup as every later one
      // (a duplicate-key bootstrap batch written verbatim would break
      // re-run idempotence — same reasoning as Merge.upsertPartitioned)
      val merged =
        if (SnapshotIO.hasParquet(spark, targetDir))
          Merge.upsert(spark.read.parquet(targetDir), transformed, keys, mergeOrder)
        else Merge.upsert(transformed.limit(0), transformed, keys, mergeOrder)
      // staging + swap, never overwrite the directory the plan reads;
      // the write retries transient failures under the same policy
      Retry.withRetry(retry)(SnapshotIO.replace(spark, merged, targetDir))

      EtlLog.append(spark, logDir, EtlLog.LogEntry(
        java.util.UUID.randomUUID().toString, sourceName, n, start,
        new Timestamp(System.currentTimeMillis()),
        wmAfter.getOrElse(wmBefore.getOrElse(epoch)), success = true, "success", ""))
      RunReport(sourceName, n, wmBefore, wmAfter, skipped = false)
    } catch {
      case e: Throwable =>
        // log written on failure too (ref `:510-537`) — including extraction
        // failures, which is why count() lives inside this try
        EtlLog.append(spark, logDir, EtlLog.LogEntry(
          java.util.UUID.randomUUID().toString, sourceName, n, start,
          new Timestamp(System.currentTimeMillis()),
          wmBefore.getOrElse(epoch), success = false, "failed", e.getMessage))
        throw e
    } finally if (extracted != null) extracted.unpersist()
  }
}
