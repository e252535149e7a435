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
    */
  def runIncremental(spark: SparkSession, source: DataFrame, cursorCol: String,
                     transform: DataFrame => DataFrame, keys: Seq[String],
                     targetDir: String, logDir: String,
                     sourceName: String): RunReport = {
    val start = new Timestamp(System.currentTimeMillis())
    val wmBefore = EtlLog.readWatermark(spark, logDir, sourceName)

    // bootstrap: first run starts from min(cursor) inclusive (ref `:235`)
    val (slice, strict) = wmBefore match {
      case Some(wm) => (EtlLog.incremental(source, cursorCol, wm, strict = true), true)
      case None =>
        val min = EtlLog.bootstrap(source, cursorCol)
        (min.map(m => EtlLog.incremental(source, cursorCol, m, strict = false))
          .getOrElse(source.limit(0)), false)
    }

    // probe-and-branch (ref `:606-615`): empty slice → skip, but still log
    val extracted = slice.cache()
    val n = extracted.count()
    try {
      if (n == 0) {
        EtlLog.append(spark, logDir, EtlLog.LogEntry(
          java.util.UUID.randomUUID().toString, sourceName, 0, start,
          new Timestamp(System.currentTimeMillis()),
          wmBefore.getOrElse(start), success = true, "skipped_no_new_data", ""))
        return RunReport(sourceName, 0, wmBefore, wmBefore, skipped = true)
      }

      // watermark advances to the DATA max, never the wall clock (ref `:475-480`)
      val wmAfter = Option(extracted.agg(max(col(cursorCol))).head().getTimestamp(0))

      val transformed = transform(extracted)
      val target = scala.util.Try(spark.read.parquet(targetDir)).toOption
      val merged = target match {
        case Some(t) => Merge.upsert(t, transformed, keys)
        case None => transformed
      }
      val staged = merged.cache()
      staged.count()
      staged.write.mode("overwrite").parquet(targetDir)
      staged.unpersist()

      EtlLog.append(spark, logDir, EtlLog.LogEntry(
        java.util.UUID.randomUUID().toString, sourceName, n, start,
        new Timestamp(System.currentTimeMillis()),
        wmAfter.getOrElse(wmBefore.getOrElse(start)), success = true, "success", ""))
      RunReport(sourceName, n, wmBefore, wmAfter, skipped = false)
    } catch {
      case e: Throwable =>
        // log written on failure too (ref `:510-537`)
        EtlLog.append(spark, logDir, EtlLog.LogEntry(
          java.util.UUID.randomUUID().toString, sourceName, n, start,
          new Timestamp(System.currentTimeMillis()),
          wmBefore.getOrElse(start), success = false, "failed", e.getMessage))
        throw e
    } finally extracted.unpersist()
  }
}
