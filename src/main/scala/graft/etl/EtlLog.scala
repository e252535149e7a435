package graft.etl

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Watermark-driven incremental-load protocol (SURVEY §2.9) — the reference's
  * signature operator, implemented 3× there (`dags/hanger_lane.py:128-197,
  * 475-537`, `dags/ssg_gl_etl.py`, Source-Change notebook).
  *
  * State lives in an append-only parquet log (one row per extraction run,
  * schema mirroring `etl_extract_log`, `dags/create_target_pg_hl_table.py:
  * 114-132`). Semantics preserved from the reference:
  *   - watermark comes from the *data* max, never the wall clock;
  *   - the log row is written on success AND failure;
  *   - bound strictness is a parameter: the DAGs use `>` while dlt/notebooks
  *     use `>=` (`dltproject/sql_database/helpers.py:52-84`).
  *
  * Scale note: the log is tiny (one row per run); reading `max()` over it is
  * a broadcastable scalar. The extract filter is a plain predicate on the
  * cursor column, so it pushes into the source scan (parquet stats / JDBC).
  */
object EtlLog {

  case class LogEntry(
      processlogid: String,
      source_connection: String,
      saved_count: Long,
      starttime: Timestamp,
      endtime: Timestamp,
      lastextractdatetime: Timestamp,
      success: Boolean,
      status: String,
      errormessage: String)

  /** Step 1: read current watermark — max over successful runs of one source
    * (`dags/hanger_lane.py:128-133`). Existence goes through the Hadoop FS
    * API — `java.io.File` answers false for HDFS/S3 paths, which would turn
    * every run into a full re-extract. */
  def readWatermark(spark: SparkSession, logDir: String, source: String): Option[Timestamp] = {
    if (!SnapshotIO.hasParquet(spark, logDir)) return None
    val row = spark.read.parquet(logDir)
      .filter(col("source_connection") === source && col("success"))
      .agg(max(col("lastextractdatetime")))
      .head()
    Option(row.getTimestamp(0))
  }

  /** Step 2: bootstrap — min(cursor) of the source when no watermark exists
    * (`dags/hanger_lane.py:235`). */
  def bootstrap(source: DataFrame, cursorCol: String): Option[Timestamp] =
    Option(source.agg(min(col(cursorCol))).head().getTimestamp(0))

  /** Step 3: probe — count of new rows; the caller branches extract-vs-skip
    * (`dags/hanger_lane.py:606-615`). */
  def probe(source: DataFrame, cursorCol: String, wm: Timestamp, strict: Boolean = true): Long =
    incremental(source, cursorCol, wm, strict).count()

  /** Step 4: the incremental scan itself — `cursor > wm` (strict, DAG flavor)
    * or `>=` (dlt flavor). The predicate lands in the source scan. */
  def incremental(source: DataFrame, cursorCol: String, wm: Timestamp,
                  strict: Boolean = true): DataFrame =
    if (strict) source.filter(col(cursorCol) > lit(wm))
    else source.filter(col(cursorCol) >= lit(wm))

  /** P14: OR-of-timestamps change filter — rows created OR modified since wm
    * (`ETL Source Change Detection.ipynb` cells 11, 20). */
  def changedSince(source: DataFrame, createdCol: String, modifiedCol: String,
                   wm: Timestamp): DataFrame =
    source.filter(col(createdCol) >= lit(wm) || col(modifiedCol) >= lit(wm))

  /** Step 5: append the run log entry — written for failures too
    * (`dags/hanger_lane.py:510-537`). */
  def append(spark: SparkSession, logDir: String, entry: LogEntry): Unit = {
    import spark.implicits._
    Seq(entry).toDF().write.mode("append").parquet(logDir)
  }
}
