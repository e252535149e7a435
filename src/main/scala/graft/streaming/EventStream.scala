package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming slice (SURVEY §2.10). The reference has only
  * micro-batch polling (T1) and disabled Kafka plumbing (T2/T3); this module
  * is the Spark-native upgrade: the SAME logical plans as the batch queries,
  * run incrementally with watermarks.
  *
  * At scale: the hourly rollup is a streaming partial aggregate — state is
  * one row per (window, event_type); sessionization keeps one state object
  * per active user, evicted by event-time timeout, so state size tracks
  * ACTIVE keys, not history.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionState(start: Long, end: Long, n: Long, total: Double)

  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Long,
                           total_value: Double)

  /** T1 as a stream: tumbling 1-hour buckets with a lateness watermark —
    * identical output schema to batch query q22_event_hourly_buckets. */
  def hourlyBuckets(events: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Custom stateful operator: event-time sessionization with a gap timeout.
    * One state object per active user; a session closes (and emits) when the
    * watermark passes its end + gap. */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "10 minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start),
              new Timestamp(s.end), s.n, s.total))
          } else {
            val events = batch.toSeq
            val lo = events.map(_.ts.getTime).min
            val hi = events.map(_.ts.getTime).max
            val merged = state.getOption match {
              case Some(s) => SessionState(math.min(s.start, lo), math.max(s.end, hi),
                s.n + events.size, s.total + events.map(_.value).sum)
              case None => SessionState(lo, hi, events.size, events.map(_.value).sum)
            }
            state.update(merged)
            state.setTimeoutTimestamp(merged.end + gapMs)
            Iterator.empty
          }
        })
  }

  /** Streaming exactly-once-per-key dedup: drops re-deliveries of the same
    * key arriving within the watermark horizon — state holds one entry per
    * key seen, evicted as the watermark passes (bounded by the horizon, not
    * the stream length). The streaming face of Dedup.exact for at-least-once
    * ingestion paths. */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
                           tsCol: String, horizon: String = "1 hour"): DataFrame =
    events.withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** T3 CDC-consumer sink shape: each micro-batch upserts into a parquet
    * snapshot target via the engine's Merge operator — the Structured
    * Streaming equivalent of the reference's Kafka-topic-to-table apply loop
    * (`scripts/test/transform.py:46-83`). Reads the current snapshot,
    * merges, rewrites — same semantics as `dags/upsert_utils.py`. */
  def upsertBatch(targetDir: String, keys: Seq[String])(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val merged =
      if (graft.etl.SnapshotIO.exists(spark, targetDir))
        graft.operators.Merge.upsert(spark.read.parquet(targetDir), batch, keys)
      else batch
    // staging + swap — the merged plan reads the target it replaces
    graft.etl.SnapshotIO.replace(spark, merged, targetDir)
  }
}
