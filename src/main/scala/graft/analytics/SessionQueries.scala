package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Batch sessionization + sketch cardinality over the events table.
  *
  * Sessionize-batch is the lag/cumsum formulation (gap > 30 min starts a new
  * session): two windows over one (user) shuffle — the batch twin of the
  * streaming flatMapGroupsWithState operator, and exactly reproducible in
  * SQL for the oracle. The sketch query demonstrates approx_count_distinct
  * (HLL) — the 100 TB answer to exact countDistinct's shuffle of every
  * distinct value; sketches differ across engines, so it is rows-only with
  * a tolerance spec against the exact count.
  */
object SessionQueries {

  val GapMinutes = 30

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q38_sessionize_batch" -> { (s, dir) =>
      val byUser = Window.partitionBy("user_id").orderBy("ts")
      val gapSec = GapMinutes * 60L
      val sessions = Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapSec, 1L)
            .otherwise(0L))
        .withColumn("session_no", sum(col("new_session")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      sessions.groupBy("user_id", "session_no")
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .orderBy("user_id", "session_no")
    },

    // q38's declarative twin through Spark's BUILT-IN session_window: the
    // whole sessionize collapses to one groupBy — no lag/flag/cumsum
    // window cascade, and the same operator runs unchanged under
    // Structured Streaming. Break rule differs from q38 at the exact-gap
    // boundary (session_window starts a new session when the gap is
    // REACHED, q38 only when exceeded on truncated seconds), so the
    // oracle mirrors session_window's >= rule on exact timestamps.
    "q51_session_window" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"),
          session_window(col("ts"), s"$GapMinutes minutes").as("w"))
        .agg(
          min(col("ts")).as("session_start"),
          max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
        .drop("w")
        .orderBy("user_id", "session_start")
    },

    // HLL sketch cardinalities per event_type next to the exact counts.
    // The raw estimate can never hash-match another engine's sketch, so the
    // query OUTPUTS the sketch's accuracy contract instead: the exact counts
    // plus "estimate within 5% of exact" flags (rsd=0.02 → 5% ≈ 2.5σ). The
    // oracle recomputes the exact counts and asserts the flags TRUE — a
    // Spark HLL drifting out of tolerance fails the hash gate.
    "q39_approx_distinct" -> { (s, dir) =>
      def withinPct(approx: Column, exact: Column, pct: Double): Column =
        (abs(approx.cast("double") - exact.cast("double")) <=
          exact.cast("double") * pct).as("ok")
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(
          countDistinct(col("user_id")).as("exact_users"),
          countDistinct(col("event_id")).as("exact_events"),
          approx_count_distinct(col("user_id"), 0.02).as("au"),
          approx_count_distinct(col("event_id"), 0.02).as("ae"))
        .select(col("event_type"), col("exact_users"), col("exact_events"),
          withinPct(col("au"), col("exact_users"), 0.05).as("users_within_5pct"),
          withinPct(col("ae"), col("exact_events"), 0.05).as("events_within_5pct"))
        .orderBy("event_type")
    }
  )

  def rowsOnly: Set[String] = Set.empty

  def oracleSql: Map[String, String] = Map(
    "q39_approx_distinct" ->
      """SELECT event_type,
        |       COUNT(DISTINCT user_id) AS exact_users,
        |       COUNT(DISTINCT event_id) AS exact_events,
        |       TRUE AS users_within_5pct,
        |       TRUE AS events_within_5pct
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    "q38_sessionize_batch" ->
      s"""WITH marked AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         |         LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS prev_ts
         |  FROM events),
         |flagged AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |                   OR date_diff('second', prev_ts, ts) > ${GapMinutes * 60}
         |                 THEN 1 ELSE 0 END AS new_session
         |  FROM marked),
         |numbered AS (
         |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
         |  FROM flagged)
         |SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
         |       MIN(ts) AS session_start,
         |       MAX(ts) AS session_end,
         |       COUNT(*) AS n_events,
         |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM numbered
         |GROUP BY user_id, session_no
         |ORDER BY user_id, session_no""".stripMargin,

    // session_window semantics: a new session when the gap is REACHED
    // (>=), on exact microsecond timestamps
    "q51_session_window" ->
      s"""WITH marked AS (
         |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         |         LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS prev_ts
         |  FROM events),
         |flagged AS (
         |  SELECT *, CASE WHEN prev_ts IS NULL
         |                   OR ts - prev_ts >= INTERVAL $GapMinutes MINUTE
         |                 THEN 1 ELSE 0 END AS new_session
         |  FROM marked),
         |numbered AS (
         |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
         |  FROM flagged)
         |SELECT user_id,
         |       MIN(ts) AS session_start,
         |       MAX(ts) AS session_end,
         |       COUNT(*) AS n_events,
         |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
         |FROM numbered
         |GROUP BY user_id, session_no
         |ORDER BY user_id, session_start""".stripMargin
  )
}
