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

  /** Mid-month watermark splitting the one-month events fixture into two
    * loads for the incremental twins (q196/q197) — mirrored verbatim in
    * their oracles. */
  val WatermarkSplit = "2024-01-16 00:00:00"

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
    },

    // Event-funnel conversion (view → click → purchase), the min-timestamp
    // cascade: a user reaches a step iff a step event strictly follows
    // their earliest completion of the previous one. One filtered
    // aggregate + one entity-key join per step — no per-user event arrays.
    "q192_event_funnel" -> { (s, dir) =>
      graft.operators.Aggregates.funnel(Tables.events(s, dir),
        col("user_id"), col("ts"),
        Seq("1_view" -> (col("event_type") === "view"),
          "2_click" -> (col("event_type") === "click"),
          "3_purchase" -> (col("event_type") === "purchase")))
        .orderBy("step_idx")
    },

    // RFM segmentation over orders: per-customer recency (days before the
    // dataset horizon), frequency, monetary (exact cents), exact rank
    // quintiles via the composed global row number (no SinglePartition
    // window), customers counted per (R,F,M) cell.
    "q194_rfm_segments" -> { (s, dir) =>
      val per = Tables.orders(s, dir).groupBy(col("o_custkey"))
        .agg(
          datediff(lit("1998-12-31").cast("date"),
            max(col("o_orderdate")).cast("date")).cast("long").as("recency_days"),
          count(lit(1)).as("frequency"),
          sum((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
            .as("monetary_cents"))
      graft.operators.Aggregates.rfmSegments(per, "o_custkey",
          "recency_days", "frequency", "monetary_cents")
        .orderBy("r_q", "f_q", "m_q")
    },

    // Retention cohort matrix (daily grain — the fixture spans one month):
    // users bucket by first-activity day; each cell counts that cohort's
    // users active N days later. The funnel's longitudinal twin.
    "q193_retention_cohorts" -> { (s, dir) =>
      graft.operators.Aggregates.retentionCohorts(
          Tables.events(s, dir), col("user_id"), col("ts"))
        .orderBy("cohort_day", "day_offset")
    },

    // q38's incremental twin: each watermark load re-sessionizes ONLY the
    // batch, then stitches at the boundary — each user's last state
    // session vs first batch session, one merge-or-not decision by
    // exactly q38's gap rule (a merge cannot cascade: state sessions are
    // already gap-separated, and so are batch sessions). Totals carry as
    // exact DECIMAL inside the state so stitched sums equal a recompute's.
    // Output is the full session table after each phase; the oracle
    // recomputes q38 from raw events at both.
    "q205_incremental_sessions" -> { (s, dir) =>
      val sess = graft.operators.Sessions
      val ev = Tables.events(s, dir)
      val split = lit(WatermarkSplit).cast("timestamp")
      val gapSec = GapMinutes * 60L
      val st1 = sess.advance(sess.emptyState(s), ev.filter(col("ts") < split),
        col("user_id"), col("ts"), col("value"), gapSec).localCheckpoint()
      val st2 = sess.advance(st1, ev.filter(col("ts") >= split),
        col("user_id"), col("ts"), col("value"), gapSec).localCheckpoint()
      sess.report(st1).withColumn("phase", lit("1_after_b1"))
        .unionByName(sess.report(st2).withColumn("phase", lit("2_after_b2")))
        .select("phase", "user_id", "session_no", "session_start",
          "session_end", "n_events", "total_value")
        .orderBy("phase", "user_id", "session_no")
    },

    // q192's incremental twin — the reference's watermark protocol (§2.9)
    // applied to the funnel: events split at a mid-month watermark, each
    // half advances an entity-grain cascade state by a pure min/merge
    // fold, and the output reports the funnel AFTER EACH batch. The
    // oracle recomputes both phases from raw events with the q192
    // cascade — incremental ≡ recompute, chained (historical events are
    // never rescanned by the engine; that's the 100 TB point).
    "q196_incremental_funnel" -> { (s, dir) =>
      val agg = graft.operators.Aggregates
      val steps = Seq("1_view" -> (col("event_type") === "view"),
        "2_click" -> (col("event_type") === "click"),
        "3_purchase" -> (col("event_type") === "purchase"))
      val ev = Tables.events(s, dir)
      val split = lit(WatermarkSplit).cast("timestamp")
      val st1 = agg.funnelAdvance(agg.funnelEmptyState(s, steps.length),
          ev.filter(col("ts") < split), col("user_id"), col("ts"), steps)
        .localCheckpoint()
      val st2 = agg.funnelAdvance(st1,
          ev.filter(col("ts") >= split), col("user_id"), col("ts"), steps)
        .localCheckpoint()
      val names = steps.map(_._1)
      agg.funnelStateCounts(st1, names).withColumn("phase", lit("1_after_b1"))
        .unionByName(agg.funnelStateCounts(st2, names)
          .withColumn("phase", lit("2_after_b2")))
        .select("phase", "step", "step_idx", "entities")
        .orderBy("phase", "step_idx")
    },

    // q193's incremental twin: the state is the distinct entity-day frame
    // (bounded by users × days, not event volume), advanced by an
    // idempotent union — exact under ANY batching, not just watermark
    // loads, because the cohort min recomputes from state. Output is the
    // full matrix after each batch; the oracle recomputes both phases
    // from raw events.
    "q197_incremental_retention" -> { (s, dir) =>
      val agg = graft.operators.Aggregates
      val ev = Tables.events(s, dir)
      val split = lit(WatermarkSplit).cast("timestamp")
      val d1 = agg.retentionAdvance(agg.retentionEmptyState(s),
          ev.filter(col("ts") < split), col("user_id"), col("ts"))
        .localCheckpoint()
      val d2 = agg.retentionAdvance(d1,
          ev.filter(col("ts") >= split), col("user_id"), col("ts"))
        .localCheckpoint()
      agg.retentionMatrix(d1).withColumn("phase", lit("1_after_b1"))
        .unionByName(agg.retentionMatrix(d2)
          .withColumn("phase", lit("2_after_b2")))
        .select("phase", "cohort_day", "day_offset", "active_users")
        .orderBy("phase", "cohort_day", "day_offset")
    },

    // q194's incremental twin: per-customer (last-order date, frequency,
    // cents) is a pure MONOID (max/sum/sum), so the state advances exactly
    // under ANY batching — the quintile ranks (global properties that
    // cannot fold) recompute from the ENTITY-GRAIN state, never from order
    // history. Output is the segment matrix after each batch; the oracle
    // recomputes both phases from raw orders.
    "q199_incremental_rfm" -> { (s, dir) =>
      val agg = graft.operators.Aggregates
      val ord = Tables.orders(s, dir)
      val cents = (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
      def seg(state: org.apache.spark.sql.DataFrame) =
        agg.rfmSegments(
          state.select(col("_e").as("o_custkey"),
            datediff(lit("1998-12-31").cast("date"), col("_last"))
              .cast("long").as("recency_days"),
            col("_freq").as("frequency"), col("_cents").as("monetary_cents")),
          "o_custkey", "recency_days", "frequency", "monetary_cents")
      val st1 = agg.rfmAdvance(agg.rfmEmptyState(s),
          ord.filter(col("o_orderkey") % 3 =!= 0),
          col("o_custkey"), col("o_orderdate"), cents)
        .localCheckpoint()
      val st2 = agg.rfmAdvance(st1, ord.filter(col("o_orderkey") % 3 === 0),
          col("o_custkey"), col("o_orderdate"), cents)
        .localCheckpoint()
      seg(st1).withColumn("phase", lit("1_after_b1"))
        .unionByName(seg(st2).withColumn("phase", lit("2_after_b2")))
        .select("phase", "r_q", "f_q", "m_q", "n_customers")
        .orderBy("phase", "r_q", "f_q", "m_q")
    },

    // q196's LATE-DATA twin: batch 2 deliberately contains events EARLIER
    // than batch 1's max (the event_id % 7 == 3 stragglers held back past
    // the watermark), which the pure min/merge fold cannot absorb — the
    // late-aware advance detects them, recomputes ONLY the affected
    // entities from an entity-scoped history rescan, and merges back. The
    // oracle recomputes both phases from raw events: late-aware
    // incremental ≡ recompute, under out-of-order delivery.
    "q207_funnel_late" -> { (s, dir) =>
      val agg = graft.operators.Aggregates
      val steps = Seq("1_view" -> (col("event_type") === "view"),
        "2_click" -> (col("event_type") === "click"),
        "3_purchase" -> (col("event_type") === "purchase"))
      val ev = Tables.events(s, dir)
      val split = lit(WatermarkSplit).cast("timestamp")
      // batch frames PINNED (the funnelBatch sink's own discipline —
      // foreachBatch inputs are materialized once): b2 feeds three operator
      // passes (late-set scan, blind fold, affected slice) and b1 two
      // (batch-1 fold, history slice); un-pinned, each pass re-scanned the
      // events parquet (measured: ~6 redundant 2-task scans, ~1 s each)
      val b1 = ev.filter(col("ts") < split && col("event_id") % 7 =!= 3)
        .localCheckpoint()
      val b2 = ev.filter(col("ts") >= split || col("event_id") % 7 === 3)
        .localCheckpoint()
      val st1 = agg.funnelAdvance(agg.funnelEmptyState(s, steps.length),
          b1, col("user_id"), col("ts"), steps)
        .localCheckpoint()
      val st2 = agg.funnelAdvanceLate(st1, b2, b1, col("user_id"), col("ts"),
          steps, java.sql.Timestamp.valueOf(WatermarkSplit))
        .localCheckpoint()
      val names = steps.map(_._1)
      agg.funnelStateCounts(st1, names).withColumn("phase", lit("1_after_b1"))
        .unionByName(agg.funnelStateCounts(st2, names)
          .withColumn("phase", lit("2_after_b2")))
        .select("phase", "step", "step_idx", "entities")
        .orderBy("phase", "step_idx")
    },

    // q205's LATE-DATA twin: the held-back stragglers can extend, bridge,
    // or chain-merge their users' EXISTING sessions — the boundary stitch
    // cannot express that, so the late-aware advance re-sessionizes only
    // the affected users from entity-scoped history and replaces their
    // rows. Oracle: full re-sessionization at both phases.
    "q208_sessions_late" -> { (s, dir) =>
      val sess = graft.operators.Sessions
      val ev = Tables.events(s, dir)
      val split = lit(WatermarkSplit).cast("timestamp")
      val gapSec = GapMinutes * 60L
      // batch frames pinned — the q207 rationale, same multi-pass consumers
      val b1 = ev.filter(col("ts") < split && col("event_id") % 7 =!= 3)
        .localCheckpoint()
      val b2 = ev.filter(col("ts") >= split || col("event_id") % 7 === 3)
        .localCheckpoint()
      val st1 = sess.advance(sess.emptyState(s), b1,
        col("user_id"), col("ts"), col("value"), gapSec).localCheckpoint()
      val st2 = sess.advanceLate(st1, b2, b1, col("user_id"), col("ts"),
          col("value"), gapSec, java.sql.Timestamp.valueOf(WatermarkSplit))
        .localCheckpoint()
      sess.report(st1).withColumn("phase", lit("1_after_b1"))
        .unionByName(sess.report(st2).withColumn("phase", lit("2_after_b2")))
        .select("phase", "user_id", "session_no", "session_start",
          "session_end", "n_events", "total_value")
        .orderBy("phase", "user_id", "session_no")
    },

    // The PORTABLE HLL closes q39's gap: approx_count_distinct's sketch is
    // engine-internal (tolerance-gated above), but these registers are the
    // mixp hash split 8/23 with an integer-only rank, so the oracle replays
    // them bit-for-bit AND the raw estimate exactly (all Σ2^-M terms are
    // dyadic — the double sum is exact in any order; the ln small-range
    // correction is deliberately omitted, v_zero says when it would bind).
    // Registers advance through a persisted max-monoid state across two
    // waves — the advanced state IS the union's registers, so the oracle's
    // union replay gates the incremental path too (the q185 pattern).
    "q186_hll_portable" -> { (s, dir) =>
      val state = PrepQueries.scratchTempDir("graft_q186_") + "/hll"
      val ev = Tables.events(s, dir)
      graft.operators.Sketches.hllBatch(state, Seq("event_type"), col("user_id"))(
        ev.filter(col("event_id") % 3 =!= 2), 0L)
      graft.operators.Sketches.hllBatch(state, Seq("event_type"), col("user_id"))(
        ev.filter(col("event_id") % 3 === 2), 1L)
      val regs = graft.operators.Sketches.readHllState(s, state, Seq("event_type"))
      graft.operators.Sketches.hllEstimate(regs, Seq("event_type"))
        .join(ev.groupBy("event_type")
          .agg(countDistinct(col("user_id")).as("n_true")), Seq("event_type"))
        .select(col("event_type"), col("n_true"), col("v_zero"), col("raw_est"))
        .orderBy("event_type")
    }
  )

  def rowsOnly: Set[String] = Set.empty

  /** One q38 sessionization chain, name-prefixed so q205 instantiates two
    * event slices in one oracle; ends in `<p>r(user_id, session_no,
    * session_start, session_end, n_events, total_value)`. */
  private def sessChainOn(p: String, whereClause: String): String =
    s"""${p}m AS (
       |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
       |         LAG(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) AS prev_ts
       |  FROM events $whereClause),
       |${p}f AS (
       |  SELECT *, CASE WHEN prev_ts IS NULL
       |                   OR date_diff('second', prev_ts, ts) > ${GapMinutes * 60}
       |                 THEN 1 ELSE 0 END AS new_session
       |  FROM ${p}m),
       |${p}n AS (
       |  SELECT *, SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_no
       |  FROM ${p}f),
       |${p}r AS (
       |  SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       |         MIN(ts) AS session_start, MAX(ts) AS session_end,
       |         COUNT(*) AS n_events,
       |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
       |  FROM ${p}n GROUP BY user_id, session_no)""".stripMargin

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

    "q194_rfm_segments" ->
      """WITH per AS (SELECT o_custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
        |                   DATE '1998-12-31') AS BIGINT) AS r,
        |    count(*) AS f,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |nn AS (SELECT count(*) AS n FROM per),
        |rk AS (SELECT o_custkey,
        |        row_number() OVER (ORDER BY r, o_custkey) AS kr,
        |        row_number() OVER (ORDER BY -f, o_custkey) AS kf,
        |        row_number() OVER (ORDER BY -m, o_custkey) AS km
        |      FROM per)
        |SELECT CAST((kr - 1) * 5 // nn.n + 1 AS INT) AS r_q,
        |       CAST((kf - 1) * 5 // nn.n + 1 AS INT) AS f_q,
        |       CAST((km - 1) * 5 // nn.n + 1 AS INT) AS m_q,
        |       count(*) AS n_customers
        |FROM rk CROSS JOIN nn
        |GROUP BY 1, 2, 3
        |ORDER BY r_q, f_q, m_q""".stripMargin,

    // The chained incremental-RFM oracle: the q194 pipeline recomputed
    // from raw orders at both phases.
    "q199_incremental_rfm" ->
      """WITH per1 AS (SELECT o_custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
        |                   DATE '1998-12-31') AS BIGINT) AS r,
        |    count(*) AS f,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS m
        |  FROM orders WHERE o_orderkey % 3 <> 0 GROUP BY 1),
        |n1 AS (SELECT count(*) AS n FROM per1),
        |rk1 AS (SELECT o_custkey,
        |        row_number() OVER (ORDER BY r, o_custkey) AS kr,
        |        row_number() OVER (ORDER BY -f, o_custkey) AS kf,
        |        row_number() OVER (ORDER BY -m, o_custkey) AS km
        |      FROM per1),
        |perf AS (SELECT o_custkey,
        |    CAST(date_diff('day', CAST(max(o_orderdate) AS DATE),
        |                   DATE '1998-12-31') AS BIGINT) AS r,
        |    count(*) AS f,
        |    CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |      AS BIGINT) AS m
        |  FROM orders GROUP BY 1),
        |nf AS (SELECT count(*) AS n FROM perf),
        |rkf AS (SELECT o_custkey,
        |        row_number() OVER (ORDER BY r, o_custkey) AS kr,
        |        row_number() OVER (ORDER BY -f, o_custkey) AS kf,
        |        row_number() OVER (ORDER BY -m, o_custkey) AS km
        |      FROM perf)
        |SELECT phase, r_q, f_q, m_q, n_customers FROM (
        |  SELECT '1_after_b1' AS phase,
        |         CAST((kr - 1) * 5 // n1.n + 1 AS INT) AS r_q,
        |         CAST((kf - 1) * 5 // n1.n + 1 AS INT) AS f_q,
        |         CAST((km - 1) * 5 // n1.n + 1 AS INT) AS m_q,
        |         count(*) AS n_customers
        |  FROM rk1 CROSS JOIN n1 GROUP BY 1, 2, 3, 4
        |  UNION ALL
        |  SELECT '2_after_b2',
        |         CAST((kr - 1) * 5 // nf.n + 1 AS INT),
        |         CAST((kf - 1) * 5 // nf.n + 1 AS INT),
        |         CAST((km - 1) * 5 // nf.n + 1 AS INT),
        |         count(*)
        |  FROM rkf CROSS JOIN nf GROUP BY 1, 2, 3, 4)
        |ORDER BY phase, r_q, f_q, m_q""".stripMargin,

    "q193_retention_cohorts" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
        |f AS (SELECT user_id, min(d) AS cohort FROM e GROUP BY 1)
        |SELECT CAST(cohort AS TIMESTAMP) AS cohort_day,
        |       CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
        |       count(DISTINCT e.user_id) AS active_users
        |FROM e JOIN f ON e.user_id = f.user_id
        |GROUP BY cohort, date_diff('day', cohort, d)
        |ORDER BY cohort_day, day_offset""".stripMargin,

    // The chained incremental-sessions oracle: q38 recomputed from raw
    // events at both watermark phases — equality with the engine's
    // stitched state is the incremental ≡ recompute proof.
    "q205_incremental_sessions" ->
      s"""WITH ${sessChainOn("u", s"WHERE ts < TIMESTAMP '$WatermarkSplit'")},
         |${sessChainOn("v", "")}
         |SELECT phase, user_id, session_no, session_start, session_end,
         |       n_events, total_value FROM (
         |  SELECT '1_after_b1' AS phase, * FROM ur
         |  UNION ALL
         |  SELECT '2_after_b2', * FROM vr)
         |ORDER BY phase, user_id, session_no""".stripMargin,

    // The chained incremental-funnel oracle: the q192 cascade recomputed
    // from raw events at BOTH watermark phases — equality with the
    // engine's fold-only state is the incremental ≡ recompute proof.
    "q196_incremental_funnel" ->
      s"""WITH e1 AS (SELECT * FROM events
         |            WHERE ts < TIMESTAMP '$WatermarkSplit'),
         |a1 AS (SELECT user_id, min(ts) AS t FROM e1
         |       WHERE event_type = 'view' GROUP BY 1),
         |a2 AS (SELECT e.user_id, min(e.ts) AS t FROM e1 e
         |       JOIN a1 ON e.user_id = a1.user_id AND e.ts > a1.t
         |       WHERE e.event_type = 'click' GROUP BY 1),
         |a3 AS (SELECT e.user_id, min(e.ts) AS t FROM e1 e
         |       JOIN a2 ON e.user_id = a2.user_id AND e.ts > a2.t
         |       WHERE e.event_type = 'purchase' GROUP BY 1),
         |f1 AS (SELECT user_id, min(ts) AS t FROM events
         |       WHERE event_type = 'view' GROUP BY 1),
         |f2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
         |       JOIN f1 ON e.user_id = f1.user_id AND e.ts > f1.t
         |       WHERE e.event_type = 'click' GROUP BY 1),
         |f3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
         |       JOIN f2 ON e.user_id = f2.user_id AND e.ts > f2.t
         |       WHERE e.event_type = 'purchase' GROUP BY 1)
         |SELECT phase, step, step_idx, entities FROM (
         |  SELECT '1_after_b1' AS phase, '1_view' AS step, 0 AS step_idx,
         |         (SELECT count(*) FROM a1) AS entities
         |  UNION ALL SELECT '1_after_b1', '2_click', 1, (SELECT count(*) FROM a2)
         |  UNION ALL SELECT '1_after_b1', '3_purchase', 2, (SELECT count(*) FROM a3)
         |  UNION ALL SELECT '2_after_b2', '1_view', 0, (SELECT count(*) FROM f1)
         |  UNION ALL SELECT '2_after_b2', '2_click', 1, (SELECT count(*) FROM f2)
         |  UNION ALL SELECT '2_after_b2', '3_purchase', 2, (SELECT count(*) FROM f3))
         |ORDER BY phase, step_idx""".stripMargin,

    // Late-funnel oracle: phase 1 excludes the held-back stragglers,
    // phase 2 is the full recompute — the late-aware advance must land
    // exactly there despite folding, not rescanning, the on-time rows.
    "q207_funnel_late" ->
      s"""WITH e1 AS (SELECT * FROM events
         |            WHERE ts < TIMESTAMP '$WatermarkSplit'
         |              AND event_id % 7 != 3),
         |a1 AS (SELECT user_id, min(ts) AS t FROM e1
         |       WHERE event_type = 'view' GROUP BY 1),
         |a2 AS (SELECT e.user_id, min(e.ts) AS t FROM e1 e
         |       JOIN a1 ON e.user_id = a1.user_id AND e.ts > a1.t
         |       WHERE e.event_type = 'click' GROUP BY 1),
         |a3 AS (SELECT e.user_id, min(e.ts) AS t FROM e1 e
         |       JOIN a2 ON e.user_id = a2.user_id AND e.ts > a2.t
         |       WHERE e.event_type = 'purchase' GROUP BY 1),
         |f1 AS (SELECT user_id, min(ts) AS t FROM events
         |       WHERE event_type = 'view' GROUP BY 1),
         |f2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
         |       JOIN f1 ON e.user_id = f1.user_id AND e.ts > f1.t
         |       WHERE e.event_type = 'click' GROUP BY 1),
         |f3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
         |       JOIN f2 ON e.user_id = f2.user_id AND e.ts > f2.t
         |       WHERE e.event_type = 'purchase' GROUP BY 1)
         |SELECT phase, step, step_idx, entities FROM (
         |  SELECT '1_after_b1' AS phase, '1_view' AS step, 0 AS step_idx,
         |         (SELECT count(*) FROM a1) AS entities
         |  UNION ALL SELECT '1_after_b1', '2_click', 1, (SELECT count(*) FROM a2)
         |  UNION ALL SELECT '1_after_b1', '3_purchase', 2, (SELECT count(*) FROM a3)
         |  UNION ALL SELECT '2_after_b2', '1_view', 0, (SELECT count(*) FROM f1)
         |  UNION ALL SELECT '2_after_b2', '2_click', 1, (SELECT count(*) FROM f2)
         |  UNION ALL SELECT '2_after_b2', '3_purchase', 2, (SELECT count(*) FROM f3))
         |ORDER BY phase, step_idx""".stripMargin,

    // Late-sessions oracle: phase 1 sessionizes the on-time slice, phase 2
    // the FULL event set — the engine's state after the late-aware advance
    // must equal that full re-sessionization row for row.
    "q208_sessions_late" ->
      s"""WITH ${sessChainOn("u",
             s"WHERE ts < TIMESTAMP '$WatermarkSplit' AND event_id % 7 != 3")},
         |${sessChainOn("v", "")}
         |SELECT phase, user_id, session_no, session_start, session_end,
         |       n_events, total_value FROM (
         |  SELECT '1_after_b1' AS phase, * FROM ur
         |  UNION ALL
         |  SELECT '2_after_b2', * FROM vr)
         |ORDER BY phase, user_id, session_no""".stripMargin,

    // The chained incremental-retention oracle: the q193 matrix
    // recomputed from raw events at both phases.
    "q197_incremental_retention" ->
      s"""WITH e1 AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events
         |            WHERE ts < TIMESTAMP '$WatermarkSplit'),
         |c1 AS (SELECT user_id, min(d) AS cohort FROM e1 GROUP BY 1),
         |m1 AS (SELECT CAST(cohort AS TIMESTAMP) AS cohort_day,
         |              CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
         |              count(DISTINCT e1.user_id) AS active_users
         |       FROM e1 JOIN c1 ON e1.user_id = c1.user_id
         |       GROUP BY cohort, date_diff('day', cohort, d)),
         |ef AS (SELECT user_id, CAST(ts AS DATE) AS d FROM events),
         |cf AS (SELECT user_id, min(d) AS cohort FROM ef GROUP BY 1),
         |mf AS (SELECT CAST(cohort AS TIMESTAMP) AS cohort_day,
         |              CAST(date_diff('day', cohort, d) AS BIGINT) AS day_offset,
         |              count(DISTINCT ef.user_id) AS active_users
         |       FROM ef JOIN cf ON ef.user_id = cf.user_id
         |       GROUP BY cohort, date_diff('day', cohort, d))
         |SELECT phase, cohort_day, day_offset, active_users FROM (
         |  SELECT '1_after_b1' AS phase, * FROM m1
         |  UNION ALL SELECT '2_after_b2', * FROM mf)
         |ORDER BY phase, cohort_day, day_offset""".stripMargin,

    "q192_event_funnel" ->
      """WITH t1 AS (SELECT user_id, min(ts) AS t FROM events
        |            WHERE event_type = 'view' GROUP BY 1),
        |t2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN t1 ON e.user_id = t1.user_id AND e.ts > t1.t
        |       WHERE e.event_type = 'click' GROUP BY 1),
        |t3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
        |       JOIN t2 ON e.user_id = t2.user_id AND e.ts > t2.t
        |       WHERE e.event_type = 'purchase' GROUP BY 1)
        |SELECT step, step_idx, entities FROM (
        |  SELECT '1_view' AS step, 0 AS step_idx,
        |         (SELECT count(*) FROM t1) AS entities
        |  UNION ALL SELECT '2_click', 1, (SELECT count(*) FROM t2)
        |  UNION ALL SELECT '3_purchase', 2, (SELECT count(*) FROM t3))
        |ORDER BY step_idx""".stripMargin,

    "q186_hll_portable" ->
      """WITH m1 AS (SELECT event_type, user_id,
        |        (xor(user_id % 2147483648, (user_id % 2147483648) >> 16) * 73244475) % 2147483648 AS h
        |      FROM events),
        |m2 AS (SELECT event_type, user_id,
        |        (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM m1),
        |hx AS (SELECT event_type, xor(h, h >> 16) AS h FROM m2),
        |jr AS (SELECT event_type, h % 256 AS j, h // 256 AS w FROM hx),
        |regs AS (SELECT event_type, j,
        |           max(24 - list_max(list_transform(range(0, 24),
        |             i -> CASE WHEN (w >> i) > 0 THEN i + 1 ELSE 0 END))) AS m
        |         FROM jr GROUP BY 1, 2),
        |est AS (SELECT event_type,
        |          count(*) AS present,
        |          sum(1.0 / CAST(1 << m AS DOUBLE)) AS s2
        |        FROM regs GROUP BY 1),
        |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_true
        |       FROM events GROUP BY 1)
        |SELECT est.event_type, n_true,
        |  CAST(256 - present AS BIGINT) AS v_zero,
        |  round(((0.7213 / (1.0 + 1.079 / 256.0)) * 256.0) * 256.0
        |        / (s2 + CAST(256 - present AS DOUBLE)), 4) AS raw_est
        |FROM est JOIN ex ON est.event_type = ex.event_type
        |ORDER BY est.event_type""".stripMargin,

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
