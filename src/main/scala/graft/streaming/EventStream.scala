package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
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
            // ONE fold over the batch's events AND the open session, all in
            // ascending start order, splitting only on true adjacent gaps
            // > gapMs — exactly batch gap-sessionization over {points} ∪
            // {the open session as an already-merged run}. The earlier
            // late/current split tested events against the session's
            // ORIGINAL start, so a backward 'bridge' event in
            // (start-gap, start) — which extends the session backward —
            // could not chain-merge a still-earlier event within gap of the
            // bridge, where batch semantics would. Events landing INSIDE
            // the open session still merge without splitting it (its
            // constituent timestamps are gone from state): the documented
            // bounded-state residual.
            val items = (batch.map(e =>
                SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)) ++
                state.getOption.iterator).toSeq
              .sortBy(s => (s.start, s.end))
            var closed = List.empty[Session]
            var cur: Option[SessionState] = None
            items.foreach { it =>
              cur match {
                case Some(s) if it.start - s.end > gapMs =>
                  closed ::= Session(userId, new Timestamp(s.start),
                    new Timestamp(s.end), s.n, s.total)
                  cur = Some(it)
                case Some(s) =>
                  cur = Some(SessionState(s.start, math.max(s.end, it.end),
                    s.n + it.n, s.total + it.total))
                case None => cur = Some(it)
              }
            }
            cur.foreach { s =>
              state.update(s)
              // flatMapGroupsWithState does NOT drop late events, so an event
              // older than watermark-gap would yield a timeout at or below
              // the current watermark, which Spark rejects (and fails the
              // query). Clamp to strictly above the watermark: the stale
              // session then closes at the next trigger instead of crashing.
              state.setTimeoutTimestamp(
                math.max(s.end + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.reverseIterator
          }
        })
  }

  /** Declarative sessionization via the BUILT-IN session_window — the same
    * one-groupBy plan as batch query q51, run incrementally: Spark keeps
    * one merging session state per (user, open session) and emits a row
    * when the watermark passes the session's close. Complements
    * [[sessionize]] (the custom flatMapGroupsWithState operator, which
    * additionally exposes the gap-splitting internals); prefer this form
    * wherever plain gap sessions suffice — state handling, merging and
    * eviction are Spark's, not ours. */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes",
                       watermarkDelay: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value"))

  /** Per-user funnel reach so far: `user_id` plus one epoch-millis cascade
    * timestamp per step (−1 = step not reached). */
  final case class FunnelReach(user_id: Long, step_ts: Seq[Long])

  /** Streaming funnel — the q192/q196 family's Structured-Streaming member:
    * ONE keyed state object per user (the cascade minima, k longs), folded
    * forward by `mapGroupsWithState` as events arrive. Within a trigger the
    * batch's events fold in ascending event-time order, which IS the exact
    * cascade (the first qualifying event in time order is the min); across
    * triggers the fold continues from state under the watermark contract
    * (`Aggregates.funnelAdvance`'s min/merge discipline — Spark's
    * watermark drops what arrives later than `watermarkDelay` behind).
    * Update output: each trigger re-emits the CURRENT reach row for every
    * user it touched; consumers key the latest row per user.
    *
    * State scales with the ACTIVE user universe (k longs per user —
    * Spark's state store, not a snapshot rewrite), event history is never
    * revisited: the streaming form of exactly the claim q196's chained
    * oracle pins for the batch fold. */
  def funnelStream(events: Dataset[Event], stepTypes: Seq[String],
                   watermarkDelay: String = "10 minutes"): Dataset[FunnelReach] = {
    require(stepTypes.nonEmpty, "at least one funnel step required")
    import events.sparkSession.implicits._
    val k = stepTypes.length
    val idx = stepTypes.zipWithIndex.toMap
    events
      .filter(e => idx.contains(e.event_type))
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(
        (uid: Long, batch: Iterator[Event], state: GroupState[Seq[Long]]) => {
          val cur = state.getOption.getOrElse(Seq.fill(k)(-1L)).toArray
          batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
            val i = idx(e.event_type)
            val t = e.ts.getTime
            if (i == 0) {
              if (cur(0) < 0L) cur(0) = t
            } else if (cur(i) < 0L && cur(i - 1) >= 0L && t > cur(i - 1)) {
              cur(i) = t
            }
          }
          state.update(cur.toSeq)
          FunnelReach(uid, cur.toSeq)
        })
  }

  /** Stream-stream interval join (click attribution): every purchase joins
    * the same user's clicks from the preceding `lookback` window. The time
    * bound is what makes this scale: with both sides watermarked and the
    * join range-constrained, Spark evicts click state older than
    * watermark − lookback instead of buffering the whole click stream —
    * state tracks the lookback window per user, not history.
    *
    * Inner-join rows emit as soon as both inputs arrive (no watermark wait);
    * the watermark only bounds state eviction and late data.
    */
  def attributeToClicks(events: DataFrame, lookback: String = "1 hour",
                        watermarkDelay: String = "2 hours"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermarkDelay)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("click_user"), col("ts").as("click_ts"),
        col("value").as("click_value"))
      .withWatermark("click_ts", watermarkDelay)
    purchases.join(clicks,
        col("user_id") === col("click_user") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $lookback"))
      .drop("click_user")
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

  /** Composed incremental pipeline — the full ingestion shape in ONE
    * streaming query: at-least-once dedup (state bounded by the watermark
    * horizon) → stream-static broadcast enrich against a dimension (no
    * shuffle, no state: the dim ships with the tasks) → tumbling hourly
    * aggregate per enriched category. Exercises Spark's chained-stateful-
    * operator support: the dedup's event-time watermark carries through the
    * join into the aggregation.
    */
  def dedupEnrichHourly(events: DataFrame, dim: DataFrame,
                        horizon: String = "2 hours"): DataFrame =
    dedupWithinWatermark(events, Seq("event_id"), "ts", horizon)
      .join(broadcast(dim), Seq("event_type"), "left")
      .groupBy(window(col("ts"), "1 hour"), col("category"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("window.start").as("bucket_start"), col("category"),
        col("n_events"), col("sum_value"))

  /** T3 CDC-consumer sink shape: each micro-batch upserts into a parquet
    * snapshot target via the engine's Merge operator — the Structured
    * Streaming equivalent of the reference's Kafka-topic-to-table apply loop
    * (`scripts/test/transform.py:46-83`). Reads the current snapshot,
    * merges, rewrites — same semantics as `dags/upsert_utils.py`.
    *
    * `orderCol`: within-batch last-write-wins ordering (CDC offset/ts) — a
    * micro-batch can carry several updates for one key, and without an
    * ordering the survivor is arbitrary. Single-row-per-key batches may omit
    * it. The batch is persisted for the merge: its deduped slice feeds both
    * the anti-join key set and the union, and foreachBatch inputs are not
    * materialized — without the cache the source is re-read per branch
    * (same discipline as [[scd2Batch]]). */
  def upsertBatch(targetDir: String, keys: Seq[String],
                  orderCol: Option[String] = None)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val order = orderCol.map(org.apache.spark.sql.functions.col)
    val b = batch.persist()
    try {
      val merged =
        if (graft.etl.SnapshotIO.hasParquet(spark, targetDir))
          graft.operators.Merge.upsert(spark.read.parquet(targetDir), b, keys, order)
        else // bootstrap: same within-batch dedup path against an empty target
          graft.operators.Merge.upsert(b.limit(0), b, keys, order)
      // staging + swap — the merged plan reads the target it replaces
      graft.etl.SnapshotIO.replace(spark, merged, targetDir)
    } finally b.unpersist()
  }

  /** T3 + U9 composition: a CDC stream maintains a Type-2 dimension. Each
    * micro-batch keeps the LAST change per key (by `tsCol`, ties broken by
    * the attribute values so the survivor is deterministic under re-runs —
    * same hazard `Scd2.fromHistory`'s tieBreak exists for), then runs the
    * engine's SCD2 merge at BATCH grain: every version opened/closed by a
    * batch stamps the batch's effective time as its validity boundary —
    * dlt's snapshot-grain scd2 semantics (the reference's mode), where
    * within-batch intermediate states collapse rather than become versions.
    *
    * The effective time is the batch's max event time CLAMPED to never run
    * backwards past the dimension's newest `valid_from`: a late-arriving
    * batch otherwise closes a version at a `valid_to` BEFORE its
    * `valid_from` (inverted interval → point-in-time lookups return 0 or 2
    * rows). Under the clamp a late batch applies as of dimension time —
    * batch-grain SCD2 is ordered by arrival, documented here.
    *
    * The deduped per-key slice is persisted for the batch: `Scd2.merge`
    * references it from four join branches, and without the cache each
    * branch would re-read the source (foreachBatch inputs are not
    * materialized). StreamingSpec proves stream ≡ the same batches applied
    * sequentially, plus the invariants (one current row per key, chained
    * intervals, late-batch clamp). */
  def scd2Batch(targetDir: String, keys: Seq[String], attrs: Seq[String],
                tsCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // rows with no event time cannot stamp a validity boundary — dropped
    // here (a production consumer diverts them to the invalid-row channel,
    // quality/Validate). Without the filter an all-null-ts batch computes
    // batchTs = null and NPEs inside the clamp.
    // persisted BEFORE the isEmpty probe: foreachBatch inputs are not
    // materialized, so an unpersisted probe re-reads the source once more
    // per micro-batch on top of the merge's own reads
    val timed = batch.filter(col(tsCol).isNotNull).persist()
    try {
      if (timed.isEmpty) return
      scd2Apply(spark, timed, targetDir, keys, attrs, tsCol)
    } finally timed.unpersist()
  }

  /** [[scd2Batch]]'s EVENT-grain sibling: a micro-batch carrying several
    * versions of one key produces several chained SCD2 rows — one per
    * distinct event time — instead of collapsing to the batch's final
    * state. `Scd2.applyChanges` does the splice (clamp rule, compression,
    * closed-history pass-through documented there); this wires the
    * snapshot read/replace and the per-(key, ts) deterministic dedupe
    * around it. */
  def scd2BatchEventGrain(targetDir: String, keys: Seq[String], attrs: Seq[String],
                          tsCol: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val timed = batch.filter(col(tsCol).isNotNull).persist()
    try {
      if (timed.isEmpty) return
      // one row per (key, event time); survivor deterministic by attrs
      val changes = graft.operators.Merge.upsert(
        timed.limit(0), timed, keys :+ tsCol,
        Some(struct(attrs.map(col): _*))).persist()
      try {
        val dim =
          if (graft.etl.SnapshotIO.hasParquet(spark, targetDir))
            Some(spark.read.parquet(targetDir))
          else None
        graft.etl.SnapshotIO.replace(spark,
          graft.operators.Scd2.applyChanges(dim, changes, keys, attrs, tsCol),
          targetDir)
      } finally changes.unpersist()
    } finally timed.unpersist()
  }

  private def scd2Apply(spark: SparkSession, timed: DataFrame, targetDir: String,
                        keys: Seq[String], attrs: Seq[String], tsCol: String): Unit = {
    val order = struct(col(tsCol) +: attrs.map(col): _*)
    val latest = graft.operators.Merge.upsert(
      timed.limit(0), timed, keys, Some(order)).persist()
    try {
      val dimExists = graft.etl.SnapshotIO.hasParquet(spark, targetDir)
      val dim =
        if (dimExists) spark.read.parquet(targetDir)
        else
          latest.limit(0)
            .select((keys ++ attrs).map(col): _*)
            .withColumn("valid_from", lit(null).cast("timestamp"))
            .withColumn("valid_to", lit(null).cast("timestamp"))
            .withColumn("is_current", lit(true))
      val batchTs = latest.agg(max(col(tsCol))).head.getTimestamp(0)
      val dimTs =
        if (dimExists) Option(dim.agg(max(col("valid_from"))).head.getTimestamp(0))
        else None
      val effectiveTs = dimTs.filter(_.after(batchTs)).getOrElse(batchTs)
      val merged = graft.operators.Scd2.merge(
        dim, latest.select((keys ++ attrs).map(col): _*), keys, attrs,
        lit(effectiveTs).cast("timestamp"))
      graft.etl.SnapshotIO.replace(spark, merged, targetDir)
    } finally latest.unpersist()
  }
}
