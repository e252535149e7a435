package graft.analytics

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.etl.{ChangeDetect, EtlLog}
import graft.operators.{Merge, Scd2}

/** ETL-protocol queries (SURVEY §2.8, §2.9): watermark incremental scan,
  * change-detect split, keyed merge/upsert, SCD2 interval build, and the
  * multi-source fan-in union with lineage tagging (U1).
  *
  * Source/target pairs are derived deterministically from the test tables
  * (keyed modulo splits) so the DuckDB oracle can reconstruct them exactly.
  */
object EtlQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // U1: scatter-gather union with source_connection lineage
    // (`dags/dynamic_mssql_mssql_etl.py:316-338`, tag at `dags/hanger_lane.py:432`).
    "q13_union_lineage" -> { (s, dir) =>
      val o = Tables.orders(s, dir)
      val laneA = o.filter(col("o_orderkey") % 2 === 0)
        .withColumn("source_connection", lit("laneA"))
      val laneB = o.filter(col("o_orderkey") % 2 =!= 0)
        .withColumn("source_connection", lit("laneB"))
      Seq(laneA, laneB).reduce(_ unionByName _)
        .groupBy("source_connection")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec(col("o_totalprice"))).cast("double").as("total_price"))
        .orderBy("source_connection")
    },

    // §2.9 step 4: strict watermark incremental scan over the events stream.
    "q17_incremental_scan" -> { (s, dir) =>
      val wm = Timestamp.valueOf("2024-01-20 00:00:00")
      EtlLog.incremental(Tables.events(s, dir), "ts", wm, strict = true)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("event_type")
    },

    // U3 + P12: full-row change detect against a stale target; the
    // modified/inserted split tagged and rolled up.
    "q18_change_detect" -> { (s, dir) =>
      val ev = Tables.events(s, dir).select("event_id", "event_type", "value")
      val target = ev.filter(col("event_id") % 10 =!= 0)
      val source = ev.withColumn("value",
        when(col("event_id") % 7 === 0, col("value") + 1000).otherwise(col("value")))
      ChangeDetect.tagged(source, target, Seq("event_id"))
        .groupBy("change_type")
        .agg(count(lit(1)).as("n_rows"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy("change_type")
    },

    // U4/U5/U8: keyed snapshot merge — updates win over target rows.
    "q19_merge_upsert" -> { (s, dir) =>
      val base = Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderstatus"),
          dec(col("o_totalprice")).as("o_totalprice"))
      val target = base.filter(col("o_orderkey") % 3 =!= 0)
      val updates = base.filter(col("o_orderkey") % 2 === 0)
        .withColumn("o_totalprice",
          (col("o_totalprice") + lit(10)).cast("decimal(18,2)"))
      Merge.upsert(target, updates, Seq("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n_orders"),
          sum(col("o_totalprice")).cast("double").as("total_price"))
        .orderBy("o_orderstatus")
    },

    // F23: CDC change_info JSON — the reference's
    // `jsonb_build_object('old', OLD.amount, 'new', NEW.amount)` diff object
    // (`scripts/test/scripts.sql` record_changed_columns).
    "q43_cdc_json_diff" -> { (s, dir) =>
      Tables.events(s, dir)
        .filter(col("event_id") % 7 === 0)
        .select(col("event_id"),
          to_json(struct(
            dec(col("value")).cast("string").as("old"),
            dec(col("value") + 1000).cast("string").as("new"))).as("change_info"))
        .orderBy("event_id")
    },

    // U9: SCD2 validity intervals built from the per-user event-type history.
    // event_id is the equal-timestamp tiebreaker on BOTH sides (the oracle's
    // windows order by (ts, event_id) too) so ties can't flip the compare.
    "q20_scd2_history" -> { (s, dir) =>
      Scd2.fromHistory(
          Tables.events(s, dir).select("user_id", "event_type", "ts", "event_id"),
          Seq("user_id"), Seq("event_type"), "ts", Some(col("event_id")))
        .withColumnRenamed("ts", "valid_from_ts")
        .select("user_id", "event_type", "valid_from", "valid_to", "is_current")
        .orderBy("user_id", "valid_from")
    },

    // Point-in-time (temporal) join: every 10th event probes the q20 SCD2
    // dimension for the version valid AT its timestamp — the daily
    // warehouse lookup an interval dimension exists for. Zero-width
    // versions (two changes at one timestamp) collapse first so the as-of
    // pick is unique; then the one-shuffle as-of join does the PIT lookup
    // (versions chain, so "latest valid_from <= ts" IS the valid row).
    "q81_scd2_pit_join" -> { (s, dir) =>
      val ev = Tables.events(s, dir)
      val dim = Scd2.fromHistory(
          ev.select("user_id", "event_type", "ts", "event_id"),
          Seq("user_id"), Seq("event_type"), "ts", Some(col("event_id")))
        .filter(col("valid_to").isNull || col("valid_to") > col("valid_from"))
        .select(col("user_id"), col("event_type").as("type_at_ts"),
          col("valid_from"), col("is_current"))
      val probes = ev.filter(col("event_id") % 10 === 0)
        .select("event_id", "user_id", "ts")
      graft.operators.Joins.asOf(probes, dim, Seq("user_id"), "ts", "valid_from")
        .select("event_id", "user_id", "ts", "type_at_ts", "is_current")
        .orderBy("event_id")
    },

    // Delete propagation ("forget these subjects everywhere"): every 97th
    // customer files a deletion request; orders and events shed their rows
    // via broadcast anti-joins and the audit reports per-table counts.
    "q70_forget_subjects" -> { (s, dir) =>
      val subjects = Tables.customer(s, dir)
        .filter(col("c_custkey") % 97 === 0).select("c_custkey")
      graft.etl.ChangeDetect.forget(subjects, "c_custkey", Seq(
          ("orders", Tables.orders(s, dir), "o_custkey"),
          ("events", Tables.events(s, dir), "user_id")))
        .audit
        .orderBy("table_name")
    },

    // Schema-drift reconciliation: a source whose orderkey got stringified
    // and upper-cased, whose status column vanished, and which grew an
    // extra ingest column, aligned back to the target contract — retyped /
    // null-filled / dropped without failing the dynamic load.
    "q85_schema_align" -> { (s, dir) =>
      val drifted = Tables.orders(s, dir).select(
        col("o_orderkey").cast("string").as("O_ORDERKEY"),
        col("o_totalprice"),
        lit("web").as("ingest_channel"))
      val target = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("o_orderkey",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("o_orderstatus",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("o_totalprice",
          org.apache.spark.sql.types.DoubleType)))
      graft.etl.SchemaAlign.align(drifted, target)
        .data
        .orderBy("o_orderkey")
    },

    // Incremental aggregate maintenance with retractions: June-1997 state
    // folds in a delta batch (corrections retract+reinsert with +10.0,
    // plus the next month's new orders) — ONE delta-sized shuffle, no base
    // recompute; exact-decimal sums keep maintained state bit-equal to the
    // full recompute the oracle performs.
    "q122_incremental_agg" -> { (s, dir) =>
      val ord = Tables.orders(s, dir)
      val d1 = lit("1997-06-01").cast("timestamp")
      val d2 = lit("1997-07-01").cast("timestamp")
      val base = ord.filter(col("o_orderdate") < d1)
      val state = base.groupBy("o_orderpriority")
        .agg(sum(dec(col("o_totalprice"))).as("total_price"),
          count(lit(1)).as("n_rows"))
      val isCorr = col("o_orderkey") % 97 === 0
      val minus = base.filter(isCorr)
        .select(col("o_orderpriority"), col("o_totalprice").as("total_price"))
      val plus = base.filter(isCorr)
        .select(col("o_orderpriority"),
          (col("o_totalprice") + lit(10.0)).as("total_price"))
        .unionByName(ord.filter(col("o_orderdate") >= d1 && col("o_orderdate") < d2)
          .select(col("o_orderpriority"), col("o_totalprice").as("total_price")))
      graft.operators.Aggregates.applyDelta(state, plus, minus,
          Seq("o_orderpriority"), Seq("total_price"))
        .select(col("o_orderpriority"),
          col("total_price").cast("double").as("total_price"), col("n_rows"))
        .orderBy("o_orderpriority")
    }
  )

  def oracleSql: Map[String, String] = Map(

    // q122: the oracle recomputes from the EFFECTIVE row multiset — base
    // minus retracted corrections plus corrected and new rows — which the
    // maintained state must equal exactly (decimal sums).
    "q122_incremental_agg" ->
      """WITH eff AS (
        |  SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2)) AS p
        |  FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-06-01 00:00:00' AND o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderpriority, CAST(o_totalprice + 10.0 AS DECIMAL(18,2))
        |  FROM orders
        |  WHERE o_orderdate < TIMESTAMP '1997-06-01 00:00:00' AND o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderpriority, CAST(o_totalprice AS DECIMAL(18,2))
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00')
        |SELECT o_orderpriority, CAST(SUM(p) AS DOUBLE) AS total_price,
        |       COUNT(*) AS n_rows
        |FROM eff GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    // The drift round-trip in SQL: stringified key cast back to BIGINT,
    // vanished column as typed NULL, extra column absent.
    "q85_schema_align" ->
      """SELECT CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS o_orderkey,
        |       CAST(NULL AS VARCHAR) AS o_orderstatus,
        |       o_totalprice
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q70_forget_subjects" ->
      """WITH f AS (
        |  SELECT DISTINCT c_custkey AS id FROM customer WHERE c_custkey % 97 = 0),
        |o AS (
        |  SELECT 'orders' AS table_name,
        |         count(*) AS rows_before,
        |         sum(CASE WHEN o_custkey NOT IN (SELECT id FROM f)
        |                  THEN 1 ELSE 0 END)::BIGINT AS rows_after
        |  FROM orders),
        |e AS (
        |  SELECT 'events' AS table_name,
        |         count(*) AS rows_before,
        |         sum(CASE WHEN user_id NOT IN (SELECT id FROM f)
        |                  THEN 1 ELSE 0 END)::BIGINT AS rows_after
        |  FROM events)
        |SELECT table_name, rows_before, rows_after,
        |       rows_before - rows_after AS rows_deleted
        |FROM (SELECT * FROM e UNION ALL SELECT * FROM o)
        |ORDER BY table_name""".stripMargin,

    "q13_union_lineage" ->
      """WITH tagged AS (
        |  SELECT *, 'laneA' AS source_connection FROM orders WHERE o_orderkey % 2 = 0
        |  UNION ALL
        |  SELECT *, 'laneB' AS source_connection FROM orders WHERE o_orderkey % 2 <> 0)
        |SELECT source_connection, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM tagged
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q17_incremental_scan" ->
      """SELECT event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |WHERE CAST(ts AS TIMESTAMP) > TIMESTAMP '2024-01-20 00:00:00'
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q18_change_detect" ->
      """WITH src AS (
        |  SELECT event_id, event_type,
        |         CASE WHEN event_id % 7 = 0 THEN value + 1000 ELSE value END AS value
        |  FROM events),
        |tgt AS (
        |  SELECT event_id, event_type, value FROM events WHERE event_id % 10 <> 0),
        |changed AS (SELECT * FROM src EXCEPT ALL SELECT * FROM tgt),
        |tagged AS (
        |  SELECT *, CASE WHEN event_id IN (SELECT event_id FROM tgt)
        |                 THEN 'modified' ELSE 'inserted' END AS change_type
        |  FROM changed)
        |SELECT change_type, COUNT(*) AS n_rows,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM tagged
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q19_merge_upsert" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice
        |  FROM orders),
        |tgt AS (SELECT * FROM base WHERE o_orderkey % 3 <> 0),
        |upd AS (
        |  SELECT o_orderkey, o_orderstatus,
        |         CAST(o_totalprice + 10 AS DECIMAL(18,2)) AS o_totalprice
        |  FROM base WHERE o_orderkey % 2 = 0),
        |merged AS (
        |  SELECT * FROM tgt WHERE o_orderkey NOT IN (SELECT o_orderkey FROM upd)
        |  UNION ALL
        |  SELECT * FROM upd)
        |SELECT o_orderstatus, COUNT(*) AS n_orders,
        |       CAST(SUM(o_totalprice) AS DOUBLE) AS total_price
        |FROM merged
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q43_cdc_json_diff" ->
      """SELECT event_id,
        |       CAST(json_object(
        |         'old', CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR),
        |         'new', CAST(CAST(value + 1000 AS DECIMAL(18,2)) AS VARCHAR)
        |       ) AS VARCHAR) AS change_info
        |FROM events
        |WHERE event_id % 7 = 0
        |ORDER BY event_id""".stripMargin,

    "q20_scd2_history" ->
      """WITH h AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |marked AS (
        |  SELECT *, LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM h),
        |changed AS (
        |  SELECT user_id, event_type, ts, event_id FROM marked
        |  WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM changed
        |ORDER BY user_id, valid_from""".stripMargin,

    // q20's version chain, zero-width versions dropped, argmax valid_from
    // per probe — the correlated form of the engine's as-of PIT lookup
    "q81_scd2_pit_join" ->
      """WITH h AS (
        |  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, event_id FROM events),
        |marked AS (
        |  SELECT *, LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM h),
        |changed AS (
        |  SELECT user_id, event_type, ts, event_id FROM marked
        |  WHERE prev IS NULL OR prev <> event_type),
        |versions AS (
        |  SELECT user_id, event_type AS type_at_ts, ts AS valid_from,
        |         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
        |  FROM changed),
        |live AS (
        |  SELECT user_id, type_at_ts, valid_from, valid_to IS NULL AS is_current
        |  FROM versions WHERE valid_to IS NULL OR valid_to > valid_from),
        |probes AS (SELECT event_id, user_id, ts FROM h WHERE event_id % 10 = 0)
        |SELECT p.event_id, p.user_id, p.ts, v.type_at_ts, v.is_current
        |FROM probes p JOIN live v ON p.user_id = v.user_id AND v.valid_from <= p.ts
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY v.valid_from DESC) = 1
        |ORDER BY p.event_id""".stripMargin
  )
}
