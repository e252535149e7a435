package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.operators.{Joins, Windows}

/** Window / ordered-computation queries (SURVEY §2.6): retention sequencing
  * (W1), cumulative sums (W5/A14), date-spine densify + same-period-last-year
  * lag (W4), hierarchy rollup (J2), and the tumbling-bucket batch twin of the
  * streaming slice (T1).
  */
object WindowQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // 2-D skyline (pareto front) of line items on (quantity, price), exact
    // integer cents — multi-objective "best tradeoffs" without a weighting
    // function. The operator composes bucket-local sweeps + a suffix-max
    // carry (ONE bounded B-way shuffle, no SinglePartition window); the
    // oracle keeps the textbook single-window form — same front.
    "q188_skyline" -> { (s, dir) =>
      graft.operators.Skyline.pareto2d(Tables.lineitem(s, dir),
          (col("l_quantity").cast("decimal(18,2)") * 100).cast("long"),
          (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long"))
        .select(col("x").as("qty_cents"), col("ymax").as("max_price_cents"))
        .orderBy("qty_cents")
    },

    // q188's incremental twin: the state IS the carried pareto front
    // (sky(A∪B) = sky(sky(A)∪B) — dominance is transitive), advanced per
    // batch with O(batch + |front|) work and exact under ANY batching.
    // Output is the front after each batch; the oracle recomputes both
    // phases from raw rows with q188's textbook window.
    "q198_incremental_skyline" -> { (s, dir) =>
      val sky = graft.operators.Skyline
      val li = Tables.lineitem(s, dir)
      val xc = (col("l_quantity").cast("decimal(18,2)") * 100).cast("long")
      val yc = (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
      val st1 = sky.pareto2dAdvance(sky.pareto2dEmptyState(s),
          li.filter(col("l_orderkey") % 3 =!= 0), xc, yc)
        .localCheckpoint()
      val st2 = sky.pareto2dAdvance(st1,
          li.filter(col("l_orderkey") % 3 === 0), xc, yc)
        .localCheckpoint()
      st1.withColumn("phase", lit("1_after_b1"))
        .unionByName(st2.withColumn("phase", lit("2_after_b2")))
        .select(col("phase"), col("x").as("qty_cents"),
          col("ymax").as("max_price_cents"))
        .orderBy("phase", "qty_cents")
    },

    // W1 + J6 + F14: purchase sequence per customer → new-vs-repeat by month
    // (`scripts/SQL/new_v_return_plus_retention_rate.sql`).
    "q7_retention_new_vs_repeat" -> { (s, dir) =>
      val seq = Windows.sequencePerKey(Tables.orders(s, dir), Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")), "rn")
      seq
        .withColumn("order_month", date_format(col("o_orderdate"), "yyyy-MM"))
        .withColumn("buyer_type", when(col("rn") === 1, "new").otherwise("repeat"))
        .groupBy("order_month", "buyer_type")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("order_month", "buyer_type")
    },

    // W5/A14: running cumulative sum per segment over a daily rollup.
    "q9_cumulative_daily_sales" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("o_orderdate").cast("date").as("order_day"))
        .agg(sum(dec(col("o_totalprice"))).as("day_sales"))
      // Output order_day as TIMESTAMP and the exact-decimal measures as
      // DOUBLE so both sides stringify identically under the driver's hash.
      Windows.cumulativeSum(daily, Seq("c_mktsegment"), Seq(col("order_day")),
          col("day_sales"), "cum_sales")
        .select(col("c_mktsegment"), col("order_day").cast("timestamp").as("order_day"),
          col("day_sales").cast("double").as("day_sales"),
          col("cum_sales").cast("double").as("cum_sales"))
        .orderBy("c_mktsegment", "order_day")
    },

    // W4: densified daily series + same-period-last-year lag
    // (`Python Data Analysis.ipynb` cells 12-13).
    "q10_sply_daily_sales" -> { (s, dir) =>
      val daily = Tables.orders(s, dir)
        .groupBy(col("o_orderdate").cast("date").as("order_day"))
        .agg(sum(dec(col("o_totalprice"))).as("day_sales"))
      val dense = Windows.dateSpine(daily, "order_day", Seq("day_sales"))
      Windows.samePeriodLastYear(dense, "order_day", "day_sales", "sply_sales")
        .select(col("order_day").cast("timestamp").as("order_day"),
          col("day_sales").cast("double").as("day_sales"),
          col("sply_sales").cast("double").as("sply_sales"))
        .orderBy("order_day")
    },

    // J2: hierarchy left-join rollup (supplier → nation → region standing in
    // for GL → COA levels, `dags/ssg_gl_etl.py:321-326`).
    "q21_hierarchy_rollup" -> { (s, dir) =>
      Joins.hierarchy(Tables.supplier(s, dir), Seq(
          (Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey")),
          (Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_suppliers"),
          sum(dec(col("s_acctbal"))).cast("double").as("total_acctbal"))
        .orderBy("r_name", "n_name")
    },

    // Ranking-window breadth over per-customer spend: quartile (ntile),
    // percent_rank, and distance to the segment's top spender — one window
    // partitioning shared by all three functions (single shuffle + sort).
    "q52_rank_windows" -> { (s, dir) =>
      val spend = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment", "c_custkey")
        .agg(sum(dec(col("o_totalprice"))).as("spend"))
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("spend").desc, col("c_custkey"))
      spend.select(col("c_mktsegment"), col("c_custkey"),
          col("spend").cast("double").as("spend"),
          ntile(4).over(w).cast("bigint").as("quartile"),
          graft.functions.Rounding.roundLikeC(percent_rank().over(w), 4).as("pct_rank"),
          (first(col("spend")).over(w) - col("spend")).cast("double").as("gap_to_top"))
        .orderBy("c_mktsegment", "c_custkey")
    },

    // Multi-level grouping sets: ROLLUP(region, nation) subtotals + grand
    // total in ONE aggregation pass (Spark expands grouping sets inside a
    // single shuffle — no union of three groupBys). Rollup-null group keys
    // are disambiguated from genuine nulls via grouping() and rendered as
    // '(all)' so both engines stringify identically.
    "q49_grouping_rollup" -> { (s, dir) =>
      Joins.hierarchy(Tables.supplier(s, dir), Seq(
          (Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey")),
          (Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))))
        .rollup(col("r_name"), col("n_name"))
        .agg(grouping(col("r_name")).as("__gr"),
          grouping(col("n_name")).as("__gn"),
          count(lit(1)).as("n_suppliers"),
          sum(dec(col("s_acctbal"))).cast("double").as("total_acctbal"))
        .select(
          when(col("__gr") === 1, lit("(all)"))
            .otherwise(coalesce(col("r_name"), lit("(null)"))).as("region"),
          when(col("__gn") === 1, lit("(all)"))
            .otherwise(coalesce(col("n_name"), lit("(null)"))).as("nation"),
          col("n_suppliers"), col("total_acctbal"))
        .orderBy("region", "nation")
    },

    // CUBE completes the grouping-sets family: q49's rollup levels PLUS the
    // per-nation-across-regions marginal — still one Expand + one shuffle.
    "q53_grouping_cube" -> { (s, dir) =>
      Joins.hierarchy(Tables.supplier(s, dir), Seq(
          (Tables.nation(s, dir), col("s_nationkey") === col("n_nationkey")),
          (Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))))
        .cube(col("r_name"), col("n_name"))
        .agg(grouping(col("r_name")).as("__gr"),
          grouping(col("n_name")).as("__gn"),
          count(lit(1)).as("n_suppliers"),
          sum(dec(col("s_acctbal"))).cast("double").as("total_acctbal"))
        .select(
          when(col("__gr") === 1, lit("(all)"))
            .otherwise(coalesce(col("r_name"), lit("(null)"))).as("region"),
          when(col("__gn") === 1, lit("(all)"))
            .otherwise(coalesce(col("n_name"), lit("(null)"))).as("nation"),
          col("n_suppliers"), col("total_acctbal"))
        .orderBy("region", "nation")
    },

    // T1 batch twin: tumbling 1-hour buckets over the events table — the same
    // plan Structured Streaming runs incrementally (graft.streaming).
    "q22_event_hourly_buckets" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("bucket_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy("bucket_start", "event_type")
    },

    // Hopping (sliding) windows — the third window type next to tumbling
    // (q22) and session (q38/q51): 2-hour windows advancing hourly, so each
    // event counts in exactly two overlapping buckets. Spark's window()
    // generator expands the buckets before ONE aggregation shuffle.
    "q69_hopping_windows" -> { (s, dir) =>
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .select(col("w.start").as("bucket_start"), col("event_type"),
          col("n_events"), col("sum_value"))
        .orderBy("bucket_start", "event_type")
    }
  )

  def oracleSql: Map[String, String] = Map(

    "q188_skyline" ->
      """WITH p AS (SELECT
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |g AS (SELECT x, max(y) AS ymax FROM p GROUP BY 1),
        |s AS (SELECT x, ymax,
        |        max(ymax) OVER (ORDER BY x DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |      FROM g)
        |SELECT x AS qty_cents, ymax AS max_price_cents FROM s
        |WHERE prev IS NULL OR ymax > prev
        |ORDER BY qty_cents""".stripMargin,

    "q198_incremental_skyline" ->
      """WITH p1 AS (SELECT
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem WHERE l_orderkey % 3 <> 0),
        |g1 AS (SELECT x, max(y) AS ymax FROM p1 GROUP BY 1),
        |s1 AS (SELECT x, ymax,
        |        max(ymax) OVER (ORDER BY x DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |      FROM g1),
        |pf AS (SELECT
        |    CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS x,
        |    CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem),
        |gf AS (SELECT x, max(y) AS ymax FROM pf GROUP BY 1),
        |sf AS (SELECT x, ymax,
        |        max(ymax) OVER (ORDER BY x DESC
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev
        |      FROM gf)
        |SELECT phase, qty_cents, max_price_cents FROM (
        |  SELECT '1_after_b1' AS phase, x AS qty_cents,
        |         ymax AS max_price_cents
        |  FROM s1 WHERE prev IS NULL OR ymax > prev
        |  UNION ALL
        |  SELECT '2_after_b2', x, ymax
        |  FROM sf WHERE prev IS NULL OR ymax > prev)
        |ORDER BY phase, qty_cents""".stripMargin,

    "q7_retention_new_vs_repeat" ->
      """WITH seq AS (
        |  SELECT o_orderdate,
        |         ROW_NUMBER() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_orderdate, o_orderkey) AS rn
        |  FROM orders)
        |SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
        |       CASE WHEN rn = 1 THEN 'new' ELSE 'repeat' END AS buyer_type,
        |       COUNT(*) AS n_orders
        |FROM seq
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q9_cumulative_daily_sales" ->
      """WITH daily AS (
        |  SELECT c_mktsegment, CAST(o_orderdate AS DATE) AS order_day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_sales
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, CAST(order_day AS TIMESTAMP) AS order_day,
        |       CAST(day_sales AS DOUBLE) AS day_sales,
        |       CAST(SUM(day_sales) OVER (PARTITION BY c_mktsegment ORDER BY order_day
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_sales
        |FROM daily
        |ORDER BY c_mktsegment, order_day""".stripMargin,

    "q10_sply_daily_sales" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_day,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_sales
        |  FROM orders GROUP BY 1),
        |bounds AS (SELECT MIN(order_day) AS lo, MAX(order_day) AS hi FROM daily),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
        |                                     CAST(hi AS TIMESTAMP),
        |                                     INTERVAL 1 DAY)) AS DATE) AS order_day
        |  FROM bounds),
        |dense AS (
        |  SELECT s.order_day, COALESCE(d.day_sales, 0) AS day_sales
        |  FROM spine s LEFT JOIN daily d USING (order_day))
        |SELECT CAST(order_day AS TIMESTAMP) AS order_day,
        |       CAST(day_sales AS DOUBLE) AS day_sales,
        |       CAST(LAG(day_sales, 1) OVER (
        |         PARTITION BY month(order_day), day(order_day)
        |         ORDER BY year(order_day)) AS DOUBLE) AS sply_sales
        |FROM dense
        |ORDER BY order_day""".stripMargin,

    "q21_hierarchy_rollup" ->
      """SELECT r_name, n_name, COUNT(*) AS n_suppliers,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM supplier
        |LEFT JOIN nation ON s_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q52_rank_windows" ->
      """WITH spend AS (
        |  SELECT c_mktsegment, c_custkey,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, c_custkey,
        |       CAST(spend AS DOUBLE) AS spend,
        |       NTILE(4) OVER w AS quartile,
        |       ROUND(PERCENT_RANK() OVER w, 4) AS pct_rank,
        |       CAST(FIRST_VALUE(spend) OVER w - spend AS DOUBLE) AS gap_to_top
        |FROM spend
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend DESC, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,

    "q49_grouping_rollup" ->
      """SELECT CASE WHEN GROUPING(r_name) = 1 THEN '(all)'
        |            ELSE COALESCE(r_name, '(null)') END AS region,
        |       CASE WHEN GROUPING(n_name) = 1 THEN '(all)'
        |            ELSE COALESCE(n_name, '(null)') END AS nation,
        |       COUNT(*) AS n_suppliers,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM supplier
        |LEFT JOIN nation ON s_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP(r_name, n_name)
        |ORDER BY 1, 2""".stripMargin,

    "q53_grouping_cube" ->
      """SELECT CASE WHEN GROUPING(r_name) = 1 THEN '(all)'
        |            ELSE COALESCE(r_name, '(null)') END AS region,
        |       CASE WHEN GROUPING(n_name) = 1 THEN '(all)'
        |            ELSE COALESCE(n_name, '(null)') END AS nation,
        |       COUNT(*) AS n_suppliers,
        |       CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
        |FROM supplier
        |LEFT JOIN nation ON s_nationkey = n_nationkey
        |LEFT JOIN region ON n_regionkey = r_regionkey
        |GROUP BY CUBE(r_name, n_name)
        |ORDER BY 1, 2""".stripMargin,

    "q22_event_hourly_buckets" ->
      """SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS bucket_start,
        |       event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q69_hopping_windows" ->
      """WITH e AS (
        |  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS tb,
        |         event_type, value
        |  FROM events),
        |x AS (
        |  SELECT unnest([tb, tb - INTERVAL '1 hour']) AS bucket_start,
        |         event_type, value
        |  FROM e)
        |SELECT bucket_start, event_type, COUNT(*) AS n_events,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM x
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin
  )
}
