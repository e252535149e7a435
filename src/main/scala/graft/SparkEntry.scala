package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] binds one operator family from SURVEY §2 to the
  * synthetic test tables; [[oracleSql]] carries the DuckDB-equivalent SQL the
  * driver hash-compares against at sf0.01.
  *
  * Numeric convention for oracle parity: measures are cast to DECIMAL before
  * aggregation so sums are exact and order-independent (double sums would
  * differ in the last ulp between engines and across partitionings), then the
  * FINAL output column is cast back to DOUBLE on both sides. The driver's
  * hash gate stringifies cells after pandas-reading our parquet (DECIMAL ->
  * decimal.Decimal, scale-padded: '138014.00') but duckdb-.df()-reading the
  * oracle (DECIMAL -> float64: '138014.0'), so a decimal output can never
  * hash-match; an exact decimal cast to double is bit-identical on both
  * sides. Same reasoning for DATE outputs (pandas datetime.date '1995-01-03'
  * vs duckdb datetime64 '1995-01-03 00:00:00') -> output TIMESTAMP instead.
  */
object SparkEntry {

  /** Sum with exact decimal semantics: cast input to DECIMAL(18,2) first. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)"))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** Queries that deliberately have no DuckDB oracle (not SQL-expressible
    * there); the driver records a weaker rows-only check for these. */
  def rowsOnlyQueries: Set[String] =
    analytics.ValuationQueries.rowsOnly ++
      analytics.TextQueries.rowsOnly ++
      analytics.SimilarityQueries.rowsOnly ++
      analytics.SessionQueries.rowsOnly ++
      analytics.PrepQueries.rowsOnly ++
      analytics.CorpusQueries.rowsOnly ++
      analytics.LayoutQueries.rowsOnly ++
      analytics.AqpQueries.rowsOnly ++
      analytics.GraphQueries.rowsOnly

  // ---------------------------------------------------------------------
  // Query registry. Names are stable; the driver runs each at sf0.01 and
  // compares to the DuckDB oracle below. Core queries live inline; further
  // operator families contribute from graft.analytics.*.
  // ---------------------------------------------------------------------
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    coreQueries ++
      analytics.WindowQueries.queries ++
      analytics.ShapeQueries.queries ++
      analytics.EtlQueries.queries ++
      analytics.ValuationQueries.queries ++
      analytics.TextQueries.queries ++
      analytics.SimilarityQueries.queries ++
      analytics.MiscQueries.queries ++
      analytics.SessionQueries.queries ++
      analytics.PrepQueries.queries ++
      analytics.CorpusQueries.queries ++
      analytics.LayoutQueries.queries ++
      analytics.AqpQueries.queries ++
      analytics.GraphQueries.queries

  def oracleSql: Map[String, String] =
    coreOracleSql ++
      analytics.ValuationQueries.oracleSql ++
      analytics.WindowQueries.oracleSql ++
      analytics.ShapeQueries.oracleSql ++
      analytics.EtlQueries.oracleSql ++
      analytics.TextQueries.oracleSql ++
      analytics.SimilarityQueries.oracleSql ++
      analytics.MiscQueries.oracleSql ++
      analytics.SessionQueries.oracleSql ++
      analytics.PrepQueries.oracleSql ++
      analytics.CorpusQueries.oracleSql ++
      analytics.LayoutQueries.oracleSql ++
      analytics.AqpQueries.oracleSql ++
      analytics.GraphQueries.oracleSql

  private def coreQueries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A1-A3/P7/F7: filtered wide aggregation (pricing summary, reference's
    // daily-rollup shape at TPC-H schema).
    "q1_pricing_summary" -> { (s, dir) =>
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).cast("double").as("sum_qty"),
          dsum(col("l_extendedprice")).cast("double").as("sum_base_price"),
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(38,4)")).cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // J1/A7: star join — revenue by nation. Small dims broadcast; the
    // lineitem⋈orders backbone is left to Catalyst/AQE (fact-fact).
    "q2_star_revenue_by_nation" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val ord = Tables.orders(s, dir)
      val fact = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val withDims = Joins.star(fact, Seq(
        (Tables.customer(s, dir), col("o_custkey") === col("c_custkey")),
        (Tables.nation(s, dir), col("c_nationkey") === col("n_nationkey")),
        (Tables.region(s, dir), col("n_regionkey") === col("r_regionkey"))))
      withDims.groupBy(col("r_name"), col("n_name"))
        .agg(
          sum((col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("decimal(38,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name", "n_name")
    },

    // A7/O3: top-k products by revenue (TakeOrderedAndProject, no global sort).
    "q3_topk_parts" -> { (s, dir) =>
      val li = Tables.lineitem(s, dir)
      val joined = li.join(broadcast(Tables.part(s, dir)),
        col("l_partkey") === col("p_partkey"))
      // Rank on the exact decimal, cast the output column to double after
      // the top-k cut so the LIMIT boundary is decided by exact values.
      Aggregates.topK(joined, Seq("p_name"),
        dsum(col("l_extendedprice")).cast("decimal(38,2)"), "revenue", 10)
        .withColumn("revenue", col("revenue").cast("double"))
    },

    // J3/A6/U2/O2: market-basket pair frequency, top 20 (one-shuffle
    // collect_set formulation; 2x the self-join's speed at sf0.1).
    "q4_basket_pairs" -> { (s, dir) =>
      Joins.basketPairsViaSets(
        Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_partkey")),
        Seq("l_orderkey"), "l_partkey", 20)
    },

    // A5: avg of per-day aggregates (two-level aggregation).
    "q5_avg_daily_orders" -> { (s, dir) =>
      val ord = Tables.orders(s, dir)
        .withColumn("order_day", col("o_orderdate").cast("date"))
      val perDay = ord.groupBy(col("order_day")).agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        dsum(col("o_totalprice")).as("day_sales"))
      perDay.agg(
        avg(col("n_orders")).cast("decimal(38,6)").cast("double").as("avg_daily_orders"),
        avg(col("day_sales")).cast("decimal(38,6)").cast("double").as("avg_daily_sales"))
    },

    // W1/J9/O6: latest order per customer (as-of/argmax via row_number).
    "q6_latest_order_per_customer" -> { (s, dir) =>
      Joins.latestPerKey(Tables.orders(s, dir), Seq("o_custkey"),
        Seq(col("o_orderdate"), col("o_orderkey")))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("o_totalprice"))
        .orderBy("o_custkey")
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  private def coreOracleSql: Map[String, String] = Map(

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_star_revenue_by_nation" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(38,4))) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_items
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    "q3_topk_parts" ->
      """SELECT p_name, CAST(revenue AS DOUBLE) AS revenue FROM (
        |  SELECT p_name,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS revenue
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY p_name
        |  ORDER BY revenue DESC, p_name ASC
        |  LIMIT 10)
        |ORDER BY revenue DESC, p_name ASC""".stripMargin,

    "q4_basket_pairs" ->
      """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        |SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
        |       COUNT(*) AS pair_count
        |FROM items a JOIN items b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        |GROUP BY a.l_partkey, b.l_partkey
        |ORDER BY pair_count DESC, item_a ASC, item_b ASC
        |LIMIT 20""".stripMargin,

    "q5_avg_daily_orders" ->
      """WITH per_day AS (
        |  SELECT CAST(o_orderdate AS DATE) AS order_day,
        |         COUNT(DISTINCT o_orderkey) AS n_orders,
        |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS day_sales
        |  FROM orders GROUP BY 1)
        |SELECT CAST(CAST(AVG(n_orders) AS DECIMAL(38,6)) AS DOUBLE) AS avg_daily_orders,
        |       CAST(CAST(AVG(day_sales) AS DECIMAL(38,6)) AS DOUBLE) AS avg_daily_sales
        |FROM per_day""".stripMargin,

    "q6_latest_order_per_customer" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
        |FROM orders
        |QUALIFY ROW_NUMBER() OVER (
        |  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
        |ORDER BY o_custkey""".stripMargin
  )
}
