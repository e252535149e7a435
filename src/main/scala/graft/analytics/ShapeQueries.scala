package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Decodes
import graft.operators.{Aggregates, Joins}

/** Reshaping, decode, and profiling queries (SURVEY §2.2, §2.3, §2.5, §2.11):
  * pivot (A13), unpivot/melt (F22), JSON flatten (F21), CASE-decode pipeline
  * (F1-F6), anti-join (J8/P12), and the single-pass DQ profile (V2/V3).
  */
object ShapeQueries {

  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  /** Pivot output columns — explicit domain (skips Spark's distinct-values
    * job) with parquet-safe aliases. */
  private val priorities = Seq(
    "1-URGENT" -> "prio_1_urgent",
    "2-HIGH" -> "prio_2_high",
    "3-MEDIUM" -> "prio_3_medium",
    "4-NOT SPECIFIED" -> "prio_4_not_specified",
    "5-LOW" -> "prio_5_low")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // A13: pivot aggregate (segment × order-priority sales matrix).
    "q8_pivot_segment_priority" -> { (s, dir) =>
      val df = Tables.orders(s, dir)
        .join(broadcast(Tables.customer(s, dir)), col("o_custkey") === col("c_custkey"))
        .withColumn("price", dec(col("o_totalprice")))
      val pivoted = Aggregates.pivotSum(df, "c_mktsegment", "o_orderpriority",
        priorities.map(_._1), "price")
      pivoted.select(col("c_mktsegment") +: priorities.map { case (v, a) =>
          col(s"`$v`").cast("double").as(a)
        }: _*)
        .orderBy("c_mktsegment")
    },

    // F1-F6 composite: decode pipeline over customer — prefix classification,
    // partial remap with pass-through, sign split into debit/credit.
    "q11_decode_profile" -> { (s, dir) =>
      val cls = Decodes.prefixClass(col("c_mktsegment"), 2, Seq(
        Seq("AU", "MA") -> "Industrial",
        Seq("BU", "FU", "HO") -> "Consumer"), "Other")
      val renamed = Decodes.remap(col("c_mktsegment"),
        Seq("AUTOMOBILE" -> "CARS", "HOUSEHOLD" -> "HOME"), None)
      val bal = dec(col("c_acctbal"))
      Tables.customer(s, dir)
        .withColumn("seg_class", cls)
        .withColumn("decoded_segment", renamed)
        .groupBy("seg_class", "decoded_segment")
        .agg(count(lit(1)).as("n_customers"),
          sum(Decodes.debitOf(bal)).cast("double").as("sum_debit"),
          sum(Decodes.creditOf(bal)).cast("double").as("sum_credit"))
        .orderBy("seg_class", "decoded_segment")
    },

    // J8/P12: key-level anti join — customers with no urgent orders.
    "q12_customers_no_orders" -> { (s, dir) =>
      Joins.anti(Tables.customer(s, dir),
          Tables.orders(s, dir)
            .filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey").as("c_custkey")),
          Seq("c_custkey"))
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    },

    // F22: unpivot/melt part measures into (measure, value) rows.
    "q14_unpivot_part_measures" -> { (s, dir) =>
      Tables.part(s, dir)
        .select(col("p_partkey"), col("p_size").cast("double").as("p_size"),
          col("p_retailprice"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("p_retailprice")), "measure", "value")
        .orderBy("p_partkey", "measure")
    },

    // F21: JSON flatten — extract a nested field from the props JSON string
    // and aggregate it (`dags/get_data_api.py:24-40`).
    "q15_json_props_rollup" -> { (s, dir) =>
      Tables.events(s, dir)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(sum(col("k")).cast("bigint").as("sum_k"),
          count(when(col("k").isNull, 1)).as("n_null_k"))
        .orderBy("event_type")
    },

    // V2/V3: data-quality profile in ONE aggregation pass (the GE suite shape:
    // row count, null count, min/max, mean-between, distinct domain size).
    "q16_dq_profile" -> { (s, dir) =>
      Tables.lineitem(s, dir).agg(
        count(lit(1)).as("row_count"),
        sum(when(col("l_quantity").isNull, 1).otherwise(0)).cast("bigint").as("null_qty"),
        min(col("l_quantity")).as("min_qty"),
        max(col("l_quantity")).as("max_qty"),
        graft.functions.Rounding.roundLikeC(avg(col("l_discount")), 4).as("mean_discount"),
        countDistinct(col("l_returnflag")).as("n_flags"))
    }
  )

  def oracleSql: Map[String, String] = Map(

    "q8_pivot_segment_priority" -> {
      val cases = priorities.map { case (v, a) =>
        s"CAST(SUM(CASE WHEN o_orderpriority = '$v' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS $a"
      }.mkString(",\n       ")
      s"""SELECT c_mktsegment,
         |       $cases
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment
         |ORDER BY c_mktsegment""".stripMargin
    },

    "q11_decode_profile" ->
      """SELECT CASE WHEN substring(c_mktsegment, 1, 2) IN ('AU','MA') THEN 'Industrial'
        |            WHEN substring(c_mktsegment, 1, 2) IN ('BU','FU','HO') THEN 'Consumer'
        |            ELSE 'Other' END AS seg_class,
        |       CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'CARS'
        |            WHEN c_mktsegment = 'HOUSEHOLD' THEN 'HOME'
        |            ELSE c_mktsegment END AS decoded_segment,
        |       COUNT(*) AS n_customers,
        |       CAST(SUM(CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) > 0
        |                     THEN CAST(c_acctbal AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS sum_debit,
        |       CAST(SUM(CASE WHEN CAST(c_acctbal AS DECIMAL(18,2)) < 0
        |                     THEN ABS(CAST(c_acctbal AS DECIMAL(18,2))) ELSE 0 END) AS DOUBLE) AS sum_credit
        |FROM customer
        |GROUP BY 1, 2
        |ORDER BY 1, 2""".stripMargin,

    "q12_customers_no_orders" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey
        |                    AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "q14_unpivot_part_measures" ->
      """SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
        |UNION ALL
        |SELECT p_partkey, 'p_retailprice' AS measure, p_retailprice AS value FROM part
        |ORDER BY p_partkey, measure""".stripMargin,

    "q15_json_props_rollup" ->
      """SELECT event_type,
        |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |       COUNT(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS n_null_k
        |FROM events
        |GROUP BY 1
        |ORDER BY 1""".stripMargin,

    "q16_dq_profile" ->
      """SELECT COUNT(*) AS row_count,
        |       CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_qty,
        |       MIN(l_quantity) AS min_qty,
        |       MAX(l_quantity) AS max_qty,
        |       ROUND(AVG(l_discount), 4) AS mean_discount,
        |       COUNT(DISTINCT l_returnflag) AS n_flags
        |FROM lineitem""".stripMargin
  )
}
