package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{StockLedgerRow, Valuation}

/** W6 valuation fold bound to a synthetic stock ledger derived
  * deterministically from lineitem. No DuckDB oracle — the fold's output
  * depends on previously computed state (not expressible as a window);
  * correctness is covered by ValuationSpec's hand-computed scenario and the
  * distributed-vs-sequential equivalence property.
  */
object ValuationQueries {

  /** lineitem → stock-ledger shape: ~250 (item, warehouse) groups; shipdate
    * orders the fold, (orderkey, linenumber) breaks date ties totally. */
  def syntheticLedger(s: SparkSession, dir: String): Dataset[StockLedgerRow] = {
    import s.implicits._
    Tables.lineitem(s, dir).select(
        concat(lit("I"), col("l_partkey") % 50).as("item_code"),
        concat(lit("W"), col("l_suppkey") % 5).as("warehouse"),
        col("l_shipdate").as("posting_ts"),
        timestamp_micros(col("l_orderkey") * 100 + col("l_linenumber")).as("creation"),
        when(col("l_orderkey") % 13 === 0, "Stock Reconciliation")
          .when(col("l_returnflag") === "R", "Delivery Note")
          .otherwise("Purchase Receipt").as("voucher_type"),
        when(col("l_returnflag") === "R", -col("l_quantity"))
          .otherwise(col("l_quantity")).as("actual_qty"),
        col("l_quantity").as("qty_after_transaction"),
        round(col("l_extendedprice") / col("l_quantity"), 4).as("incoming_rate"),
        round(col("l_extendedprice") / col("l_quantity"), 4).as("valuation_rate"),
        round(col("l_extendedprice"), 2).as("stock_value"),
        round(col("l_extendedprice"), 4).as("stock_value_difference"))
      .as[StockLedgerRow]
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q23_valuation_fold" -> { (s, dir) =>
      // streaming (secondary-sort) variant: ~35% faster than flatMapGroups
      // at sf0.1 and spill-safe for huge groups; equality spec-asserted
      Valuation.revalueStreaming(syntheticLedger(s, dir))
        .toDF()
        .orderBy("item_code", "warehouse", "posting_ts", "creation")
    }
  )

  /** Not SQL-expressible → driver records the weaker rows-only check. */
  def rowsOnly: Set[String] = Set("q23_valuation_fold")
}
