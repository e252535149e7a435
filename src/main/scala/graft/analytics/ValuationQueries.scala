package graft.analytics

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{StockLedgerRow, Valuation}

/** W6 valuation fold bound to a synthetic stock ledger derived
  * deterministically from lineitem.
  *
  * The DuckDB oracle replays the same state machine with a recursive CTE
  * (one row per (item, warehouse) per iteration — iteration count = max group
  * size, ~240 at sf0.01). The subtle part is rounding parity: Scala's
  * `BigDecimal(x)` (and Spark's `round`) round the double's SHORTEST decimal
  * representation, so the oracle casts through VARCHAR (DuckDB's double→text
  * is also shortest round-trip) into DECIMAL and implements HALF_EVEN /
  * HALF_UP explicitly. A plain `round()` or a width-limited decimal cast is
  * wrong: prices with 2 decimals make quotients like 1119.09/40 =
  * 27.977249999999997 (true decimal 27.97725 is NOT what the double holds)
  * systematic, and any tie-vs-below-tie confusion flips the 4th decimal.
  * Every decimal op stays inside DuckDB's precision-38 cap by splitting
  * integer and fractional parts before scaling.
  */
object ValuationQueries {

  /** SQL fragment: exact scale-`s` rounding of a DOUBLE expression's shortest
    * decimal repr, with the given tie rule over scaled-floor `m_` / sign `d_`. */
  private def roundSql(e: String, s: Int, tie: String): String = {
    val m = math.pow(10, s).toLong
    val mp = m.toString.length
    // final decimal→double must round ONCE: (CAST(n AS DOUBLE))/10^s double-
    // rounds when the scaled value tops 2^53 (a degenerate-denominator group
    // reaches ~1e12 rates at sf0.1, one ULP off) — the exact scale-s DECIMAL
    // through VARCHAR hits strtod's correctly-rounded path, = BigDecimal.toDouble
    val unit = s"CAST(0.${"0" * (s - 1)}1 AS DECIMAL(${s + 1},$s))"
    s"""(SELECT CAST(CAST((i_*$m + rr_) * $unit AS VARCHAR) AS DOUBLE) FROM
       | (SELECT i_, m_, CASE WHEN f_ > 0.5 THEN m_+1 WHEN f_ < 0.5 THEN m_ $tie END AS rr_ FROM
       |  (SELECT d_, i_, y_, CAST(FLOOR(y_) AS DECIMAL(4,0)) AS m_,
       |          y_ - CAST(FLOOR(y_) AS DECIMAL(4,0)) AS f_ FROM
       |   (SELECT d_, i_, CAST(d_ - i_ AS DECIMAL(25,17)) * CAST($m AS DECIMAL($mp,0)) AS y_ FROM
       |    (SELECT d_, CAST(FLOOR(d_) AS DECIMAL(20,0)) AS i_ FROM
       |     (SELECT CAST(CAST(($e) AS VARCHAR) AS DECIMAL(37,17)) AS d_))))))""".stripMargin
  }

  /** `Valuation.round4`: HALF_EVEN — ties to even scaled value (i_*10^4 is
    * always even, so parity of m_ decides). */
  private def rhe(e: String): String =
    roundSql(e, 4, "WHEN m_ % 2 = 0 THEN m_ ELSE m_+1")

  /** Spark `round(col, s)` on doubles: HALF_UP — ties away from zero. */
  private def rhu(e: String, s: Int): String =
    roundSql(e, s, "WHEN d_ >= 0 THEN m_+1 ELSE m_")

  /** lineitem → stock-ledger shape: ~250 (item, warehouse) groups; shipdate
    * orders the fold, a UNIQUE `creation` breaks date ties totally — the
    * reference's invariant (ERPNext `creation` is a unique DB timestamp),
    * which the synthetic fixture does NOT give us for free: lineitem here
    * is not TPC-H-keyed ((orderkey, linenumber) repeats ~118k times at
    * sf0.1, and one pair lands in the same (item, warehouse, shipdate) —
    * without this rank the fold order of that tie is engine-arbitrary and
    * q23 vs the oracle becomes a coin flip). `__dup` ranks duplicates by
    * full row content in both engines; rows tied on EVERYTHING are
    * byte-identical, and swapping identical rows through the fold emits
    * identical output, so the order is total where it matters. */
  def syntheticLedger(s: SparkSession, dir: String): Dataset[StockLedgerRow] = {
    import s.implicits._
    val dupW = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_orderkey"), col("l_linenumber"))
      .orderBy(col("l_partkey"), col("l_suppkey"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"),
        col("l_returnflag"), col("l_linestatus"), col("l_shipdate"))
    Tables.lineitem(s, dir)
      .withColumn("__dup", row_number().over(dupW) - 1)
      .select(
        concat(lit("I"), col("l_partkey") % 50).as("item_code"),
        concat(lit("W"), col("l_suppkey") % 5).as("warehouse"),
        col("l_shipdate").as("posting_ts"),
        timestamp_micros((col("l_orderkey") * 100 + col("l_linenumber")) * 100
          + col("__dup")).as("creation"),
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

  def rowsOnly: Set[String] = Set.empty

  /** DuckDB twin of [[Valuation.step]] run to fixpoint by a recursive CTE.
    * State (bf_qty, last_rate, last_value) rides along each recursion row;
    * arithmetic between roundings is DOUBLE on both sides, so results are
    * bit-identical (verified EXACT on all 60000 rows at sf0.01). */
  def oracleSql: Map[String, String] = Map(
    "q23_valuation_fold" ->
      s"""WITH RECURSIVE li AS (
         |  SELECT *, ROW_NUMBER() OVER (
         |           PARTITION BY l_orderkey, l_linenumber
         |           ORDER BY l_partkey, l_suppkey, l_quantity, l_extendedprice,
         |                    l_discount, l_tax, l_returnflag, l_linestatus,
         |                    l_shipdate) - 1 AS dup
         |  FROM lineitem),
         |src AS (
         |  SELECT 'I' || CAST(l_partkey % 50 AS VARCHAR) AS item_code,
         |         'W' || CAST(l_suppkey % 5 AS VARCHAR) AS warehouse,
         |         l_shipdate AS posting_ts,
         |         make_timestamp((l_orderkey * 100 + l_linenumber) * 100 + dup) AS creation,
         |         CASE WHEN l_orderkey % 13 = 0 THEN 'Stock Reconciliation'
         |              WHEN l_returnflag = 'R' THEN 'Delivery Note'
         |              ELSE 'Purchase Receipt' END AS voucher_type,
         |         CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END AS actual_qty,
         |         l_quantity AS qty_after_transaction,
         |         ${rhu("l_extendedprice / l_quantity", 4)} AS incoming_rate,
         |         ${rhu("l_extendedprice / l_quantity", 4)} AS valuation_rate,
         |         ${rhu("l_extendedprice", 2)} AS stock_value,
         |         ${rhu("l_extendedprice", 4)} AS stock_value_difference
         |  FROM li),
         |ledger AS MATERIALIZED (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY item_code, warehouse
         |                               ORDER BY posting_ts, creation) AS rn
         |  FROM src),
         |fold AS (
         |  SELECT item_code, warehouse, 0::BIGINT AS rn,
         |         CAST(NULL AS TIMESTAMP) AS posting_ts, CAST(NULL AS TIMESTAMP) AS creation,
         |         CAST(NULL AS VARCHAR) AS voucher_type, CAST(NULL AS DOUBLE) AS actual_qty,
         |         CAST(NULL AS DOUBLE) AS qty_after_transaction, CAST(NULL AS DOUBLE) AS stock_value,
         |         CAST(NULL AS DOUBLE) AS valuation_rate, CAST(NULL AS DOUBLE) AS stock_value_difference,
         |         CAST(NULL AS DOUBLE) AS incoming_rate, CAST(NULL AS DOUBLE) AS outgoing_rate,
         |         0.0::DOUBLE AS bf_qty, 0.0::DOUBLE AS last_rate, 0.0::DOUBLE AS last_value
         |  FROM (SELECT DISTINCT item_code, warehouse FROM ledger)
         |  UNION ALL
         |  SELECT item_code, warehouse, rn, posting_ts, creation, voucher_type, actual_qty,
         |         CASE WHEN is_recon THEN r_qat ELSE denom END AS qty_after_transaction,
         |         CASE WHEN is_receipt THEN last_value + ${rhe("actual_qty * rcpt_avg")}
         |              WHEN is_recon THEN r_sv
         |              ELSE last_value + oth_svd END AS stock_value,
         |         CASE WHEN is_receipt THEN rcpt_avg WHEN is_recon THEN r_vr
         |              ELSE oth_avg END AS valuation_rate,
         |         CASE WHEN is_receipt THEN ${rhe("actual_qty * r_ir")}
         |              WHEN is_recon THEN last_value - r_sv
         |              ELSE oth_svd END AS stock_value_difference,
         |         CASE WHEN is_receipt OR is_recon THEN r_ir
         |              WHEN actual_qty > 0 THEN r_ir ELSE 0.0 END AS incoming_rate,
         |         CASE WHEN NOT is_receipt AND NOT is_recon AND actual_qty < 0
         |              THEN oth_avg ELSE 0.0 END AS outgoing_rate,
         |         CASE WHEN is_recon THEN r_qat ELSE denom END AS bf_qty,
         |         CASE WHEN is_receipt THEN rcpt_avg WHEN is_recon THEN r_vr
         |              ELSE oth_avg END AS last_rate,
         |         CASE WHEN is_receipt THEN last_value + ${rhe("actual_qty * r_ir")}
         |              WHEN is_recon THEN r_sv
         |              ELSE last_value + oth_svd END AS last_value
         |  FROM (
         |    SELECT l.item_code, l.warehouse, l.rn, l.posting_ts, l.creation,
         |           l.voucher_type, l.actual_qty,
         |           l.qty_after_transaction AS r_qat, l.incoming_rate AS r_ir,
         |           l.valuation_rate AS r_vr, l.stock_value AS r_sv,
         |           f.bf_qty, f.last_rate, f.last_value,
         |           l.voucher_type IN ('Purchase Receipt','Received from Subcontractor') AS is_receipt,
         |           l.voucher_type = 'Stock Reconciliation' AS is_recon,
         |           f.bf_qty + l.actual_qty AS denom,
         |           CASE WHEN (CASE WHEN l.incoming_rate > 0 AND f.bf_qty + l.actual_qty <> 0
         |                      THEN ${rhe("(f.last_value + l.stock_value_difference) / (f.bf_qty + l.actual_qty)")}
         |                      ELSE f.last_rate END) = 0 THEN l.valuation_rate
         |                ELSE (CASE WHEN l.incoming_rate > 0 AND f.bf_qty + l.actual_qty <> 0
         |                      THEN ${rhe("(f.last_value + l.stock_value_difference) / (f.bf_qty + l.actual_qty)")}
         |                      ELSE f.last_rate END) END AS rcpt_avg,
         |           CASE WHEN f.last_rate = 0 THEN l.valuation_rate ELSE f.last_rate END AS oth_avg,
         |           CASE WHEN l.actual_qty < 0
         |                THEN ${rhe("l.actual_qty * (CASE WHEN f.last_rate = 0 THEN l.valuation_rate ELSE f.last_rate END)")}
         |                ELSE l.stock_value_difference END AS oth_svd
         |    FROM fold f
         |    JOIN ledger l ON l.item_code = f.item_code AND l.warehouse = f.warehouse
         |                 AND l.rn = f.rn + 1))
         |SELECT item_code, warehouse, posting_ts, creation, voucher_type, actual_qty,
         |       qty_after_transaction, stock_value, valuation_rate,
         |       stock_value_difference, incoming_rate, outgoing_rate
         |FROM fold WHERE rn > 0
         |ORDER BY item_code, warehouse, posting_ts, creation""".stripMargin
  )
}
