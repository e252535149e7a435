package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.Dataset

/** Input row of the stock-ledger valuation fold (SURVEY §2.6 W6). Field names
  * mirror the reference ledger columns
  * (`scripts/test/item_valuation_update.py:469-506`). */
final case class StockLedgerRow(
    item_code: String,
    warehouse: String,
    posting_ts: Timestamp,
    creation: Timestamp,
    voucher_type: String,
    actual_qty: Double,
    qty_after_transaction: Double,
    incoming_rate: Double,
    valuation_rate: Double,
    stock_value: Double,
    stock_value_difference: Double)

/** Output row: the recomputed qty/value/rate columns the reference writes
  * back per ledger row (`item_valuation_update.py:185-243`). */
final case class ValuedStockRow(
    item_code: String,
    warehouse: String,
    posting_ts: Timestamp,
    creation: Timestamp,
    voucher_type: String,
    actual_qty: Double,
    qty_after_transaction: Double,
    stock_value: Double,
    valuation_rate: Double,
    stock_value_difference: Double,
    incoming_rate: Double,
    outgoing_rate: Double)

/** W6: the stateful moving-average valuation fold — the one reference
  * operator no frame window can express, because each output depends on the
  * previously COMPUTED state, not previous input rows
  * (`scripts/test/item_valuation_update.py:161-243`).
  *
  * Semantics preserved exactly, quirks included:
  *   - receipts ('Purchase Receipt'/'Received from Subcontractor'):
  *     `avg_rate = round((last_value + svd_in)/(bf_qty + qty), 4)` when
  *     `incoming_rate > 0`, else carry the previous rate; a zero rate falls
  *     back to the row's valuation_rate; the emitted stock_value advances by
  *     `round(qty*avg_rate, 4)` but the STATE value advances by
  *     `round(qty*incoming_rate, 4)` — faithful to the reference's
  *     asymmetric update (`:205-209` vs `:185-190`).
  *   - 'Stock Reconciliation' RESETS state from the row's declared
  *     qty/rate/value and emits `last_value - stock_value` as the difference.
  *   - everything else consumes at the carried average rate; negative
  *     quantities value out at `round(qty*avg_rate, 4)`, positive pass the
  *     row's own difference through.
  *
  * Rounding is HALF_EVEN over the exact double (Python `round` behavior).
  *
  * Scale: one shuffle on (item_code, warehouse); each group is sorted in
  * executor memory — group size is bounded by one item's ledger history,
  * matching the reference's per-item cursor loop. A single hot item is the
  * skew risk (SURVEY §7.4); mitigation is date-bounded recompute windows
  * (the reference itself cuts at `posting_date >= start_date`), not salting —
  * the fold is order-dependent and cannot split a key.
  */
object Valuation {

  final case class State(bfQty: Double, lastAvgRate: Double, lastValue: Double)
  val zeroState: State = State(0.0, 0.0, 0.0)

  private val ReceiptTypes = Set("Purchase Receipt", "Received from Subcontractor")

  def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_EVEN).toDouble

  /** One transition of the reference state machine: (row, state) →
    * (output row, next state). */
  def step(r: StockLedgerRow, st: State): (ValuedStockRow, State) = {
    if (ReceiptTypes.contains(r.voucher_type)) {
        val denom = st.bfQty + r.actual_qty
        var avgRate =
          if (r.incoming_rate > 0 && denom != 0)
            round4((st.lastValue + r.stock_value_difference) / denom)
          else st.lastAvgRate
        if (avgRate == 0) avgRate = r.valuation_rate
        val svd = round4(r.actual_qty * avgRate)
        val cfValue = st.lastValue + svd
        val cfQty = st.bfQty + r.actual_qty
        val out = ValuedStockRow(r.item_code, r.warehouse, r.posting_ts, r.creation,
          r.voucher_type, r.actual_qty,
          qty_after_transaction = cfQty,
          stock_value = cfValue,
          valuation_rate = avgRate,
          stock_value_difference = round4(r.actual_qty * r.incoming_rate),
          incoming_rate = r.incoming_rate,
          outgoing_rate = 0.0)
        (out, State(cfQty, avgRate, st.lastValue + round4(r.actual_qty * r.incoming_rate)))
      } else if (r.voucher_type == "Stock Reconciliation") {
        val out = ValuedStockRow(r.item_code, r.warehouse, r.posting_ts, r.creation,
          r.voucher_type, r.actual_qty,
          qty_after_transaction = r.qty_after_transaction,
          stock_value = r.stock_value,
          valuation_rate = r.valuation_rate,
          stock_value_difference = st.lastValue - r.stock_value,
          incoming_rate = r.incoming_rate,
          outgoing_rate = 0.0)
        (out, State(r.qty_after_transaction, r.valuation_rate, r.stock_value))
      } else {
        var avgRate = st.lastAvgRate
        if (avgRate == 0) avgRate = r.valuation_rate
        val svd =
          if (r.actual_qty < 0) round4(r.actual_qty * avgRate)
          else r.stock_value_difference
        val cfValue = st.lastValue + svd
        val cfQty = st.bfQty + r.actual_qty
        val out = ValuedStockRow(r.item_code, r.warehouse, r.posting_ts, r.creation,
          r.voucher_type, r.actual_qty,
          qty_after_transaction = cfQty,
          stock_value = cfValue,
          valuation_rate = avgRate,
          stock_value_difference = svd,
          incoming_rate = if (r.actual_qty > 0) r.incoming_rate else 0.0,
          outgoing_rate = if (r.actual_qty < 0) avgRate else 0.0)
        (out, State(cfQty, avgRate, cfValue))
      }
  }

  /** Full-precision sort key: getTime alone truncates to milliseconds, so two
    * creation stamps differing only in microseconds would tie and break by
    * (nondeterministic) shuffle arrival order. (getTime, getNanos) is a total
    * order at nanosecond precision. */
  private def tsKey(t: Timestamp): (Long, Int) = (t.getTime, t.getNanos)

  /** Sequential fold over one (item, warehouse) group. Input iterator may be
    * unordered; the fold sorts by (posting_ts, creation) — the reference's
    * ORDER BY posting_date, posting_time, creation. */
  def foldGroup(rows: Iterator[StockLedgerRow], init: State): Iterator[ValuedStockRow] = {
    val ordered = rows.toArray.sortBy(r => (tsKey(r.posting_ts), tsKey(r.creation)))
    var st = init
    ordered.iterator.map { r =>
      val (out, next) = step(r, st)
      st = next
      out
    }
  }

  /** Distributed fold: one shuffle on the natural key, then a per-group
    * in-memory ordered scan (`groupByKey.flatMapGroups`). Group history must
    * fit one executor's memory — matches the reference's per-item cursor. */
  def revalue(ds: Dataset[StockLedgerRow], init: State = zeroState): Dataset[ValuedStockRow] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(r => (r.item_code, r.warehouse))
      .flatMapGroups((_, rows) => foldGroup(rows, init))
  }

  /** Closing state of one (item, warehouse) ledger — what the valuation
    * fold leaves behind after the last row. */
  final case class ClosingValuation(qty: Double, valuation_rate: Double,
                                    stock_value: Double)

  /** SQL-callable form of the fold (SURVEY §7.3's optional exposure): a
    * typed `Aggregator` that buffers the group's rows, orders them by
    * (posting_ts, creation) in `finish`, and runs the same [[step]] state
    * machine to its final state.
    *
    * An order-dependent fold cannot be a streaming-merge aggregate, so the
    * buffer holds the group's rows — the same one-group-in-memory bound as
    * [[revalue]]; `merge` concatenates partial buffers, keeping map-side
    * partials safe. Register with [[registerUdaf]] and call as
    * `closing_valuation(item_code, warehouse, ..., stock_value_difference)`
    * in GROUP BY SQL.
    */
  object ClosingValuationAgg
    extends org.apache.spark.sql.expressions.Aggregator[
      StockLedgerRow, List[StockLedgerRow], ClosingValuation] {
    import org.apache.spark.sql.{Encoder, Encoders}
    override def zero: List[StockLedgerRow] = Nil
    // prepend, not append: List append is O(n); finish re-sorts anyway
    override def reduce(b: List[StockLedgerRow], r: StockLedgerRow): List[StockLedgerRow] = r :: b
    override def merge(a: List[StockLedgerRow], b: List[StockLedgerRow]): List[StockLedgerRow] = a ::: b
    override def finish(buf: List[StockLedgerRow]): ClosingValuation = {
      var st = zeroState
      buf.sortBy(r => (tsKey(r.posting_ts), tsKey(r.creation)))
        .foreach { r => st = step(r, st)._2 }
      ClosingValuation(st.bfQty, st.lastAvgRate, st.lastValue)
    }
    override def bufferEncoder: Encoder[List[StockLedgerRow]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[StockLedgerRow]]()
    override def outputEncoder: Encoder[ClosingValuation] = Encoders.product
  }

  /** Registers `closing_valuation` as a SQL aggregate on the session. */
  def registerUdaf(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.udf.register("closing_valuation",
      org.apache.spark.sql.functions.udaf(ClosingValuationAgg))

  /** Secondary-sort variant for HUGE single-key histories: repartition by
    * key, sortWithinPartitions by (key, ts, creation), then stream each
    * partition with O(1) state — Spark's sort spills to disk, so a group
    * larger than executor memory still folds. Same output as [[revalue]]
    * (ValuationSpec asserts it). */
  def revalueStreaming(ds: Dataset[StockLedgerRow],
                       init: State = zeroState): Dataset[ValuedStockRow] = {
    import ds.sparkSession.implicits._
    import org.apache.spark.sql.functions.col
    ds.repartition(col("item_code"), col("warehouse"))
      .sortWithinPartitions(col("item_code"), col("warehouse"),
        col("posting_ts"), col("creation"))
      .mapPartitions { rows =>
        var curKey: (String, String) = null
        var st = init
        rows.map { r =>
          val k = (r.item_code, r.warehouse)
          if (k != curKey) { curKey = k; st = init }
          val (out, next) = step(r, st)
          st = next
          out
        }
      }
  }
}
