package graft

import java.sql.Timestamp

import graft.analytics.ValuationQueries
import graft.operators.{StockLedgerRow, Valuation, ValuedStockRow}

/** W6 valuation fold (`item_valuation_update.py:161-243`): hand-computed
  * scenario covering all three voucher branches + state reset, then the
  * distributed-vs-sequential equivalence property on the synthetic ledger.
  */
class ValuationSpec extends SparkSpec {
  import spark.implicits._

  private def ts(i: Int) = new Timestamp(i * 86400000L)

  private def row(i: Int, vt: String, qty: Double, inRate: Double = 0.0,
                  valRate: Double = 0.0, qtyAfter: Double = 0.0,
                  stockValue: Double = 0.0, svd: Double = 0.0) =
    StockLedgerRow("I1", "W1", ts(i), ts(i), vt, qty, qtyAfter, inRate, valRate,
      stockValue, svd)

  private val scenario = Seq(
    row(1, "Purchase Receipt", 10, inRate = 2.0, valRate = 2.0, qtyAfter = 10,
      stockValue = 20, svd = 20.0),
    row(2, "Delivery Note", -4),
    row(3, "Stock Reconciliation", 0, valRate = 3.0, qtyAfter = 20, stockValue = 60),
    row(4, "Purchase Receipt", 10, inRate = 4.0, valRate = 4.0, qtyAfter = 30,
      stockValue = 100, svd = 40.0),
    row(5, "Delivery Note", -30))

  private def approx(a: Double, b: Double) = math.abs(a - b) < 1e-9

  test("fold reproduces the reference state machine (hand-computed)") {
    val out = Valuation.foldGroup(scenario.iterator, Valuation.zeroState).toArray
    // r1 receipt: avg=(0+20)/10=2.0
    assert(out(0).valuation_rate === 2.0 && out(0).qty_after_transaction === 10.0
      && out(0).stock_value === 20.0 && out(0).stock_value_difference === 20.0)
    // r2 issue at carried rate 2.0: svd=-8, value 12, qty 6, outgoing_rate=2.0
    assert(out(1).valuation_rate === 2.0 && approx(out(1).stock_value, 12.0)
      && out(1).qty_after_transaction === 6.0
      && approx(out(1).stock_value_difference, -8.0)
      && out(1).outgoing_rate === 2.0 && out(1).incoming_rate === 0.0)
    // r3 reconciliation: emits lastValue - declared value = 12-60 = -48;
    // passes declared qty/value/rate through; resets state
    assert(approx(out(2).stock_value_difference, -48.0)
      && out(2).qty_after_transaction === 20.0 && out(2).stock_value === 60.0
      && out(2).valuation_rate === 3.0)
    // r4 receipt after reset: avg=round((60+40)/30,4)=3.3333;
    // emitted value 60+round(10*3.3333,4)=93.333; state value 60+40=100
    assert(out(3).valuation_rate === 3.3333 && approx(out(3).stock_value, 93.333)
      && out(3).qty_after_transaction === 30.0
      && approx(out(3).stock_value_difference, 40.0))
    // r5 drain at 3.3333: svd=round(-30*3.3333,4)=-99.999; value 100-99.999
    assert(approx(out(4).stock_value_difference, -99.999)
      && approx(out(4).stock_value, 0.001) && out(4).qty_after_transaction === 0.0
      && out(4).outgoing_rate === 3.3333)
  }

  test("non-zero opening balance feeds the first receipt's average") {
    // opening 10 units @ 3.0 (value 30); receive 10 @ 5.0 →
    // avg = round((30+50)/20, 4) = 4.0
    val init = Valuation.State(bfQty = 10, lastAvgRate = 3.0, lastValue = 30)
    val out = Valuation.foldGroup(
      Iterator(row(1, "Purchase Receipt", 10, inRate = 5.0, valRate = 5.0, svd = 50.0)),
      init).toArray
    assert(out(0).valuation_rate === 4.0 && out(0).qty_after_transaction === 20.0)
  }

  test("zero incoming_rate on a receipt carries the previous rate; zero rate falls back to row valuation_rate") {
    val rows = Seq(
      row(1, "Purchase Receipt", 5, inRate = 0.0, valRate = 7.0), // avg 0 → row rate
      row(2, "Purchase Receipt", 5, inRate = 0.0, valRate = 9.0)) // carries 7.0
    val out = Valuation.foldGroup(rows.iterator, Valuation.zeroState).toArray
    assert(out(0).valuation_rate === 7.0 && out(1).valuation_rate === 7.0)
  }

  test("secondary-sort streaming fold equals flatMapGroups fold") {
    val ledger = ValuationQueries.syntheticLedger(spark, sf)
    def key(r: graft.operators.ValuedStockRow) =
      (r.item_code, r.warehouse, r.posting_ts.getTime, r.creation.getTime)
    val grouped = Valuation.revalue(ledger).collect().sortBy(key)
    val streamed = Valuation.revalueStreaming(ledger).collect().sortBy(key)
    assert(grouped.length === streamed.length && grouped.length > 0)
    assert(grouped.toSeq === streamed.toSeq)
  }

  test("distributed fold equals sequential fold on the synthetic ledger (sf0.001)") {
    val ledger = ValuationQueries.syntheticLedger(spark, sf)
    val distributed = Valuation.revalue(ledger).collect()
      .sortBy(r => (r.item_code, r.warehouse, r.posting_ts.getTime, r.creation.getTime))

    val sequential = ledger.collect()
      .groupBy(r => (r.item_code, r.warehouse)).toSeq
      .flatMap { case (_, rows) =>
        Valuation.foldGroup(rows.iterator, Valuation.zeroState)
      }
      .sortBy(r => (r.item_code, r.warehouse, r.posting_ts.getTime, r.creation.getTime))

    assert(distributed.length === sequential.length && distributed.length > 0)
    distributed.zip(sequential).foreach { case (d, e) =>
      assert(d === e, s"mismatch: $d vs $e")
    }
  }

  test("closing_valuation UDAF (SQL) equals the last fold state per group") {
    val ledger = ValuationQueries.syntheticLedger(spark, sf)
    Valuation.registerUdaf(spark)
    ledger.toDF().createOrReplaceTempView("stock_ledger")
    val viaSql = spark.sql(
      """SELECT item_code, warehouse,
        |       closing_valuation(item_code, warehouse, posting_ts, creation,
        |         voucher_type, actual_qty, qty_after_transaction, incoming_rate,
        |         valuation_rate, stock_value, stock_value_difference) AS c
        |FROM stock_ledger
        |GROUP BY item_code, warehouse""".stripMargin)
      .selectExpr("item_code", "warehouse", "c.qty", "c.valuation_rate", "c.stock_value")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap

    // reference: the fold's final STATE per group (NOT the last emitted
    // row — the reference's receipt update advances the state value by
    // incoming_rate but the emitted stock_value by avg_rate, and the state
    // is what seeds the next incremental fold)
    val expected = ledger.collect()
      .groupBy(r => (r.item_code, r.warehouse)).map { case (k, rows) =>
        var st = Valuation.zeroState
        rows.sortBy(r => (r.posting_ts.getTime, r.creation.getTime))
          .foreach { r => st = Valuation.step(r, st)._2 }
        k -> (st.bfQty, st.lastAvgRate, st.lastValue)
      }
    assert(viaSql.keySet === expected.keySet)
    expected.foreach { case (k, (q, vr, sv)) =>
      val (gq, gvr, gsv) = viaSql(k)
      assert(gq === q, s"$k qty")
      assert(gvr === vr, s"$k rate")
      assert(gsv === sv, s"$k value")
    }
  }
}
