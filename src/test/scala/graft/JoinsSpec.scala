package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Join operator equivalences not covered by the oracle queries. */
class JoinsSpec extends SparkSpec {

  test("basketPairsViaSets equals the self-join formulation (full pair table)") {
    val li = Tables.lineitem(spark, sf).select(col("l_orderkey"), col("l_partkey"))
    // compare WITHOUT the top-k cutoff: equal counts for every pair
    val viaJoin = Joins.basketPairs(li, Seq("l_orderkey"), "l_partkey", Int.MaxValue)
    val viaSets = Joins.basketPairsViaSets(li, Seq("l_orderkey"), "l_partkey", Int.MaxValue)
    assert(viaJoin.exceptAll(viaSets).isEmpty && viaSets.exceptAll(viaJoin).isEmpty)
    assert(viaSets.count() > 0)
  }

  test("asOf picks the latest right row at-or-before each left row") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val trades = Seq((1, ts("2024-01-01 10:00:00"), 5.0), (1, ts("2024-01-01 12:00:00"), 6.0),
      (2, ts("2024-01-01 10:30:00"), 7.0)).toDF("k", "ts", "qty")
    val quotes = Seq((1, ts("2024-01-01 09:00:00"), 100.0), (1, ts("2024-01-01 11:00:00"), 200.0),
      (1, ts("2024-01-01 12:00:00"), 300.0)).toDF("k", "quote_ts", "price")

    val inner = Joins.asOf(trades, quotes, Seq("k"), "ts", "quote_ts")
      .select("k", "ts", "qty", "quote_ts", "price")
      .as[(Int, Timestamp, Double, Timestamp, Double)].collect().sortBy(_._2)
    // trade@10 → quote@9 (100); trade@12 → quote@12 inclusive (300); k=2 dropped (inner)
    assert(inner.length === 2)
    assert(inner(0)._5 === 100.0 && inner(1)._5 === 300.0)

    val left = Joins.asOf(trades, quotes, Seq("k"), "ts", "quote_ts", "left")
    assert(left.count() === 3)
    assert(left.filter(col("k") === 2).head().getAs[Any]("price") == null)
  }

  test("asOfNative (planner-level exec) equals the union-window form on events") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value").as("purchase_value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    for (jt <- Seq("inner", "left")) {
      val window = Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "click_ts", jt)
      val native = Joins.asOfNative(purchases, clicks, Seq("user_id"), "ts", "click_ts", jt)
      assert(native.columns.toSeq === window.columns.toSeq)
      assert(native.count() === window.count(), s"row count differs for $jt")
      assert(window.exceptAll(native).isEmpty && native.exceptAll(window).isEmpty,
        s"result differs for $jt")
    }
  }

  test("asOfNative: null keys and null timestamps never match; outer null-pads them") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq(
      (Option(1), Option(ts("2024-01-01 10:00:00")), "a"),
      (Option.empty[Int], Option(ts("2024-01-01 10:00:00")), "null-key"),
      (Option(1), Option.empty[Timestamp], "null-ts")
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (Option(1), Option(ts("2024-01-01 09:00:00")), 100.0),
      (Option.empty[Int], Option(ts("2024-01-01 09:00:00")), 666.0), // never a candidate
      (Option(1), Option.empty[Timestamp], 777.0) // never a candidate
    ).toDF("k", "rts", "price")

    val inner = Joins.asOfNative(left, right, Seq("k"), "ts", "rts", "inner")
    assert(inner.select("tag", "price").as[(String, Double)].collect().toSeq ===
      Seq(("a", 100.0)))

    val outer = Joins.asOfNative(left, right, Seq("k"), "ts", "rts", "left")
    assert(outer.count() === 3)
    assert(outer.filter(col("tag") =!= "a").filter(col("price").isNotNull).isEmpty)
  }

  test("asOfNative plan: AsOfJoinExec with one exchange per side, no window") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
    val df = Joins.asOfNative(purchases, clicks, Seq("user_id"), "ts", "click_ts")
    df.count() // materialize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"missing AsOfJoinExec:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 exchanges, got $exchanges:\n$plan")
    assert(!plan.contains("Window"), s"unexpected Window:\n$plan")
  }
}
