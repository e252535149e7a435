package graft

import org.apache.spark.sql.functions._
import graft.operators.Joins

/** Join operator equivalences not covered by the oracle queries. */
class JoinsSpec extends SparkSpec {
  import spark.implicits._

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

  test("asOf rightTieBreak resolves same-timestamp right duplicates deterministically") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    // two quotes in the same second: without a tie-break the survivor is
    // shuffle-order-dependent; the larger seq must win (last write)
    val trades = Seq((1, ts("2024-01-01 11:00:00"), 1.0)).toDF("k", "ts", "qty")
    val quotes = Seq(
      (1, ts("2024-01-01 10:00:00"), 100.0, 1L),
      (1, ts("2024-01-01 10:00:00"), 200.0, 2L)).toDF("k", "quote_ts", "price", "seq")
    val got = Joins.asOf(trades, quotes, Seq("k"), "ts", "quote_ts",
      rightTieBreak = Some(col("seq")))
    assert(got.select("price").as[Double].collect().toSeq === Seq(200.0))
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

  test("asOfNative raw builder collects without a projection on top (UnsafeRow contract)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq((1, ts("2024-01-01 10:00:00"))).toDF("k", "ts")
    val right = Seq((1, ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "rts", "v")
    // no select/orderBy above the exec node: getByteArrayRdd requires the
    // operator itself to emit UnsafeRow
    val raw = org.apache.spark.sql.graft.AsOfJoinNative
      .asOf(left, right, Seq("k"), "ts", "rts", "inner")
    assert(raw.collect().length === 1)
    // ...and a sort directly above it works too (by the right-only column —
    // the raw join output carries BOTH sides' key columns)
    assert(raw.sort("v").collect().length === 1)
  }

  test("asOfNative resolves columns with the session resolver (case-insensitive by default)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    val left = Seq((1, ts("2024-01-01 10:00:00"))).toDF("K", "TS")
    val right = Seq((1, ts("2024-01-01 09:00:00"), 5.0)).toDF("k", "rts", "v")
    val got = Joins.asOfNative(left, right, Seq("k"), "ts", "RTS".toLowerCase, "inner")
    assert(got.count() === 1)
    intercept[IllegalArgumentException] {
      Joins.asOfNative(left, right, Seq("missing"), "ts", "rts", "inner").count()
    }
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.AsOfJoinNative
        .asOf(left, right, Seq.empty, "ts", "rts", "inner")
    }
  }

  test("rangeJoin equals the theta-join formulation; boundaries are [start, end)") {
    import spark.implicits._
    import java.sql.Timestamp
    def ts(s: String): Timestamp = Timestamp.valueOf(s)
    // intervals deliberately crossing bucket boundaries (width 1 day,
    // interval 3.5 days) + boundary points
    val points = Seq(
      (1, 10L, ts("2024-01-05 00:00:00")), // == start → included
      (1, 11L, ts("2024-01-08 12:00:00")), // == end → excluded
      (1, 12L, ts("2024-01-07 23:59:59")), // interior, crosses buckets
      (2, 20L, ts("2024-01-05 06:00:00")), // other key
      (1, 13L, ts("2024-01-04 23:59:59"))  // before start
    ).toDF("k", "pid", "ts")
    val intervals = Seq(
      (1, 100L, ts("2024-01-05 00:00:00"), ts("2024-01-08 12:00:00")),
      (2, 200L, ts("2024-01-01 00:00:00"), ts("2024-01-02 00:00:00"))
    ).toDF("k", "iid", "s", "e")

    val bucketed = Joins.rangeJoin(points, intervals, Seq("k"), "ts", "s", "e",
        java.time.Duration.ofDays(1))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(bucketed === Set((10L, 100L), (12L, 100L)))

    // equivalence with the naive theta join on real data
    val o = Tables.orders(spark, sf)
    val pts = o.select(col("o_custkey"), col("o_orderkey"),
      col("o_orderdate").cast("timestamp").as("ts"))
    val iv = o.select(col("o_custkey").as("ck2"),
      col("o_orderkey").as("prior_orderkey"),
      col("o_orderdate").cast("timestamp").as("win_start"),
      (col("o_orderdate").cast("timestamp") + expr("INTERVAL 30 DAYS")).as("win_end"))
    val viaBuckets = Joins.rangeJoin(pts,
        iv.withColumnRenamed("ck2", "o_custkey"), Seq("o_custkey"),
        "ts", "win_start", "win_end", java.time.Duration.ofDays(30))
      .filter(col("o_orderkey") =!= col("prior_orderkey"))
      .select("o_orderkey", "prior_orderkey").as[(Long, Long)].collect().toSet
    val viaTheta = pts.join(iv, col("o_custkey") === col("ck2") &&
        col("ts") >= col("win_start") && col("ts") < col("win_end") &&
        col("o_orderkey") =!= col("prior_orderkey"))
      .select("o_orderkey", "prior_orderkey").as[(Long, Long)].collect().toSet
    assert(viaBuckets === viaTheta)
    assert(viaBuckets.nonEmpty)
  }

  test("asOfNative under aggressive AQE coalescing still co-partitions both sides") {
    // AQE must coalesce the two exchanges feeding AsOfJoinExec IDENTICALLY,
    // or rows with equal keys land in different partitions and silently
    // drop/mismatch. Force heavy coalescing and compare against the
    // window-based form at sf0.01 (large enough for multiple stages).
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "64")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      val ev = Tables.events(spark, "/root/testdata/sf0.01")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("value").as("click_value"))
      val window = Joins.asOf(purchases, clicks, Seq("user_id"), "ts", "click_ts")
        .select(col("event_id"), col("click_ts").cast("long"))
        .as[(Long, Long)].collect().toSet
      val native = Joins.asOfNative(purchases, clicks, Seq("user_id"), "ts", "click_ts")
        .select(col("event_id"), col("click_ts").cast("long"))
        .as[(Long, Long)].collect().toSet
      assert(native === window)
      assert(native.size > 100)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
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
