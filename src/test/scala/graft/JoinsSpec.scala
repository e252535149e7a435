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
}
