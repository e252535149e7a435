package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TopK

/** Bounded top-k Aggregator: equality with the window form, tie handling,
  * compaction correctness, and the pre-shuffle-pruning plan shape. */
class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("aggregator top-k equals the row_number window formulation on orders") {
    val df = SparkEntry.queries("q61_topk_per_group")(spark, sf)
    val viaWindow = Tables.orders(spark, sf)
      .withColumn("rank", row_number().over(
        Window.partitionBy("o_custkey").orderBy(desc("o_totalprice"), col("o_orderkey"))))
      .filter(col("rank") <= 3)
      .select("o_custkey", "rank", "o_orderkey", "o_totalprice")
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(df.as[(Long, Int, Long, Double)].collect().toSet === viaWindow)
    assert(viaWindow.nonEmpty)
  }

  test("NaN scores rank worst and never break the comparator's contract") {
    // > 4k entries force a compaction sort; NaN-vs-value incomparability
    // under the old sortWith predicate hit TimSort's contract check
    val agg = TopK.aggregator(8)
    val entries = (1L to 200L).map(i =>
      TopK.Entry(if (i % 3 == 0) Double.NaN else i.toDouble, i))
    val folded = entries.foldLeft(agg.zero)(agg.reduce)
    val top = agg.finish(folded)
    assert(top.length === 8)
    assert(top.forall(!_.ord.isNaN), "NaN must rank below every real score")
    assert(top.map(_.ord) === top.map(_.ord).sorted.reverse)
    // all-NaN input: deterministic id-ordered output, no crash
    val allNaN = (1L to 50L).map(i => TopK.Entry(Double.NaN, i))
    val nanTop = agg.finish(allNaN.foldLeft(agg.zero)(agg.reduce))
    assert(nanTop.map(_.id) === (1L to 8L))
  }

  test("compaction never loses a top-k element (adversarial ascending feed)") {
    val agg = TopK.aggregator(3)
    // ascending feed: every new element is the current best-so-far's better
    val buf = (1 to 100).foldLeft(agg.zero)((b, i) =>
      agg.reduce(b, TopK.Entry(i.toDouble, i.toLong)))
    assert(agg.finish(buf).map(_.id) === Seq(100L, 99L, 98L))
    // merge of two compacted halves
    val left = (1 to 50).foldLeft(agg.zero)((b, i) => agg.reduce(b, TopK.Entry(i, i)))
    val right = (51 to 100).foldLeft(agg.zero)((b, i) => agg.reduce(b, TopK.Entry(i, i)))
    assert(agg.finish(agg.merge(left, right)).map(_.id) === Seq(100L, 99L, 98L))
  }

  test("ties break by ascending id; short groups return all rows") {
    val agg = TopK.aggregator(3)
    val buf = Seq(TopK.Entry(5.0, 9L), TopK.Entry(5.0, 2L), TopK.Entry(5.0, 7L),
      TopK.Entry(5.0, 4L)).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(buf).map(_.id) === Seq(2L, 4L, 7L))
    val short = agg.reduce(agg.zero, TopK.Entry(1.0, 1L))
    assert(agg.finish(short).map(_.id) === Seq(1L))
  }

  test("plan prunes before the shuffle: partial + final ObjectHashAggregate") {
    val df = SparkEntry.queries("q61_topk_per_group")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("ObjectHashAggregate".r.findAllIn(p).length >= 2,
      s"expected partial+final typed aggregation:\n${p.take(2000)}")
    assert(!p.contains("Window"), "top-k must not fall back to a window sort")
  }
}
