package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Misra-Gries guarantee + exact heavy hitters consistency. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("Misra-Gries contains every element with frequency > N/(k+1)") {
    val agg = Sketches.misraGries(9) // threshold N/10
    // 1000 tokens: 'hot' 200x, 'warm' 150x, rest spread thin
    val tokens = Seq.fill(200)("hot") ++ Seq.fill(150)("warm") ++
      (0 until 650).map(i => s"cold${i % 130}")
    val shuffled = new scala.util.Random(42).shuffle(tokens)
    // distributed: fold per slice, merge across slices (mirrors partial agg)
    val slices = shuffled.grouped(100).toSeq
    val partials = slices.map(_.foldLeft(agg.zero)(agg.reduce))
    val summary = agg.finish(partials.reduce(agg.merge))
    assert(summary.contains("hot") && summary.contains("warm"))
    assert(summary.size <= 9)
    // counts underestimate by at most N/(k+1) = 100
    assert(summary("hot") >= 100L && summary("hot") <= 200L)
  }

  test("Misra-Gries via groupByKey on the documents table agrees with exact hitters") {
    val docs = Tables.documents(spark, sf)
      .select(explode(graft.functions.Text.tokens(col("text"))).as("token"))
      .as[String]
    val n = docs.count()
    val k = 49 // threshold n/50
    val summary = docs.groupByKey(_ => 0)
      .mapValues(identity[String])
      .agg(Sketches.misraGries(k).toColumn.name("mg"))
      .collect().head._2
    val exact = Sketches.heavyHitters(
        Tables.documents(spark, sf)
          .select(graft.functions.Text.tokens(col("text")).as("toks")),
        "toks", support = 1.0 / (k + 1))
      .select("token").as[String].collect().toSet
    // every exact hitter above n/(k+1) must appear in the sketch
    assert(exact.nonEmpty && exact.subsetOf(summary.keySet),
      s"missing: ${exact -- summary.keySet}")
  }
}
