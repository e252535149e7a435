package graft

import graft.quality.Expectations
import graft.quality.Expectations._

/** DQ expectations (V2/V3): single-pass evaluation, GE `mostly` semantics,
  * missing-column handling, gate raise.
  */
class ExpectationsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    (1, Some("a"), 10.0),
    (2, Some("b"), 20.0),
    (3, None, 30.0),
    (4, Some("a"), 40.0)
  ).toDF("id", "cat", "v")

  test("passing suite evaluates all checks in one pass") {
    val results = Expectations.run(df, Seq(
      RowCountEquals(4),
      RowCountBetween(2, 10),
      ColumnExists("id"),
      Unique("id"),
      NotNull("cat", mostly = 0.7),
      ValuesIn("cat", Seq("a", "b")),
      MinBetween("v", 0, 15),
      MaxBetween("v", 35, 45),
      MeanBetween("v", 24, 26)))
    assert(results.length === 9 && results.forall(_.passed), results.mkString("\n"))
  }

  test("failures report observed values") {
    val results = Expectations.run(df, Seq(
      RowCountEquals(5),
      NotNull("cat"), // 0.75 < 1.0
      Unique("cat"), // 'a' duplicated
      ValuesIn("cat", Seq("a")),
      MeanBetween("v", 0, 1)))
    assert(results.forall(!_.passed))
    assert(results.head.observed === "row_count=4")
  }

  test("null values don't break Unique (distinct over non-null)") {
    val results = Expectations.run(df, Seq(Unique("cat")))
    assert(!results.head.passed) // a,b,a → 2 distinct vs 3 non-null
    val ok = Expectations.run(df.filter($"id" =!= 4), Seq(Unique("cat")))
    assert(ok.head.passed) // a,b vs 2 non-null
  }

  test("missing column fails that check without failing the scan") {
    val results = Expectations.run(df, Seq(
      ColumnExists("nope"), NotNull("nope"), RowCountEquals(4)))
    assert(results.map(_.passed) === Seq(false, false, true))
  }

  test("validate raises with the failed subset (GE checkpoint gate)") {
    val ex = intercept[Expectations.ValidationException] {
      Expectations.validate(df, Seq(RowCountEquals(4), Unique("cat")))
    }
    assert(ex.failures.length === 1)
    Expectations.validate(df, Seq(RowCountEquals(4))) // no raise
  }

  test("empty table and all-null columns fail gracefully, not with NPE") {
    val empty = df.filter($"id" < 0)
    val results = Expectations.run(empty, Seq(
      RowCountEquals(4), NotNull("cat"), Unique("id"), MeanBetween("v", 0, 100)))
    assert(results.map(_.passed) === Seq(false, true, true, false))

    val allNull = df.withColumn("v", org.apache.spark.sql.functions.lit(null).cast("double"))
    val r2 = Expectations.run(allNull, Seq(
      MinBetween("v", 0, 100), MaxBetween("v", 0, 100), MeanBetween("v", 0, 100)))
    assert(r2.forall(!_.passed))
  }

  test("GE-suite shape over a real fixture (lineitem contract)") {
    val li = Tables.lineitem(spark, sf)
    val results = Expectations.validate(li, Seq(
      RowCountBetween(1000, 10000000),
      NotNull("l_orderkey"),
      NotNull("l_quantity"),
      ValuesIn("l_returnflag", Seq("A", "N", "R")),
      ValuesIn("l_linestatus", Seq("O", "F")),
      MinBetween("l_discount", 0.0, 0.01),
      MaxBetween("l_discount", 0.05, 0.2),
      MeanBetween("l_quantity", 1, 60)))
    assert(results.forall(_.passed))
  }
}
