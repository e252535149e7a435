package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.Scd2

/** SCD2 semantics (SURVEY §2.8 U9; dlt `strategy: "scd2"`,
  * `dltproject/sql_product_scd.py:26-31`).
  */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("fromHistory compresses consecutive identical states into intervals") {
    val hist = Seq(
      (1, "red", ts("2024-01-01 00:00:00")),
      (1, "red", ts("2024-02-01 00:00:00")),   // no attribute change → collapsed
      (1, "blue", ts("2024-03-01 00:00:00")),
      (2, "green", ts("2024-01-15 00:00:00"))
    ).toDF("id", "colour", "ts")

    val dim = Scd2.fromHistory(hist, Seq("id"), Seq("colour"), "ts")
      .orderBy("id", "valid_from")
      .select("id", "colour", "valid_from", "valid_to", "is_current")
      .collect()

    assert(dim.length === 3)
    val r0 = dim(0)
    assert(r0.getInt(0) === 1 && r0.getString(1) === "red"
      && r0.getTimestamp(3) === ts("2024-03-01 00:00:00") && !r0.getBoolean(4))
    val r1 = dim(1)
    assert(r1.getString(1) === "blue" && r1.getTimestamp(3) == null && r1.getBoolean(4))
    val r2 = dim(2)
    assert(r2.getInt(0) === 2 && r2.getBoolean(4))
  }

  test("merge closes changed versions, appends new ones, passes unchanged through") {
    val dim = Seq(
      (1, "red", ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp], true),
      (2, "green", ts("2024-01-15 00:00:00"), null.asInstanceOf[Timestamp], true),
      (1, "pink", ts("2023-06-01 00:00:00"), ts("2024-01-01 00:00:00"), false)
    ).toDF("id", "colour", "valid_from", "valid_to", "is_current")

    val incoming = Seq((1, "blue"), (2, "green"), (3, "white")).toDF("id", "colour")
    val eff = lit(ts("2024-05-01 00:00:00"))

    val out = Scd2.merge(dim, incoming, Seq("id"), Seq("colour"), eff)
    // id=1: historical pink + closed red + open blue; id=2 unchanged; id=3 new
    assert(out.count() === 5)
    val closed = out.filter($"id" === 1 && $"colour" === "red").head()
    assert(closed.getAs[Timestamp]("valid_to") === ts("2024-05-01 00:00:00")
      && !closed.getAs[Boolean]("is_current"))
    val opened = out.filter($"id" === 1 && $"colour" === "blue").head()
    assert(opened.getAs[Boolean]("is_current")
      && opened.getAs[Timestamp]("valid_from") === ts("2024-05-01 00:00:00"))
    val unchanged = out.filter($"id" === 2).head()
    assert(unchanged.getAs[Boolean]("is_current")
      && unchanged.getAs[Timestamp]("valid_from") === ts("2024-01-15 00:00:00"))
    val fresh = out.filter($"id" === 3).head()
    assert(fresh.getAs[Boolean]("is_current"))
    // exactly one current row per key
    assert(out.filter($"is_current").groupBy("id").count()
      .filter($"count" > 1).isEmpty)
  }

  test("retireMissing=true closes keys absent from the load (dlt full-snapshot semantics)") {
    val dim = Seq(
      (1, "red", ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp], true),
      (2, "green", ts("2024-01-15 00:00:00"), null.asInstanceOf[Timestamp], true)
    ).toDF("id", "colour", "valid_from", "valid_to", "is_current")
    val incoming = Seq((1, "red")).toDF("id", "colour") // id=2 gone upstream

    val retired = Scd2.merge(dim, incoming, Seq("id"), Seq("colour"),
      lit(ts("2024-05-01 00:00:00")), retireMissing = true)
    val r2 = retired.filter($"id" === 2).head()
    assert(!r2.getAs[Boolean]("is_current")
      && r2.getAs[Timestamp]("valid_to") === ts("2024-05-01 00:00:00"))
    assert(retired.filter($"id" === 1).head().getAs[Boolean]("is_current"))

    // incremental semantics: absence is not deletion
    val kept = Scd2.merge(dim, incoming, Seq("id"), Seq("colour"),
      lit(ts("2024-05-01 00:00:00")))
    assert(kept.filter($"id" === 2).head().getAs[Boolean]("is_current"))
  }

  test("merge is a no-op when incoming equals current state") {
    val dim = Seq((1, "red", ts("2024-01-01 00:00:00"), null.asInstanceOf[Timestamp], true))
      .toDF("id", "colour", "valid_from", "valid_to", "is_current")
    val out = Scd2.merge(dim, Seq((1, "red")).toDF("id", "colour"),
      Seq("id"), Seq("colour"), lit(ts("2024-05-01 00:00:00")))
    assert(out.exceptAll(dim).isEmpty && dim.exceptAll(out).isEmpty)
  }
}
