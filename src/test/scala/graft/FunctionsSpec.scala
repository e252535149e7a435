package graft

import org.apache.spark.sql.functions._
import graft.functions.{Coercions, Decodes}

/** Coercion + decode expression semantics (SURVEY §2.3), incl. the
  * reference's quirky digit-guard (`dags/hanger_lane.py:380-433`).
  */
class CoercionsSpec extends SparkSpec {
  import spark.implicits._

  test("digitGuardInt: digits parse; signs, decimals, garbage, null → default") {
    val df = Seq("12", "-5", "3.2", "abc", "", null).toDF("x")
      .select(Coercions.digitGuardInt(col("x")).as("v"))
    assert(df.as[Int].collect().toSeq === Seq(12, 0, 0, 0, 0, 0))
  }

  test("floatOrDefault: `float(x) or default` — null, garbage AND 0.0 → default") {
    val df = Seq("1.5", "0.0", "x", null).toDF("x")
      .select(Coercions.floatOrDefault(col("x"), -1.0).as("v"))
    assert(df.as[Double].collect().toSeq === Seq(1.5, -1.0, -1.0, -1.0))
  }

  test("strOrNull: empty string → null") {
    val df = Seq("a", "", null).toDF("x").select(Coercions.strOrNull(col("x")).as("v"))
    assert(df.as[Option[String]].collect().toSeq === Seq(Some("a"), None, None))
  }

  test("boolOrFalse") {
    val df = Seq(Some(true), Some(false), None).toDF("x")
      .select(Coercions.boolOrFalse(col("x")).as("v"))
    assert(df.as[Boolean].collect().toSeq === Seq(true, false, false))
  }

  test("floatThenInt truncates like astype(float).astype(int)") {
    val df = Seq("3.9", "-2.7").toDF("x").select(Coercions.floatThenInt(col("x")).as("v"))
    assert(df.as[Int].collect().toSeq === Seq(3, -2))
  }
}

class DecodesSpec extends SparkSpec {
  import spark.implicits._

  test("twoWay: shift decode (F1)") {
    val df = Seq(1, 2, 3).toDF("shift")
      .select(Decodes.twoWay(col("shift"), 1, "Day", "Night").as("v"))
    assert(df.as[String].collect().toSeq === Seq("Day", "Night", "Night"))
  }

  test("remap with pass-through fallback (F2)") {
    val m = Seq("Loading/Panel Segregation" -> "Loading", "Pressing" -> "Un-Loading")
    val df = Seq("Pressing", "Sewing").toDF("oc")
      .select(Decodes.remap(col("oc"), m, None).as("v"))
    assert(df.as[String].collect().toSeq === Seq("Un-Loading", "Sewing"))
  }

  test("remap with constant fallback (F5)") {
    val df = Seq("OE", "??").toDF("atp")
      .select(Decodes.remap(col("atp"), Seq("OE" -> "Owner Equity"), Some("N/A")).as("v"))
    assert(df.as[String].collect().toSeq === Seq("Owner Equity", "N/A"))
  }

  test("measureIf splits a measure by condition (F3)") {
    val df = Seq(("Loading", 5), ("Other", 7)).toDF("oc", "qty")
      .select(Decodes.measureIf(col("oc") === "Loading", col("qty")).as("v"))
    assert(df.as[Int].collect().toSeq === Seq(5, 0))
  }

  test("prefixClass: LEFT(id,2) classification (F4)") {
    val classes = Seq(Seq("50", "55") -> "Asset", Seq("60") -> "Liability")
    val df = Seq("5012", "6001", "9999").toDF("id")
      .select(Decodes.prefixClass(col("id"), 2, classes, "Other").as("v"))
    assert(df.as[String].collect().toSeq === Seq("Asset", "Liability", "Other"))
  }

  test("sign split into debit/credit (F6)") {
    val df = Seq(10.0, -4.0, 0.0).toDF("amt").select(
      Decodes.debitOf(col("amt")).as("d"), Decodes.creditOf(col("amt")).as("c"))
    assert(df.as[(Double, Double)].collect().toSeq
      === Seq((10.0, 0.0), (0.0, 4.0), (0.0, 0.0)))
  }

  test("safeDiv guards zero/null denominators (F9)") {
    val df = Seq((1.0, 4.0), (1.0, 0.0)).toDF("n", "d")
      .select(Decodes.safeDiv(col("n"), col("d")).as("v"))
    assert(df.as[Option[Double]].collect().toSeq === Seq(Some(0.25), None))
  }
}
