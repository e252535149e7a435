package graft

import graft.etl.ChangeDetect

/** Change detection (SURVEY §2.8 U3 + §2.2 P11/P12;
  * `ETL Incremental Load….ipynb` cells 18-20).
  */
class ChangeDetectSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30)).toDF("k", "s", "v")
  // 1 unchanged, 2 modified, 4 inserted, 3 deleted upstream (ignored)
  private def source = Seq((1, "a", 10), (2, "b", 99), (4, "d", 40)).toDF("k", "s", "v")

  test("split: changed = source \\ target; modified/inserted partition by key") {
    val cs = ChangeDetect.split(source, target, Seq("k"))
    assert(cs.changed.as[(Int, String, Int)].collect().toSet
      === Set((2, "b", 99), (4, "d", 40)))
    assert(cs.modified.as[(Int, String, Int)].collect().toSet === Set((2, "b", 99)))
    assert(cs.inserted.as[(Int, String, Int)].collect().toSet === Set((4, "d", 40)))
  }

  test("partition property: modified ∪ inserted == changed (multiset)") {
    val cs = ChangeDetect.split(source, target, Seq("k"))
    val union = cs.modified.unionByName(cs.inserted)
    assert(union.exceptAll(cs.changed).isEmpty && cs.changed.exceptAll(union).isEmpty)
  }

  test("null-safe equality: rows with equal nulls are NOT changes (documented drift from pandas)") {
    val t = Seq((1, null.asInstanceOf[String], 10)).toDF("k", "s", "v")
    val s = Seq((1, null.asInstanceOf[String], 10)).toDF("k", "s", "v")
    assert(ChangeDetect.split(s, t, Seq("k")).changed.isEmpty)
  }

  test("tagged labels rows modified/inserted") {
    val tags = ChangeDetect.tagged(source, target, Seq("k"))
      .select("k", "change_type").as[(Int, String)].collect().toSet
    assert(tags === Set((2, "modified"), (4, "inserted")))
  }

  test("SchemaAlign: kept/retyped/null_filled/dropped, case-insensitive match, report complete") {
    import org.apache.spark.sql.types._
    val drifted = Seq(("7", 1.5, "x")).toDF("K", "v", "extra")
    val target = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("missing", StringType)))
    val r = graft.etl.SchemaAlign.align(drifted, target)
    assert(r.data.columns.toSeq === Seq("k", "v", "missing"))
    assert(r.data.schema.map(_.dataType) === Seq(LongType, DoubleType, StringType))
    assert(r.data.as[(Long, Double, Option[String])].collect().toSeq ===
      Seq((7L, 1.5, None)))
    val rep = r.report.as[(String, String, Option[String], Option[String])]
      .collect().map(t => t._1 -> t._2).toMap
    assert(rep === Map("k" -> "retyped", "v" -> "kept",
      "missing" -> "null_filled", "extra" -> "dropped"))
    // ambiguous source casing must refuse, not bind arbitrarily
    val dup = Seq((1, 2)).toDF("a", "A")
    intercept[IllegalArgumentException] {
      graft.etl.SchemaAlign.align(dup, StructType(Seq(StructField("a", IntegerType))))
    }
    // ...and so must an ambiguous TARGET (two fields binding one source col)
    intercept[IllegalArgumentException] {
      graft.etl.SchemaAlign.align(Seq(1).toDF("a"), StructType(Seq(
        StructField("a", IntegerType), StructField("A", StringType))))
    }
  }

  test("forget returns the CLEANED tables (an audit alone deletes nothing) and both agree") {
    val subjects = Seq(1, 3).toDF("id")
    val orders = Seq((1, "a"), (2, "b"), (3, "c"), (3, "d")).toDF("cust", "o")
    val events = Seq((2, "x"), (5, "y")).toDF("user", "e")
    val r = ChangeDetect.forget(subjects, "id",
      Seq(("orders", orders, "cust"), ("events", events, "user")))
    // cleaned plans actually shed the subjects' rows
    assert(r.cleaned("orders").select("cust").as[Int].collect().sorted.toSeq === Seq(2))
    assert(r.cleaned("events").count() === 2)
    // audit counts match what the cleaned tables show
    val audit = r.audit.orderBy("table_name")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(audit === Seq(("events", 2L, 2L, 0L), ("orders", 4L, 1L, 3L)))
  }
}
