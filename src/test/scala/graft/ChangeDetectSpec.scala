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
}
