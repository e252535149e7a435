package graft

import org.apache.spark.sql.functions._
import graft.operators.Merge

/** Upsert semantics (SURVEY §2.8 U4-U8): the PG `ON CONFLICT DO UPDATE`
  * equivalences the reference relies on (`dags/upsert_utils.py:44-89`).
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def tgt = Seq((1, "a", 10), (2, "b", 20), (3, "c", 30))
    .toDF("k", "name", "v")

  test("upsert updates matching keys and inserts new ones") {
    val updates = Seq((2, "b2", 21), (4, "d", 40)).toDF("k", "name", "v")
    val out = Merge.upsert(tgt, updates, Seq("k"))
      .orderBy("k").as[(Int, String, Int)].collect()
    assert(out.toSeq === Seq((1, "a", 10), (2, "b2", 21), (3, "c", 30), (4, "d", 40)))
  }

  test("upsert is idempotent: re-merging the same batch is a no-op") {
    val updates = Seq((2, "b2", 21), (4, "d", 40)).toDF("k", "name", "v")
    val once = Merge.upsert(tgt, updates, Seq("k"))
    val twice = Merge.upsert(once, updates, Seq("k"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("conflicting rows within the batch resolve last-write-wins by order column") {
    val updates = Seq((2, "old", 98, 1), (2, "new", 99, 2)).toDF("k", "name", "v", "seq")
    val out = Merge.upsert(tgt, updates.select("k", "name", "v"),
      Seq("k"), lastWriteOrder = None) // dropDuplicates path: just key-unique
    assert(out.filter($"k" === 2).count() === 1)

    val ordered = Merge.upsert(tgt.withColumn("seq", lit(0)), updates, Seq("k"),
      lastWriteOrder = Some(col("seq")))
    val row = ordered.filter($"k" === 2).select("name", "v").as[(String, Int)].head()
    assert(row === ("new", 99))
  }

  test("output is key-unique when inputs are key-unique") {
    val updates = Seq((1, "a2", 11), (9, "z", 90)).toDF("k", "name", "v")
    val out = Merge.upsert(tgt, updates, Seq("k"))
    assert(out.groupBy("k").count().filter($"count" > 1).isEmpty)
  }

  test("null merge keys match null-safely (idempotent, no duplication)") {
    val t = Seq((Some(1), "a", 10), (None, "nullkey", 20)).toDF("k", "name", "v")
    val u = Seq((Option.empty[Int], "nullkey2", 21)).toDF("k", "name", "v")
    val once = Merge.upsert(t, u, Seq("k"))
    assert(once.count() === 2)
    assert(once.filter($"k".isNull).select("name").as[String].head() === "nullkey2")
    val twice = Merge.upsert(once, u, Seq("k"))
    assert(twice.count() === 2)
  }

  test("append keeps all rows (insert-only branch)") {
    val ins = Seq((4, "d", 40)).toDF("k", "name", "v")
    assert(Merge.append(tgt, ins).count() === 4)
  }
}
