package graft

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.operators.Merge

/** Partition-pruned merge: only partitions containing updated keys are
  * rewritten; untouched partition files stay byte-identical on disk.
  */
class PartitionedMergeSpec extends SparkSpec {
  import spark.implicits._

  private def partFiles(dir: String): Map[String, Set[(String, Long)]] =
    new File(dir).listFiles().filter(_.getName.startsWith("day="))
      .map(p => p.getName -> p.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.lastModified())).toSet)
      .toMap

  test("upsertPartitioned rewrites only touched partitions; result equals full merge") {
    val dir = Files.createTempDirectory("pmerge").toString + "/target"
    val base = Seq(
      (1, "2024-01-01", 10), (2, "2024-01-01", 20),
      (3, "2024-01-02", 30), (4, "2024-01-03", 40)
    ).toDF("k", "day", "v")
    Merge.upsertPartitioned(spark, dir, base, Seq("k"), "day")

    val before = partFiles(dir)
    assert(before.keySet === Set("day=2024-01-01", "day=2024-01-02", "day=2024-01-03"))
    Thread.sleep(1100) // mtime granularity

    // update one key on day 1, insert one key on day 1 — days 2/3 untouched
    val updates = Seq((2, "2024-01-01", 99), (9, "2024-01-01", 90)).toDF("k", "day", "v")
    Merge.upsertPartitioned(spark, dir, updates, Seq("k"), "day")

    val after = partFiles(dir)
    assert(after("day=2024-01-02") === before("day=2024-01-02"),
      "untouched partition must keep identical files")
    assert(after("day=2024-01-03") === before("day=2024-01-03"))
    assert(after("day=2024-01-01") !== before("day=2024-01-01"))

    val got = spark.read.parquet(dir).select("k", "day", "v")
      .as[(Int, String, Int)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1, "2024-01-01", 10), (2, "2024-01-01", 99),
      (3, "2024-01-02", 30), (4, "2024-01-03", 40), (9, "2024-01-01", 90)))
  }

  test("null-partition rows survive a null-partition upsert") {
    val dir = Files.createTempDirectory("pmerge3").toString + "/t"
    val base = Seq((1, Option.empty[String], 10), (2, None, 20), (3, Some("2024-01-01"), 30))
      .toDF("k", "day", "v")
    Merge.upsertPartitioned(spark, dir, base, Seq("k"), "day")
    val updates = Seq((1, Option.empty[String], 99)).toDF("k", "day", "v")
    Merge.upsertPartitioned(spark, dir, updates, Seq("k"), "day")
    val got = spark.read.parquet(dir).select("k", "v").as[(Int, Int)]
      .collect().sortBy(_._1)
    // k=2 (untouched null-partition row) must survive the swap
    assert(got.toSeq === Seq((1, 99), (2, 20), (3, 30)))
  }

  test("first write bootstraps the partitioned snapshot") {
    val dir = Files.createTempDirectory("pmerge2").toString + "/t"
    val df = Seq((1, "2024-02-01", 1)).toDF("k", "day", "v")
    Merge.upsertPartitioned(spark, dir, df, Seq("k"), "day")
    assert(spark.read.parquet(dir).count() === 1)
  }

  test("first load dedups keys like every later load (idempotent across the bootstrap)") {
    val dir = Files.createTempDirectory("pmerge3").toString + "/t"
    // duplicate key in the very first batch: written verbatim it would
    // key-duplicate the snapshot and make a re-run non-idempotent
    val batch = Seq((1, "2024-02-01", 10), (1, "2024-02-01", 11), (2, "2024-02-01", 20))
      .toDF("k", "day", "v")
    Merge.upsertPartitioned(spark, dir, batch, Seq("k"), "day")
    val first = spark.read.parquet(dir).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(first.length === 2)
    Merge.upsertPartitioned(spark, dir, batch, Seq("k"), "day")
    val again = spark.read.parquet(dir).collect().map(_.toSeq).sortBy(_.head.toString)
    assert(again.length === 2)
  }
}
