package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.etl.BatchSnapshots

/** The shared snapshot-per-batch discipline's edge contracts: a dir that
  * exists but holds no parquet footers (post-compaction, marker files
  * only) reads as the EMPTY state, never a schema-inference throw; and
  * `bid=K` snapshots are readable time travel — the state AT batch K.
  */
class BatchSnapshotsSpec extends SparkSpec {

  private def empty() = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType, nullable = false),
        StructField("v", LongType, nullable = false))))
  }

  test("latest() of a dir with zero parquet footers is the empty state") {
    val dir = Files.createTempDirectory("graft_bsnap").toString
    // dir exists, carries only a marker file and an empty bid= dir — the
    // all-partitions-compacted shape the advisor flagged
    Files.createFile(Paths.get(s"$dir/_SUCCESS"))
    Files.createDirectories(Paths.get(s"$dir/bid=3"))
    val got = BatchSnapshots.latest(spark, dir, Seq("k", "v"), empty())
    assert(got.count() == 0L)
    assert(got.columns.toSeq == Seq("k", "v"))
  }

  test("advanceAndLand is replay-idempotent and bid=K reads are the state after batch K") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_bsnap2").toString + "/state"
    def adv(rows: Seq[(Long, Long)])(prior: org.apache.spark.sql.DataFrame) =
      prior.unionByName(rows.toDF("k", "v"))
        .groupBy("k").agg(sum("v").as("v"))
    BatchSnapshots.advanceAndLand(spark, dir, 0L, Seq("k", "v"), empty())(
      adv(Seq((1L, 10L), (2L, 5L))))
    BatchSnapshots.advanceAndLand(spark, dir, 1L, Seq("k", "v"), empty())(
      adv(Seq((1L, 1L))))
    BatchSnapshots.advanceAndLand(spark, dir, 2L, Seq("k", "v"), empty())(
      adv(Seq((2L, 2L))))
    def stateAt(bid: Long): Map[Long, Long] =
      BatchSnapshots.latest(spark, dir, Seq("k", "v"), empty(),
          belowBid = Some(bid + 1))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // time travel: mid-stream reads equal the state after that batch
    assert(stateAt(0L) == Map(1L -> 10L, 2L -> 5L))
    assert(stateAt(1L) == Map(1L -> 11L, 2L -> 5L))
    assert(stateAt(2L) == Map(1L -> 11L, 2L -> 7L))
    // at-least-once replay of batch 1 re-derives from bid=0 and rewrites
    // bid=1 identically; later snapshots are untouched
    BatchSnapshots.advanceAndLand(spark, dir, 1L, Seq("k", "v"), empty())(
      adv(Seq((1L, 1L))))
    assert(stateAt(1L) == Map(1L -> 11L, 2L -> 5L))
    assert(stateAt(2L) == Map(1L -> 11L, 2L -> 7L))
  }
}
