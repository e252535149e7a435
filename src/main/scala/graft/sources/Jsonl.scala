package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Packing

/** Sharded JSONL corpus export — the interchange format training pipelines
  * actually consume (one JSON object per line, fixed shard count, a
  * manifest): the modern twin of the reference's CSV landing step
  * (`scripts/test/transform.py:31-44` writes delimited extracts; a corpus
  * exporter writes JSONL shards).
  *
  * Deterministic by construction: shard membership comes from
  * [[Packing.shardAssign]] (the engine-portable LCG — re-runs and engine
  * twins produce the same member sets), and line order within a shard is
  * the assignment's `pos` order, imposed by a sortWithinPartitions on the
  * SAME shuffle that co-locates each shard — so a re-export of the same
  * data is byte-identical, which is what makes shard-level caching and
  * resume-from-shard work downstream.
  */
object Jsonl {

  /** Write `df` as `numShards` JSONL shards under `dir` (one
    * `shard=N/part-*.json` file per shard — each shard lands in exactly one
    * task), then read the result BACK to build and persist the manifest at
    * `dir/_manifest` (underscore-prefixed: invisible to Spark readers of
    * `dir`). Returns the manifest (shard, n_rows). Counting what actually
    * landed — not what was about to be written — makes the manifest an
    * end-to-end write verification, not an intention. */
  def writeShards(df: DataFrame, dir: String, idCol: Column,
                  numShards: Int): DataFrame = {
    val spark = df.sparkSession
    Packing.shardAssign(df, idCol, numShards)
      .repartition(numShards, col("shard"))
      .sortWithinPartitions("shard", "pos")
      .drop("pos")
      .write.mode(SaveMode.Overwrite).partitionBy("shard").json(dir)
    val manifest = read(spark, dir)
      .groupBy("shard").agg(count(lit(1)).as("n_rows"))
    manifest.coalesce(1)
      .write.mode(SaveMode.Overwrite).json(s"$dir/_manifest")
    manifest
  }

  /** Read a [[writeShards]] layout (shard partition column included). */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(dir)

  /** The persisted manifest of a [[writeShards]] layout. */
  def manifest(spark: SparkSession, dir: String): DataFrame =
    spark.read.json(s"$dir/_manifest")
}
