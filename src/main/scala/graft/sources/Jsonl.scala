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

  /** [[writeShards]] with a BYTE budget instead of a fixed shard count —
    * the contract real exporters publish ("shards of ~1 GB"): rows lay out
    * in the deterministic mix2 order, the running serialized size
    * (octet_length of the JSON line + newline — BYTES, not chars)
    * accumulates via the bucketed cumsum (no single-partition window), and
    * a row lands in cut `floor(prefix_bytes / maxBytesPerShard)` — so
    * every shard holds ≤ maxBytesPerShard + one row of spill and the same
    * data always cuts at the same byte boundaries. Raw cut indices can
    * skip numbers when one row alone exceeds the budget (its prefix jumps
    * more than a full budget), so cut ids are DENSIFIED — dense-ranked over
    * the distinct cut values, a frame bounded by totalBytes/maxBytesPerShard
    * (not by rows), broadcast back — and shards number contiguously from 0.
    * Manifest bytes come from the LANDED FILES' sizes via the Hadoop
    * FileSystem API (the filesystem is the truth for a byte contract, and
    * the API keeps the scan correct on HDFS/object stores, not just
    * file://), rows from reading them back. */
  def writeShardsByBytes(df: DataFrame, dir: String, idCol: Column,
                         maxBytesPerShard: Long): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rowJson = to_json(struct(df.columns.map(col): _*))
    val sized = df.withColumn("__bytes", (octet_length(rowJson) + 1).cast("long"))
    val cum = Packing.bucketedCumSum(sized,
      orderCol = Packing.mix2(idCol), bucket = Packing.mix2(idCol) / lit(2097152L),
      measure = col("__bytes"), alias = "__cum", tieBreak = Seq(idCol))
    val cut = cum.withColumn("__raw",
      ((col("__cum") - col("__bytes")) / lit(maxBytesPerShard)).cast("long"))
    // densify: distinct raw cuts form a shard-count-sized frame (bounded by
    // totalBytes/maxBytesPerShard, NOT by input rows), so the unpartitioned
    // row_number window is safe; broadcast the tiny id map back
    val ids = cut.select(col("__raw")).distinct()
      .withColumn("shard",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__raw"))).cast("long") - 1L)
    cut.join(broadcast(ids), "__raw")
      .repartition(col("shard"))
      .sortWithinPartitions("shard", "__cum")
      .drop("__bytes", "__cum", "__raw")
      .write.mode(SaveMode.Overwrite).partitionBy("shard").json(dir)
    val rows = read(spark, dir).groupBy("shard").agg(count(lit(1)).as("n_rows"))
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("shard=")).toSeq
      .map { d =>
        val n = d.getPath.getName.stripPrefix("shard=").toLong
        val sz = fs.listStatus(d.getPath)
          .filter(_.getPath.getName.endsWith(".json")).map(_.getLen).sum
        (n, sz)
      }.toDF("shard", "n_bytes")
    val manifest = rows.join(bytes, "shard")
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
