package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-by-phase timing of q167's body (optimization diagnostics). */
object Q167Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Bench.scratchDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import graft.operators.Multimodal
    import graft.sources.WebDataset
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"Q167BENCH $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 2).foreach { round =>
      val raw = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(graft.Bench.scratchDir()), "q167raw_").toString
      val dedup = java.nio.file.Files.createTempDirectory(
        java.nio.file.Paths.get(graft.Bench.scratchDir()), "q167dd_").toString
      val media = graft.Tables.documents(spark, sfDir).select(col("doc_id")).as[Long]
        .mapPartitions(_.map { id =>
          val seed = if (id % 3 != 0 && id % 7 == 3) 100000L + id else id % 37
          (id, Multimodal.syntheticBmpGray8(seed, 8, 8))
        }).toDF("doc_id", "bmp")
      time(s"r$round-writeShards-raw") {
        WebDataset.writeShards(media, raw, col("doc_id"),
          Seq("bmp" -> col("bmp")), maxBytesPerShard = 65536L)
      }
      def containerBytes = spark.read.format("graft-webdataset").load(raw)
        .select(col("key").cast("long").as("doc_id"), col("content"))
      val hashed = time(s"r$round-decode-hash-lcp") {
        containerBytes.as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            val (_, _, px) = Multimodal.decodeBmpGray8(bytes)
            val (hi, lo) = Multimodal.aHash64(px)
            (id, hi, lo)
          }).toDF("doc_id", "hi", "lo").localCheckpoint()
      }
      val seen = hashed.filter(col("doc_id") % 3 === 0)
      val batch = hashed.filter(col("doc_id") % 3 =!= 0)
      val idx = time(s"r$round-buildMediaIndex") {
        Multimodal.buildMediaIndex(seen, "doc_id", "hi", "lo", 32, 32, "img")
      }
      val dupIds = time(s"r$round-incrementalPairs") {
        Multimodal.mediaIncrementalPairs(batch, idx, "doc_id",
            "hi", "lo", 32, 32, "img", maxHamming = 1)
          .select(col("batch_id").as("doc_id")).distinct().localCheckpoint()
      }
      val keepIds = seen.select("doc_id").unionByName(
        batch.select("doc_id").join(dupIds, Seq("doc_id"), "left_anti"))
      // breakdown of writeShards internals: placement DAG vs tar IO
      time(s"r$round-placement-only") {
        import graft.operators.Packing
        val sel = media.select(col("doc_id").cast("long").as("__id"),
          col("doc_id").cast("string").as("__key"),
          coalesce(col("bmp").cast("binary"), lit(Array.emptyByteArray)).as("__p0"))
        val sized = sel.withColumn("__bytes",
          lit(512L) + (((octet_length(col("__p0")).cast("long") + 511L) / 512L) * 512L))
        val cum = Packing.bucketedCumSum(sized,
          orderCol = Packing.mix2(col("__id")),
          bucket = Packing.mix2(col("__id")) / lit(2097152L),
          measure = col("__bytes"), alias = "__cum", tieBreak = Seq(col("__id")))
        val cut = cum.withColumn("__raw",
          ((col("__cum") - col("__bytes")) / lit(65536L)).cast("long"))
        val ids = cut.select(col("__raw")).distinct()
          .withColumn("shard",
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("__raw"))).cast("long") - 1L)
        cut.join(broadcast(ids), "__raw")
          .repartition(col("shard"))
          .sortWithinPartitions(col("shard"), col("__cum"))
          .write.format("noop").mode("overwrite").save()
      }
      time(s"r$round-survivor-reexport") {
        val survivors = containerBytes.join(keepIds, Seq("doc_id"))
        WebDataset.writeShards(survivors, dedup, col("doc_id"),
            Seq("bmp" -> col("content")), maxBytesPerShard = 65536L)
          .select(col("shard").cast("long").as("shard"),
            col("n_samples").cast("long").as("n_samples"),
            col("n_bytes").cast("long").as("n_bytes"))
          .orderBy("shard").count()
      }
    }
    spark.stop()
  }
}
