package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc microbench for the webdataset scan path (optimization round
  * diagnostics): writes a synthetic shard dir, then times (a) the DSv2
  * content scan, (b) a raw java.io tar walk of the same files, (c) the
  * decode+hash kernel over (a). Prints one line per measurement. */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.Bench.scratchDir())
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory(
      java.nio.file.Paths.get(graft.Bench.scratchDir()), "scanbench_").toString
    val media = spark.range(5000).select(col("id")).as[Long]
      .mapPartitions(_.map { id =>
        (id, graft.operators.Multimodal.syntheticBmpGray8(id % 37, 8, 8))
      }).toDF("doc_id", "bmp")
    graft.sources.WebDataset.writeShards(media, dir, col("doc_id"),
      Seq("bmp" -> col("bmp")), maxBytesPerShard = 65536L)
    def time[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SCANBENCH $tag: ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { i =>
      time(s"dsv2-content-$i") {
        spark.read.format("graft-webdataset").load(dir)
          .select(col("key"), col("content"))
          .agg(sum(octet_length(col("content")))).collect()
      }
      time(s"raw-tar-walk-$i") {
        val files = new java.io.File(dir).listFiles()
          .filter(_.getName.endsWith(".tar"))
        var total = 0L
        files.foreach { f =>
          val in = new java.io.BufferedInputStream(
            new java.io.FileInputStream(f))
          val header = new Array[Byte](512)
          var done = false
          while (!done) {
            val n = in.readNBytes(header, 0, 512)
            if (n < 512 || header(0) == 0) done = true
            else {
              val size = java.lang.Long.parseLong(
                new String(header, 124, 11, "US-ASCII").trim, 8)
              val padded = ((size + 511) / 512 * 512).toInt
              val buf = in.readNBytes(padded)
              total += size
            }
          }
          in.close()
        }
        total
      }
      time(s"dsv2-decode-hash-$i") {
        spark.read.format("graft-webdataset").load(dir)
          .select(col("key").cast("long").as("doc_id"), col("content"))
          .as[(Long, Array[Byte])]
          .mapPartitions(_.map { case (id, bytes) =>
            val (_, _, px) = graft.operators.Multimodal.decodeBmpGray8(bytes)
            val (hi, lo) = graft.operators.Multimodal.aHash64(px)
            (id, hi, lo)
          }).toDF("doc_id", "hi", "lo").count()
      }
    }
    spark.stop()
  }
}
