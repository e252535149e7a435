package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal
import graft.sources.WebDataset

/** WebDataset tar shard export: the container contract a multimodal
  * training loader depends on — byte-exact payload round trips, sample
  * members adjacent within a shard, byte budget honored, and re-exports
  * byte-identical (shard-level caching / rsync delta pushes). */
class WebDatasetSpec extends SparkSpec {
  import spark.implicits._

  private val bmpUdf = udf((id: Long) => Multimodal.syntheticBmpGray8(id, 8, 8))

  private def media = Tables.documents(spark, sf)
    .filter(col("doc_id") < 60)
    .select(col("doc_id"), col("text"),
      bmpUdf(col("doc_id")).as("img"),
      encode(col("text"), "UTF-8").as("txt"))

  private def export(dirName: String): (String, org.apache.spark.sql.DataFrame) = {
    val dir = java.nio.file.Files.createTempDirectory(dirName).toString
    val manifest = WebDataset.writeShards(media, dir, col("doc_id"),
      Seq("bmp" -> col("img"), "txt" -> col("txt")),
      maxBytesPerShard = 8192L)
    (dir, manifest)
  }

  test("null payload lands as a zero-byte member (no NPE, cumsum stays exact)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_wds_null").toString
    val withNulls = media.withColumn("txt",
      when(col("doc_id") % 3 === 0, lit(null).cast("binary"))
        .otherwise(col("txt")))
    WebDataset.writeShards(withNulls, dir, col("doc_id"),
      Seq("bmp" -> col("img"), "txt" -> col("txt")),
      maxBytesPerShard = 8192L)
    val back = WebDataset.read(spark, dir)
      .select("key", "ext", "content")
      .as[(String, String, Array[Byte])].collect()
    assert(back.count(_._2 == "txt") === 60)
    back.filter(r => r._1.toLong % 3 == 0 && r._2 == "txt")
      .foreach(r => assert(r._3.isEmpty, s"null payload must land 0-byte: ${r._1}"))
    back.filter(r => r._1.toLong % 3 != 0 && r._2 == "txt")
      .foreach(r => assert(r._3.nonEmpty))
  }

  test("tarHeader rejects members past the ustar 11-digit octal size field") {
    intercept[IllegalArgumentException] {
      WebDataset.tarHeader("big.bin", 8589934592L)
    }
    WebDataset.tarHeader("ok.bin", 8589934591L) // boundary fits
  }

  test("payloads round-trip byte-exact; every sample lands once") {
    val (dir, manifest) = export("graft_wds")
    val back = WebDataset.read(spark, dir)
      .select("key", "ext", "content")
      .as[(String, String, Array[Byte])].collect()
    val byKey = back.groupBy(_._1)
    assert(byKey.size === 60)
    val texts = Tables.documents(spark, sf).filter(col("doc_id") < 60)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    byKey.foreach { case (key, members) =>
      val id = key.toLong
      val m = members.map(r => r._2 -> r._3).toMap
      assert(m.keySet === Set("bmp", "txt"))
      assert(java.util.Arrays.equals(m("bmp"), Multimodal.syntheticBmpGray8(id, 8, 8)),
        s"bmp payload corrupted for $key")
      assert(new String(m("txt"), "UTF-8") === texts(id),
        s"txt payload corrupted for $key")
    }
    // the manifest counts what landed
    val total = manifest.agg(sum("n_samples")).as[Long].collect().head
    assert(total === 60L)
  }

  test("members of one sample sit adjacently inside the shard tar") {
    val (dir, _) = export("graft_wds_adj")
    val shard0 = java.nio.file.Paths.get(dir).toFile.listFiles()
      .filter(_.getName.endsWith(".tar")).minBy(_.getName)
    val names = WebDataset.parseTar(
      java.nio.file.Files.readAllBytes(shard0.toPath)).map(_._1)
    assert(names.nonEmpty && names.length % 2 === 0)
    names.grouped(2).foreach { case Seq(a, b) =>
      assert(a.stripSuffix(".bmp") === b.stripSuffix(".txt"),
        s"sample members not adjacent: $a / $b")
    }
  }

  test("byte budget: every shard stays within max + one sample of spill") {
    val (_, manifest) = export("graft_wds_budget")
    val sizes = manifest.select("n_bytes").as[Long].collect()
    assert(sizes.length > 1, "budget should force multiple shards")
    // worst case: budget + the sample that crossed the line + terminator
    val maxSample = 2 * 512 + 1536 + 1024 + 1024 // two headers + padded payloads
    sizes.foreach(s => assert(s <= 8192L + maxSample + 1024L, s"shard too big: $s"))
  }

  test("re-export of the same data is byte-identical per shard") {
    val (d1, _) = export("graft_wds_a")
    val (d2, _) = export("graft_wds_b")
    def digests(d: String): Map[String, String] =
      java.nio.file.Paths.get(d).toFile.listFiles()
        .filter(_.getName.endsWith(".tar"))
        .map { f =>
          val md = java.security.MessageDigest.getInstance("MD5")
            .digest(java.nio.file.Files.readAllBytes(f.toPath))
          f.getName -> md.map("%02x".format(_)).mkString
        }.toMap
    assert(digests(d1) === digests(d2))
  }
}
