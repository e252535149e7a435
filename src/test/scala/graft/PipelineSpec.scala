package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.Pipeline
import graft.functions.Decodes
import graft.operators.Multimodal

/** §7.2 end-to-end slice: incremental scan → decode → rollup → merge → log,
  * twice — the second run only processes the delta, and the incremental
  * result equals the full-batch recompute.
  */
class PipelineSpec extends SparkSpec {

  private def transform(slice: DataFrame): DataFrame =
    slice
      .withColumn("event_class",
        Decodes.remap(col("event_type"),
          Seq("click" -> "engagement", "view" -> "engagement",
            "purchase" -> "conversion"), Some("other")))
      .groupBy(col("ts").cast("date").as("event_day"), col("event_class"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)").as("total_value"))

  test("incremental pipeline: bootstrap run + delta run == full recompute; no-op third run") {
    val base = Files.createTempDirectory("pipeline").toString
    val (targetDir, logDir) = (s"$base/target", s"$base/log")
    val events = Tables.events(spark, sf)
    val cutoff = "2024-01-15 00:00:00"
    val keys = Seq("event_day", "event_class")

    // run 1: only the first half of the stream exists yet
    val half1 = events.filter(col("ts") < lit(cutoff).cast("timestamp"))
    val r1 = Pipeline.runIncremental(spark, half1, "ts", transform, keys,
      targetDir, logDir, "laneA")
    assert(!r1.skipped && r1.extracted === half1.count() && r1.watermarkBefore.isEmpty)

    // run 2: full source arrives; only the delta must be extracted
    val r2 = Pipeline.runIncremental(spark, events, "ts", transform, keys,
      targetDir, logDir, "laneA")
    assert(!r2.skipped && r2.extracted === events.count() - half1.count())
    assert(r2.watermarkBefore.contains(r1.watermarkAfter.get))

    // run 3: nothing new → skip, watermark unchanged, log still written
    val r3 = Pipeline.runIncremental(spark, events, "ts", transform, keys,
      targetDir, logDir, "laneA")
    assert(r3.skipped && r3.extracted === 0)

    // incremental == full recompute? Only for keys untouched by the split
    // boundary; the day containing the cutoff is recomputed from its delta
    // only — same caveat as the reference, which re-aggregates "last day"
    // windows (`sparkProcess.py:194-195`). Compare on non-boundary days.
    val incremental = spark.read.parquet(targetDir)
      .filter(col("event_day") =!= lit("2024-01-14").cast("date"))
      .orderBy("event_day", "event_class")
    val full = transform(events)
      .filter(col("event_day") =!= lit("2024-01-14").cast("date"))
      .orderBy("event_day", "event_class")
    assert(incremental.exceptAll(full).isEmpty && full.exceptAll(incremental).isEmpty)

    // the log recorded all three runs for this source
    assert(spark.read.parquet(logDir)
      .filter(col("source_connection") === "laneA").count() === 3)
  }
}

/** Snapshot maintenance: compaction resets file counts without touching rows. */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("compact: fewer files, identical rows; clustered mode isolates keys per file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/snap"
    val rows = (1L to 4000L).map(i => (i, (i % 8).toString, i * 1.5))
    rows.toDF("id", "k", "v").repartition(16).write.parquet(dir)
    def files = new java.io.File(dir).listFiles.count(_.getName.endsWith(".parquet"))
    val before = files
    assert(before >= 8, s"fixture must be fragmented, got $before files")

    val n = graft.etl.SnapshotIO.compact(spark, dir, targetRowsPerFile = 2000L)
    assert(n === 2L && files === 2, s"expected 2 files, got $files")
    assert(spark.read.parquet(dir).as[(Long, String, Double)].collect().sorted.toSeq
      === rows.sorted.toSeq, "compaction must not change content")

    // clustered compaction: every distinct k lives in exactly ONE file, so
    // a filter on k can skip whole files via min/max stats
    graft.etl.SnapshotIO.compact(spark, dir, targetRowsPerFile = 1000L,
      byCols = Seq("k"))
    val fileOfK = spark.read.parquet(dir)
      .select(col("k"), org.apache.spark.sql.functions.input_file_name().as("f"))
      .distinct().as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(fileOfK.values.forall(_ === 1),
      s"clustered keys must not straddle files: $fileOfK")
    assert(spark.read.parquet(dir).count() === 4000L)
  }

  test("compact preserves a Hive-partitioned layout (flattening would corrupt the next partition swap)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-part").toString + "/snap"
    val rows = (1L to 1000L).map(i => (i, s"d${i % 3}"))
    rows.toDF("id", "day").repartition(8)
      .write.partitionBy("day").parquet(dir)
    graft.etl.SnapshotIO.compact(spark, dir, targetRowsPerFile = 500L)
    // layout survives: still day=* dirs, no root-level data files
    val root = new java.io.File(dir).listFiles
    assert(root.exists(f => f.isDirectory && f.getName.startsWith("day=")),
      "partition directories must survive compaction")
    assert(!root.exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "no flattened root-level files")
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000L)
    assert(back.select("day").distinct().count() === 3L)
    // and it actually COMPACTED: each ~333-row partition fits the 500-row
    // target in ONE file (the round-robin + partitionBy shape this guards
    // against wrote up to nFiles × nPartitions — file growth)
    root.filter(f => f.isDirectory && f.getName.startsWith("day=")).foreach { d =>
      val n = d.listFiles.count(_.getName.endsWith(".parquet"))
      assert(n === 1, s"${d.getName}: expected 1 compacted file, found $n")
    }
    // ...and the next partition swap still works against the compacted dir
    val delta = Seq((2000L, "d0")).toDF("id", "day")
    graft.etl.SnapshotIO.replacePartitions(spark, delta, dir, "day")
    val after = spark.read.parquet(dir)
    assert(after.filter(col("day") === "d0").count() === 1L, "d0 replaced whole")
    assert(after.filter(col("day") =!= "d0").count() ===
      rows.count(r => r._2 != "d0").toLong, "other partitions untouched")
  }
}

/** Multimodal plumbing: deterministic stub decode, batch shape, frames. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Tables.documents(spark, sf).limit(50), "doc_id", "text")

  test("BMP gray8 round-trip: padded rows, bottom-up order, exact pixels; malformed refused") {
    // width 6 -> rowSize 8: two pad bytes per row actually exercised
    val bmp = Multimodal.syntheticBmpGray8(3L, 6, 5)
    val (w, h, px) = Multimodal.decodeBmpGray8(bmp)
    assert(w === 6 && h === 5 && px.length === 30)
    for (y <- 0 until 5; x <- 0 until 6)
      assert(px(y * 6 + x) === (((3L * 31 + y * 6 + x) * 17) % 256).toInt,
        s"pixel ($x,$y) wrong — padding or row-order bug")
    intercept[IllegalArgumentException] {
      Multimodal.decodeBmpGray8("notabitmap".getBytes)
    }
  }

  test("WAV PCM16 round-trip: chunk walk skips extras, signs preserved; non-PCM refused") {
    val wav = Multimodal.syntheticWavPcm16(5L, 64)
    val smp = Multimodal.decodeWavPcm16(wav)
    assert(smp.length === 64)
    (0 until 64).foreach { t =>
      assert(smp(t) === (((5L * 7 + t * 13) % 65536) - 32768).toInt)
    }
    assert(smp.exists(_ < 0), "fixture must include negative samples to test sign decode")
    // insert a foreign chunk ('LIST', odd size -> pad byte) before data:
    // a real file walker must skip it, not mis-read data
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = wav.take(36) ++ extra ++ wav.drop(36)
    putRiffSize(spliced)
    assert(Multimodal.decodeWavPcm16(spliced).toSeq === smp.toSeq,
      "chunk walk must skip unknown chunks (with odd-size padding)")
    intercept[IllegalArgumentException] {
      Multimodal.decodeWavPcm16("RIFFxxxxNOPE".getBytes)
    }
  }

  test("hostile media refuses instead of hanging, crashing, or huge-allocating") {
    // negative chunk size: the naive advance 8 + (-8) + 0 = 0 spins forever
    val wav = Multimodal.syntheticWavPcm16(1L, 4)
    val negChunk = wav.take(36) ++
      Array[Byte]('J', 'U', 'N', 'K', -8, -1, -1, -1) ++ wav.drop(36)
    intercept[IllegalArgumentException] { Multimodal.decodeWavPcm16(negChunk) }
    // data size lying past the buffer
    val lying = wav.clone()
    lying(40) = 0x7F.toByte; lying(41) = 0x7F.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeWavPcm16(lying) }
    // truncated BMP: header promises pixels the buffer doesn't hold
    val bmp = Multimodal.syntheticBmpGray8(1L, 6, 5)
    intercept[IllegalArgumentException] { Multimodal.decodeBmpGray8(bmp.take(60)) }
    // header-lying BMP: absurd dimensions must refuse before allocating
    val absurd = bmp.clone()
    absurd(18) = -1; absurd(19) = -1; absurd(20) = -1; absurd(21) = 0x7F.toByte
    intercept[IllegalArgumentException] { Multimodal.decodeBmpGray8(absurd) }
  }

  test("boxDownsample2: exact integer box means; odd dimensions refused") {
    // 4x2 source, hand-computed: out(x,y) = (sum of 2x2 block + 2) / 4
    val px = Array(10, 20, 30, 40,
                   50, 60, 70, 81)
    val (w2, h2, out) = Multimodal.boxDownsample2(4, 2, px)
    assert(w2 === 2 && h2 === 1)
    assert(out.toSeq === Seq((10 + 20 + 50 + 60 + 2) / 4, (30 + 40 + 70 + 81 + 2) / 4))
    intercept[IllegalArgumentException] { Multimodal.boxDownsample2(3, 2, new Array[Int](6)) }
    intercept[IllegalArgumentException] { Multimodal.boxDownsample2(4, 2, new Array[Int](7)) }
  }

  test("resizePngGray: decode(resize(png)) equals box-averaging the decoded source") {
    val src = Multimodal.syntheticPngGray8(9L, 8, 6)
    val (sw, sh, spx) = Multimodal.decodeImageGray(src)
    val (ew, eh, expected) = Multimodal.boxDownsample2(sw, sh, spx)
    val (gw, gh, got) = Multimodal.decodeImageGray(Multimodal.resizePngGray(src))
    assert((gw, gh) === (ew, eh))
    assert(got.toSeq === expected.toSeq, "PNG re-encode must be lossless on the box means")
  }

  private def putRiffSize(b: Array[Byte]): Unit = {
    val v = b.length - 8
    b(4) = v.toByte; b(5) = (v >> 8).toByte; b(6) = (v >> 16).toByte; b(7) = (v >> 24).toByte
  }

  test("WAV data chunk before validated fmt chunk is refused") {
    // splice the data chunk ahead of fmt: the PCM/mono/16-bit checks would
    // never have run when the samples were read
    val wav = Multimodal.syntheticWavPcm16(2L, 4)
    val fmtChunk = wav.slice(12, 36)
    val dataChunk = wav.drop(36)
    val swapped = wav.take(12) ++ dataChunk ++ fmtChunk
    putRiffSize(swapped)
    intercept[IllegalArgumentException] { Multimodal.decodeWavPcm16(swapped) }
  }

  test("PNG gray8 ImageIO round-trip: exact pixels in row-major top-down order") {
    val png = Multimodal.syntheticPngGray8(3L, 7, 5)
    // it really is a PNG container, not a re-labeled raw dump
    assert((png(0) & 0xFF) === 0x89 && png(1) === 'P' && png(2) === 'N' && png(3) === 'G')
    val (w, h, px) = Multimodal.decodeImageGray(png)
    assert(w === 7 && h === 5 && px.length === 35)
    for (y <- 0 until 5; x <- 0 until 7)
      assert(px(y * 7 + x) === (((3L * 31 + y * 7 + x) * 17) % 256).toInt,
        s"pixel ($x,$y) wrong — encode, decode, or sample-order bug")
  }

  test("JPEG ImageIO decode: lossy codec within tolerance on smooth content") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 16; x <- 0 until 16) img.getRaster.setSample(x, y, 0, 128)
    val jpg = Multimodal.encodeImage(img, "jpg")
    assert((jpg(0) & 0xFF) === 0xFF && (jpg(1) & 0xFF) === 0xD8, "not a JPEG SOI")
    val (w, h, px) = Multimodal.decodeImageGray(jpg)
    assert(w === 16 && h === 16)
    // constant image is DC-only: decode error stays within a few counts
    px.foreach(p => assert(math.abs(p - 128) <= 3, s"JPEG decode drifted: $p"))
  }

  test("color image decodes to integer BT.601 luma") {
    val img = new java.awt.image.BufferedImage(
      3, 1, java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xFF0000); img.setRGB(1, 0, 0x00FF00); img.setRGB(2, 0, 0x0000FF)
    val (_, _, px) = Multimodal.decodeImageGray(Multimodal.encodeImage(img, "png"))
    assert(px.toSeq === Seq((255 * 299 + 500) / 1000, (255 * 587 + 500) / 1000,
      (255 * 114 + 500) / 1000))
  }

  test("hostile image bytes refuse before allocating or decoding") {
    // unrecognized bytes: no reader claims them
    intercept[IllegalArgumentException] {
      Multimodal.decodeImageGray("notanimage-at-all".getBytes)
    }
    // truncated past the header: reader recognized, decode must refuse as
    // IllegalArgumentException (not leak an IOException out of the task)
    val png = Multimodal.syntheticPngGray8(1L, 7, 5)
    intercept[IllegalArgumentException] { Multimodal.decodeImageGray(png.take(50)) }
    // header-lying PNG: absurd declared dimensions refuse BEFORE reader.read
    // (patch IHDR width/height to 2^20 each — 2^40 pixels — and fix the CRC
    // so the refusal is provably ours, not the reader tripping on a bad CRC)
    val absurd = png.clone()
    def putBe32(o: Int, v: Int): Unit = {
      absurd(o) = (v >> 24).toByte; absurd(o + 1) = (v >> 16).toByte
      absurd(o + 2) = (v >> 8).toByte; absurd(o + 3) = v.toByte
    }
    putBe32(16, 1 << 20); putBe32(20, 1 << 20)
    val crc = new java.util.zip.CRC32()
    crc.update(absurd, 12, 17) // "IHDR" + 13 data bytes
    putBe32(29, crc.getValue.toInt)
    intercept[IllegalArgumentException] { Multimodal.decodeImageGray(absurd) }
  }

  test("decodeFeatures dispatches real kernels by mime: image/png and audio/wav") {
    val png = Multimodal.syntheticPngGray8(4L, 7, 5)
    val wav = Multimodal.syntheticWavPcm16(4L, 64)
    val ds = Seq(
      Multimodal.MediaRow(1L, "image/png", png),
      Multimodal.MediaRow(2L, "audio/wav", wav)).toDS()
    val out = Multimodal.decodeFeatures(ds).collect().map(f => f.media_id -> f).toMap
    // image features come from REAL decoded pixels, not the byte stub
    val expectPx = (0 until 35).map(i => (((4L * 31 + i) * 17) % 256).toInt)
    assert(out(1L).features.toSeq ===
      Multimodal.grayHistogram(expectPx.toArray).toSeq)
    // audio features come from REAL decoded samples
    val expectSmp = (0 until 64).map(t => ((4L * 7 + t * 13) % 65536 - 32768).toInt)
    assert(out(2L).features.toSeq ===
      Multimodal.grayHistogram(expectSmp.map(v => (v + 32768) >> 8).toArray).toSeq)
    assert(out(1L).n_bytes === png.length && out(2L).n_bytes === wav.length)
  }

  test("decodeFeatures: 16-dim normalized histogram + byte length, deterministic") {
    val out = Multimodal.decodeFeatures(media).collect()
    assert(out.length === 50)
    out.foreach { f =>
      assert(f.features.length === 16)
      assert(math.abs(f.features.sum - 1.0f) < 1e-3)
      assert(f.n_bytes > 0)
    }
    val again = Multimodal.decodeFeatures(media).collect()
    assert(out.map(_.features.toSeq).toSeq === again.map(_.features.toSeq).toSeq)
  }

  test("sampleFrames emits every Nth fixed-size byte window") {
    val frames = Multimodal.sampleFrames(media, frameSize = 16, everyN = 2)
      .as[(Long, Int, Array[Byte])].collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_._2 % 2 === 0))
    assert(frames.filter(_._2 > 0).forall(_._3.length <= 16))
  }

  test("resize strides the payload, keeps ids, tags the mime, no shuffle") {
    // filter (pushed to the scan) instead of limit — a global limit plans
    // its own SinglePartition exchange and would mask resize's shape
    val src = Multimodal.fromText(
      Tables.documents(spark, sf).filter(col("doc_id") < 50), "doc_id", "text")
    val resized = Multimodal.resize(src, factor = 4)
    val byId = src.collect().map(r => r.media_id -> r).toMap
    resized.collect().foreach { r =>
      val orig = byId(r.media_id)
      assert(r.media.length === (orig.media.length + 3) / 4)
      assert(r.media.toSeq === (0 until r.media.length).map(i => orig.media(i * 4)))
      assert(r.mime === "text/plain;resize=1/4")
    }
    // partition-preserving: no Exchange in the plan
    assert(!resized.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
