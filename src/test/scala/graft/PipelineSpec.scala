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

  private def putRiffSize(b: Array[Byte]): Unit = {
    val v = b.length - 8
    b(4) = v.toByte; b(5) = (v >> 8).toByte; b(6) = (v >> 16).toByte; b(7) = (v >> 24).toByte
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
