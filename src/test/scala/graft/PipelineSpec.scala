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

/** Multimodal plumbing: deterministic stub decode, batch shape, frames. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Multimodal.fromText(
    Tables.documents(spark, sf).limit(50), "doc_id", "text")

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
