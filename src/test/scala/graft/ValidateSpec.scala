package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.quality.Validate
import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/** V1 invalid-row side channel + streaming dedup-within-watermark. */
class ValidateSpec extends SparkSpec {
  import spark.implicits._

  test("split diverts invalid rows with named violations, keeps valid rows intact") {
    val df = Seq(
      (1, Some(10.0), "ok"),
      (2, None, "missing amount"),
      (3, Some(5e12), "implausible"),
      (4, Some(-3.0), "negative and fine")
    ).toDF("id", "amount", "note")

    val s = Validate.split(df, Seq(
      "amount_present" -> col("amount").isNotNull,
      "amount_plausible" -> Validate.plausibleMagnitude(col("amount"))))

    assert(s.valid.select("id").as[Int].collect().toSet === Set(1, 4))
    val bad = s.invalid.select("id", "violation").as[(Int, String)].collect().toMap
    assert(bad(2) === "amount_present;amount_plausible") // null fails both
    assert(bad(3) === "amount_plausible")
    assert(s.valid.columns.toSeq === df.columns.toSeq)
  }

  test("observed metrics ride the consuming action: counts per rule, zero extra scans") {
    val df = Seq((1, 10.0), (2, -5.0), (3, 2.0e13), (4, 1.0)).toDF("k", "v")
    val rules = Seq(
      "non_negative" -> (col("v") >= 0),
      "plausible" -> Validate.plausibleMagnitude(col("v")))
    val (out, obs) = Validate.observed(df, rules)
    // the ONE action both produces the result and yields the metrics
    assert(out.count() === 4)
    val m = obs.get
    assert(m("n_rows") === 4L)
    assert(m("bad_non_negative") === 1L) // the -5.0 row
    assert(m("bad_plausible") === 1L)    // the 2e13 row
  }

  test("streaming dedup drops same-key re-deliveries within the watermark horizon") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    def ts(s: String) = java.sql.Timestamp.valueOf(s)

    val q = EventStream.dedupWithinWatermark(input.toDF(), Seq("event_id"), "ts")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()

    input.addData(
      Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
      Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0), // same-batch dup
      Event(2, ts("2024-01-01 00:05:00"), 2, "view", 2.0))
    q.processAllAvailable()
    input.addData(Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0)) // redelivery
    q.processAllAvailable()
    q.stop()

    val ids = spark.table("dedup_stream").select("event_id").as[Long].collect().sorted
    assert(ids.toSeq === Seq(1L, 2L))
  }
}
