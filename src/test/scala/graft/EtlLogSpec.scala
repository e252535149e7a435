package graft

import java.nio.file.Files
import java.sql.Timestamp

import graft.etl.EtlLog

/** Watermark protocol (SURVEY §2.9): data-max watermark, bootstrap,
  * strict-vs-inclusive bound, log-on-failure.
  */
class EtlLogSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def src = Seq(
    (1, ts("2024-01-01 00:00:00")),
    (2, ts("2024-01-02 00:00:00")),
    (3, ts("2024-01-03 00:00:00"))
  ).toDF("id", "created_at")

  private def entry(wm: Timestamp, ok: Boolean, srcName: String = "laneA") =
    EtlLog.LogEntry(java.util.UUID.randomUUID().toString, srcName, 3,
      ts("2024-01-05 00:00:00"), ts("2024-01-05 00:01:00"), wm, ok,
      if (ok) "success" else "failed", if (ok) "" else "boom")

  test("watermark lifecycle: none → bootstrap → append → max of successful runs") {
    val dir = Files.createTempDirectory("etllog").toString
    assert(EtlLog.readWatermark(spark, dir, "laneA").isEmpty)
    assert(EtlLog.bootstrap(src, "created_at").contains(ts("2024-01-01 00:00:00")))

    EtlLog.append(spark, dir, entry(ts("2024-01-02 00:00:00"), ok = true))
    // failed run with a later watermark must NOT advance the watermark
    EtlLog.append(spark, dir, entry(ts("2024-01-09 00:00:00"), ok = false))
    // other source must not leak in
    EtlLog.append(spark, dir, entry(ts("2024-01-08 00:00:00"), ok = true, srcName = "laneB"))

    assert(EtlLog.readWatermark(spark, dir, "laneA").contains(ts("2024-01-02 00:00:00")))
  }

  test("strict > (DAG flavor) vs >= (dlt flavor) bounds") {
    val wm = ts("2024-01-02 00:00:00")
    assert(EtlLog.incremental(src, "created_at", wm, strict = true)
      .as[(Int, Timestamp)].collect().map(_._1).toSet === Set(3))
    assert(EtlLog.incremental(src, "created_at", wm, strict = false)
      .as[(Int, Timestamp)].collect().map(_._1).toSet === Set(2, 3))
    assert(EtlLog.probe(src, "created_at", wm) === 1)
  }

  test("changedSince is an OR over created/modified timestamps (P14)") {
    val df = Seq(
      (1, ts("2024-01-01 00:00:00"), ts("2024-01-09 00:00:00")), // modified late
      (2, ts("2024-01-09 00:00:00"), ts("2024-01-09 00:00:00")), // created late
      (3, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00")) // untouched
    ).toDF("id", "created_at", "modified_at")
    val got = EtlLog.changedSince(df, "created_at", "modified_at", ts("2024-01-05 00:00:00"))
      .select("id").as[Int].collect().toSet
    assert(got === Set(1, 2))
  }
}
