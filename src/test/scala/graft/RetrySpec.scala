package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.etl.{Pipeline, Retry}

/** Retry/backoff protocol (ref `dags/hanger_lane.py:81-109`) and the probe
  * skip-vs-abort branch (`:624-644`) wired through Pipeline.runIncremental. */
class RetrySpec extends SparkSpec {

  private class Flaky(failures: Int, e: => Throwable) {
    val calls = new AtomicInteger(0)
    def apply(): Int = {
      val n = calls.incrementAndGet()
      if (n <= failures) throw e
      n
    }
  }

  test("transient failures retry with doubling backoff, then succeed") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val p = Retry.Policy(maxAttempts = 4, initialDelayMs = 100, sleep = sleeps += _)
    val f = new Flaky(2, new java.net.SocketTimeoutException("read timed out"))
    val (v, attempts) = Retry.withRetry(p)(f())
    assert(v === 3 && attempts === 3)
    assert(sleeps.toSeq === Seq(100L, 200L)) // exponential, one per failure
  }

  test("non-transient failure propagates immediately (no retry, no sleep)") {
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val p = Retry.Policy(maxAttempts = 5, sleep = sleeps += _)
    val f = new Flaky(1, new IllegalStateException("constraint violation"))
    intercept[IllegalStateException] { Retry.withRetry(p)(f()) }
    assert(f.calls.get === 1 && sleeps.isEmpty)
  }

  test("exhausted attempts propagate the last transient failure") {
    val p = Retry.Policy(maxAttempts = 3, sleep = _ => ())
    val f = new Flaky(99, new java.net.ConnectException("connection refused"))
    intercept[java.net.ConnectException] { Retry.withRetry(p)(f()) }
    assert(f.calls.get === 3)
  }

  test("connection-error heuristic: classes, messages, and causes") {
    assert(Retry.defaultTransient(new java.net.SocketTimeoutException("x")))
    assert(Retry.defaultTransient(new java.sql.SQLTransientException("x")))
    assert(Retry.defaultTransient(new RuntimeException("Connection reset by peer")))
    // driver-wrapped cause
    assert(Retry.defaultTransient(
      new RuntimeException("task failed", new java.net.ConnectException("refused"))))
    assert(!Retry.defaultTransient(new IllegalArgumentException("bad schema")))
    assert(!Retry.defaultTransient(new RuntimeException("division by zero")))
  }

  // --- Pipeline wiring ---

  private def transform(df: DataFrame): DataFrame =
    df.groupBy(col("ts").cast("date").as("event_day"))
      .agg(count(lit(1)).as("n"))

  test("pipeline retries a transiently failing extraction, then logs success") {
    val base = Files.createTempDirectory("retry-pipe").toString
    RetrySpec.probeFailures.set(2) // first two evaluations of the source throw
    val source = flakySource()
    val r = Pipeline.runIncremental(spark, source, "ts", transform, Seq("event_day"),
      s"$base/target", s"$base/log", "laneR",
      retry = Retry.Policy(maxAttempts = 3, sleep = _ => ()))
    assert(!r.skipped && r.extracted > 0)
    val log = spark.read.parquet(s"$base/log")
    assert(log.filter(col("success") && col("status") === "success").count() === 1)
    assert(spark.read.parquet(s"$base/target").count() > 0)
  }

  test("probe failure after retries: skipOnProbeFailure logs and skips; default aborts") {
    val base = Files.createTempDirectory("retry-skip").toString
    RetrySpec.probeFailures.set(Int.MaxValue) // source never recovers
    val r = Pipeline.runIncremental(spark, flakySource(), "ts", transform,
      Seq("event_day"), s"$base/target", s"$base/log", "laneS",
      retry = Retry.Policy(maxAttempts = 2, sleep = _ => ()),
      skipOnProbeFailure = true)
    assert(r.skipped && r.extracted === 0)
    val log = spark.read.parquet(s"$base/log")
    assert(log.filter(!col("success") && col("status") === "skipped_probe_failed")
      .count() === 1)
    // no snapshot written for a skipped source
    assert(!graft.etl.SnapshotIO.hasParquet(spark, s"$base/target"))

    RetrySpec.probeFailures.set(Int.MaxValue)
    intercept[Exception] {
      Pipeline.runIncremental(spark, flakySource(), "ts", transform,
        Seq("event_day"), s"$base/target2", s"$base/log2", "laneS",
        retry = Retry.Policy(maxAttempts = 2, sleep = _ => ()))
    }
  }

  /** An events slice whose evaluation throws a connection-ish error until the
    * shared countdown drains — stands in for a flaky JDBC source. The counter
    * is JVM-global (object field), which local-mode executors share. */
  private def flakySource(): DataFrame = {
    import spark.implicits._
    val events = Tables.events(spark, sf).select(col("ts")).limit(64)
    events.as[java.sql.Timestamp].mapPartitions { it =>
      if (RetrySpec.probeFailures.getAndDecrement() > 0)
        throw new java.io.IOException("Connection reset by peer")
      it
    }.toDF("ts")
  }
}

object RetrySpec {
  /** Remaining evaluations of the flaky source that must fail. */
  val probeFailures = new AtomicInteger(0)
}
