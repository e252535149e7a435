package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Aggregates

/** Min-timestamp-cascade funnel semantics on hand-built histories. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2026-01-01 00:$m%02d:00")

  private val steps = Seq(
    "a" -> (col("t") === "A"), "b" -> (col("t") === "B"),
    "c" -> (col("t") === "C"))

  private def run(rows: Seq[(Long, Timestamp, String)]): Map[String, Long] =
    Aggregates.funnel(rows.toDF("u", "ts", "t"), col("u"), col("ts"), steps)
      .collect().map(r => r.getString(0) -> r.getAs[Long]("entities")).toMap

  test("order matters: steps must strictly follow the previous completion") {
    val rows = Seq(
      // u1 completes A -> B -> C in order
      (1L, ts(1), "A"), (1L, ts(2), "B"), (1L, ts(3), "C"),
      // u2 does B before A: reaches A only (its only B precedes A)
      (2L, ts(1), "B"), (2L, ts(2), "A"),
      // u3 same-minute A and B: strict > rejects the tie; C later doesn't help
      (3L, ts(1), "A"), (3L, ts(1), "B"), (3L, ts(5), "C"),
      // u4 A then B, no C
      (4L, ts(1), "A"), (4L, ts(4), "B"))
    assert(run(rows) == Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
  }

  test("earliest completion is the anchor, not any completion") {
    // u1's FIRST A is at minute 1; a B at minute 2 counts even though a
    // second A arrives later at minute 3
    val rows = Seq((1L, ts(1), "A"), (1L, ts(2), "B"), (1L, ts(3), "A"))
    assert(run(rows) == Map("a" -> 1L, "b" -> 1L, "c" -> 0L))
  }
}
