package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Pareto-front claims beyond the q188 oracle: brute-force dominance
  * equality on random points (duplicates, negatives), single-bucket
  * degeneracy, and the cross-bucket carry (a higher-bucket point must
  * dominate lower-bucket candidates it never shares a window with).
  */
class SkylineSpec extends SparkSpec {
  import spark.implicits._

  private def brute(pts: Seq[(Long, Long)]): Set[(Long, Long)] = {
    val g = pts.groupBy(_._1).map { case (x, ps) => (x, ps.map(_._2).max) }.toSeq
    g.filter { case (x, y) =>
      !g.exists { case (x2, y2) =>
        (x2 >= x && y2 >= y) && (x2 > x || y2 > y)
      }
    }.toSet
  }

  private def run(pts: Seq[(Long, Long)], buckets: Int = 64): Set[(Long, Long)] =
    Skyline.pareto2d(pts.toDF("a", "b"), col("a"), col("b"), buckets)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("equals brute-force dominance on random points (dups, negatives)") {
    val rnd = new scala.util.Random(17)
    val pts = Seq.fill(500)((rnd.nextInt(100).toLong - 50L,
      rnd.nextInt(100).toLong - 50L))
    assert(run(pts) == brute(pts))
  }

  test("degenerate spans: one x value, one point, staircase") {
    assert(run(Seq((7L, 1L), (7L, 9L), (7L, 3L))) == Set((7L, 9L)))
    assert(run(Seq((3L, 4L))) == Set((3L, 4L)))
    // a perfect staircase is entirely on the front
    val stairs = (0L until 10L).map(i => (i, 9L - i))
    assert(run(stairs) == stairs.toSet)
  }

  test("pareto2dAdvance: carried front ≡ recompute under any split; a later dominator evicts front points") {
    val rnd = new scala.util.Random(19)
    val pts = Seq.fill(300)((rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
    def df(p: Seq[(Long, Long)]) = p.toDF("x", "y")
    // adversarial split: batch 2 gets the GLOBALLY dominating point, so
    // much of batch 1's carried front must be evicted on advance
    val dom = (101L, 101L)
    val (b1, b2raw) = pts.splitAt(200)
    val b2 = b2raw :+ dom
    val st1 = Skyline.pareto2dAdvance(Skyline.pareto2dEmptyState(spark),
      df(b1), col("x"), col("y")).localCheckpoint()
    assert(st1.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      == brute(b1), "phase 1 front must equal brute force on batch 1")
    val st2 = Skyline.pareto2dAdvance(st1, df(b2), col("x"), col("y"))
    val got = st2.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute(b1 ++ b2), "carried front ≡ recompute on the union")
    assert(got == Set(dom), "the global dominator must evict everything")
  }

  test("cross-bucket carry: a high-bucket dominator kills low-bucket points") {
    // (100, 100) dominates everything below; with 4 buckets the losers sit
    // in buckets the dominator never shares a window with
    val pts = Seq((100L, 100L), (10L, 50L), (40L, 70L), (70L, 99L), (1L, 101L))
    assert(run(pts, buckets = 4) == Set((100L, 100L), (1L, 101L)))
    assert(run(pts, buckets = 1) == Set((100L, 100L), (1L, 101L)))
  }
}
