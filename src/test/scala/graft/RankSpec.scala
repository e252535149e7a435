package graft

import org.apache.spark.sql.functions._

import graft.operators.Rank

/** Fixed-point PageRank against an independent plain-Scala model — EXACT
  * equality, the point of integer ranks — plus structural sanity.
  */
class RankSpec extends SparkSpec {

  /** Scalar reference: same recurrence, same truncating divisions. */
  private def refRanks(n: Int, edges: Seq[(Long, Long)], iters: Int,
                       scale: Long = 1000000000000L): Map[Long, Long] = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val incoming = edges.groupBy(_._2)
    val base = (scale * 15L) / (100L * n)
    var r = (0L until n.toLong).map(_ -> scale / n).toMap
    for (_ <- 0 until iters) {
      r = (0L until n.toLong).map { v =>
        val s = incoming.getOrElse(v, Nil).map { case (u, _) => r(u) / deg(u) }.sum
        v -> (base + (85L * s) / 100L)
      }.toMap
    }
    r
  }

  private def run(n: Int, edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    val nodes = (0L until n.toLong).toDF("node")
    val e = edges.toDF("src", "dst")
    Rank.pageRank(nodes, e, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("exactly equals the scalar model on a random graph") {
    val rnd = new scala.util.Random(11)
    val n = 40
    val edges = (0 until n).flatMap { u =>
      Seq.fill(3)((u.toLong, rnd.nextInt(n).toLong))
    }.distinct
    assert(run(n, edges, 5) == refRanks(n, edges, 5))
  }

  test("a 3-cycle stays uniform; a star concentrates rank on the hub") {
    val cyc = run(3, Seq((0L, 1L), (1L, 2L), (2L, 0L)), 5)
    assert(cyc.values.toSet.size == 1, s"cycle must stay uniform: $cyc")
    // nodes 1..4 all point at 0; 0 points at 1
    val star = run(5, Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L), (0L, 1L)), 5)
    assert(star(0L) > star(1L) && star(1L) > star(2L))
    assert(star(2L) == star(3L) && star(3L) == star(4L))
  }

  test("triangleCount equals brute force, hub graph included") {
    import spark.implicits._
    def brute(edges: Seq[(Long, Long)]): Long = {
      val und = edges.filter(e => e._1 != e._2)
        .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct.toSet
      val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
      (for {
        i <- nodes; j <- nodes if j > i; k <- nodes if k > j
        if und((i, j)) && und((j, k)) && und((i, k))
      } yield 1).size.toLong
    }
    def run(edges: Seq[(Long, Long)]): Long =
      graft.operators.Rank.triangleCount(edges.toDF("src", "dst"))
    // K4: 4 triangles
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i != j) yield (i, j)
    assert(run(k4) == 4L && brute(k4) == 4L)
    // bipartite: none
    val bip = for (i <- 0L to 3L; j <- 4L to 7L) yield (i, j)
    assert(run(bip) == 0L)
    // random graph with a celebrity hub (everyone links node 0) — the case
    // the degree orientation exists for
    val rnd = new scala.util.Random(3)
    val hubby = (1L to 30L).map(i => (i, 0L)) ++
      Seq.fill(60)((rnd.nextInt(31).toLong, rnd.nextInt(31).toLong))
    assert(run(hubby) == brute(hubby))
  }

  test("mass is conserved up to the documented truncation loss") {
    val rnd = new scala.util.Random(7)
    val n = 25
    // every node has out-links, so only division truncation sheds mass
    val edges = (0 until n).flatMap { u =>
      Seq((u.toLong, rnd.nextInt(n).toLong), (u.toLong, (u + 1L) % n))
    }.distinct
    val scale = 1000000000000L
    val total = run(n, edges, 5).values.sum
    assert(total <= scale)
    assert(total >= scale - 5L * 2L * n * n, // coarse bound, parts-per-million here
      s"lost too much mass: $total of $scale")
  }

  test("bfsDistances equals scalar BFS; settled nodes never regress") {
    import spark.implicits._
    def brute(n: Int, edges: Seq[(Long, Long)], src: Long,
              rounds: Int): Map[Long, Long] = {
      val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      var dist = Map(src -> 0L)
      var frontier = Set(src)
      for (k <- 1 to rounds if frontier.nonEmpty) {
        val next = frontier.flatMap(u => adj.getOrElse(u, Nil))
          .filterNot(dist.contains)
        dist = dist ++ next.map(_ -> k.toLong)
        frontier = next
      }
      dist
    }
    val rnd = new scala.util.Random(5)
    val n = 60
    val edges = (0 until n).flatMap(u =>
      Seq.fill(2)((u.toLong, rnd.nextInt(n).toLong))).distinct
    val got = graft.operators.Rank.bfsDistances(edges.toDF("src", "dst"), 0L, 6)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == brute(n, edges, 0L, 6))
    // chain: distances are exactly the positions, truncated by the bound
    val chain = (0L until 9L).map(i => (i, i + 1))
    val gotChain = graft.operators.Rank.bfsDistances(chain.toDF("src", "dst"), 0L, 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotChain == (0L to 4L).map(i => i -> i).toMap)
  }
}
