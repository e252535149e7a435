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

  test("triangleDeltaCount: every delta-edge class (1/2/3 delta edges per triangle) counts once") {
    import spark.implicits._
    def df(e: Seq[(Long, Long)]) = e.toDF("u", "v")
    // old graph: path 1-2, 1-3 plus edge 4-5
    val old = Seq((1L, 2L), (1L, 3L), (4L, 5L))
    // delta closes: {1,2,3} with ONE delta edge (2-3);
    // {1,4,5} needs TWO delta edges (1-4, 1-5) with old 4-5;
    // {6,7,8} is ALL-delta
    val delta = Seq((2L, 3L), (1L, 4L), (1L, 5L),
      (6L, 7L), (7L, 8L), (6L, 8L))
    assert(Rank.triangleDeltaCount(df(old), df(delta)) == 3L)
    // seed case: empty old — the all-delta term is the full count
    assert(Rank.triangleDeltaCount(df(Seq.empty), df(delta)) == 1L)
    // no new closure: disjoint delta edge adds nothing
    assert(Rank.triangleDeltaCount(df(old), df(Seq((10L, 11L)))) == 0L)
  }

  test("triangleDeltaCount ≡ recount difference on a random hubby graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = ((1L to 25L).map(i => (i, 0L)) ++
      Seq.fill(80)((rnd.nextInt(26).toLong, rnd.nextInt(26).toLong)))
      .toDF("src", "dst")
    val und = Rank.canonicalEdges(base).localCheckpoint()
    val oldE = und.filter((col("u") * 3 + col("v")) % 5 =!= 0).localCheckpoint()
    val deltaE = und.filter((col("u") * 3 + col("v")) % 5 === 0).localCheckpoint()
    def cnt(e: org.apache.spark.sql.DataFrame) =
      Rank.triangleCount(e.select(col("u").as("src"), col("v").as("dst")))
    assert(Rank.triangleDeltaCount(oldE, deltaE) == cnt(und) - cnt(oldE))
  }

  test("triangleBatch: chained advance ≡ recount; replay is idempotent") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_tristate").toString
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .toDF("src", "dst")
    val und = Rank.canonicalEdges(edges).localCheckpoint()
    def asE(e: org.apache.spark.sql.DataFrame) =
      e.select(col("u").as("src"), col("v").as("dst"))
    val b1 = und.filter(col("v") % 3 =!= 0)
    val b2 = und.filter(col("v") % 3 === 0)
    val r1 = Rank.triangleBatch(dir)(asE(b1), 0L).head()
    val r2 = Rank.triangleBatch(dir)(asE(b2), 1L).head()
    val total = r1.getLong(2) + r2.getLong(2)
    assert(total == Rank.triangleCount(asE(und)),
      "incremental total must equal the batch recount")
    val tot = Rank.triangleStateTotals(spark, dir).head()
    assert(tot.getLong(0) == und.count() && tot.getLong(1) == total)
    // replay batch 1: delta recomputes against strictly-earlier batches
    // only, so the partition rewrites with identical content
    val r2b = Rank.triangleBatch(dir)(asE(b2), 1L).head()
    assert(r2b.getLong(1) == r2.getLong(1) && r2b.getLong(2) == r2.getLong(2))
    val tot2 = Rank.triangleStateTotals(spark, dir).head()
    assert(tot2.getLong(0) == tot.getLong(0) && tot2.getLong(1) == tot.getLong(1))
    // overlapping re-send of already-seen edges: delta is empty, nothing new
    val r3 = Rank.triangleBatch(dir)(asE(b1), 2L).head()
    assert(r3.getLong(1) == 0L && r3.getLong(2) == 0L)
  }

  test("pageRankFrom: warm start is exact fixed-point arithmetic and converges faster than cold") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val all = Seq.fill(160)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
      .filter(e => e._1 != e._2).distinct
    val nodes = (0L until 40L).toDF("node")
    val delta = all.filter(e => (e._1 + e._2) % 6 == 0)
    val oldE = all.diff(delta)
    def df(e: Seq[(Long, Long)]) = e.toDF("src", "dst")
    def vec(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // determinism: warm from the uniform init == the cold path itself
    val uniform = nodes.select(col("node"),
      lit(1000000000000L / 40L).as("rank"))
    assert(vec(Rank.pageRankFrom(nodes, df(all), uniform, 5))
      == vec(Rank.pageRank(nodes, df(all), 5)))
    // contraction: 3 warm rounds from the old graph's vector land closer
    // to the new graph's fixed point than 3 cold rounds
    val fix = vec(Rank.pageRank(nodes, df(all), 40))
    val warmInit = Rank.pageRank(nodes, df(oldE), 10).localCheckpoint()
    val warm = vec(Rank.pageRankFrom(nodes, df(all), warmInit, 3))
    val cold = vec(Rank.pageRank(nodes, df(all), 3))
    def dist(v: Map[Long, Long]) = fix.map { case (k, r) => math.abs(v(k) - r) }.sum
    assert(dist(warm) < dist(cold),
      s"warm ${dist(warm)} must beat cold ${dist(cold)}")
  }

  test("componentsAdvance: label-graph merge equals recompute; unseen nodes and replays handled") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val all = Seq.fill(60)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(e => e._1 != e._2)
    val (b2raw, b1) = all.partition(e => (e._1 + e._2) % 3 == 0)
    // delta also introduces nodes the state has never seen (ids 100+)
    val b2 = b2raw ++ Seq((100L, 101L), (101L, 5L))
    val nodes = ((0L until 30L) ++ Seq(100L, 101L)).toDF("node")
    def und(e: Seq[(Long, Long)]) = Rank.canonicalEdges(e.toDF("src", "dst"))
    def labels(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // seed on b1 over ONLY the 0..29 universe (100/101 unseen until b2)
    val seed = graft.operators.Dedup.dupClusters(
        (0L until 30L).toDF("node"), "node", und(b1), "u", "v")
      .select(col("node"), col("cluster_id").as("label")).localCheckpoint()
    val adv = Rank.componentsAdvance(seed, b2.toDF("src", "dst"))
      .localCheckpoint()
    val want = labels(graft.operators.Dedup.dupClusters(
        nodes, "node", und(all ++ Seq((100L, 101L), (101L, 5L))), "u", "v")
      .select(col("node"), col("cluster_id")))
    assert(labels(adv) == want, "advance must equal the recompute on the union")
    // replaying the same delta changes nothing
    assert(labels(Rank.componentsAdvance(adv, b2.toDF("src", "dst"))) == want)
    // empty delta: state unchanged
    assert(labels(Rank.componentsAdvance(adv,
      Seq.empty[(Long, Long)].toDF("src", "dst"))) == want)
  }

  test("componentsAdvance plan guard: the state only streams — no sort-merge join touches it") {
    import spark.implicits._
    val state = (0L until 2000L).map(i => (i, i)).toDF("node", "label")
      .localCheckpoint()
    val delta = Seq((1L, 2L), (3L, 4L), (5L, 2001L)).toDF("src", "dst")
    val adv = Rank.componentsAdvance(state, delta)
    val plan = adv.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      s"every state touch must be a broadcast-streamed scan: $plan")
    // and the result is still the recompute
    val want = graft.operators.Dedup.dupClusters(
        state.select("node").unionByName(Seq(2001L).toDF("node")), "node",
        Rank.canonicalEdges(delta), "u", "v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(adv.collect().map(r => (r.getLong(0), r.getLong(1))).toSet == want)
  }

  test("bfsAdvance: relaxation from delta edges equals from-scratch BFS of the union") {
    import spark.implicits._
    def dists(d: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // hand case: a chain 0->1->2->3 plus a delta shortcut 0->3 (improves 3)
    // and a delta-only branch 3->4->5 (4,5 newly reachable THROUGH delta)
    val oldE = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
    val delta = Seq((0L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val d0 = Rank.bfsDistances(oldE, 0L, 4)
    val adv = dists(Rank.bfsAdvance(oldE, d0, delta, 4))
    assert(adv == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 1L, 4L -> 2L, 5L -> 3L),
      s"shortcut + delta-chain reach: $adv")
    // random graph, random split — equality with the recount at the bound
    val rnd = new scala.util.Random(23)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val all = edges.toDF("src", "dst").distinct().localCheckpoint()
    val b1 = all.filter((col("src") * 7 + col("dst")) % 3 =!= 0)
    val b2 = all.filter((col("src") * 7 + col("dst")) % 3 === 0)
    val seed = Rank.bfsDistances(b1, 0L, 4).localCheckpoint()
    val got = dists(Rank.bfsAdvance(b1, seed, b2, 4))
    val want = dists(Rank.bfsDistances(all, 0L, 4))
    assert(got == want, s"incremental ${got.size} vs recount ${want.size}")
    // empty delta: state unchanged
    assert(dists(Rank.bfsAdvance(b1, seed, b2.limit(0), 4)) == dists(seed))
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

  // ----- residual-push (Gauss–Southwell) PageRank -----

  /** Scalar twin of the residual state + synchronous push rounds — same
    * truncating divisions, same round structure, EXACT equality expected. */
  private case class PState(x: Map[Long, Long], s: Map[Long, Long],
                            deg: Map[Long, Long])

  private def refState(nodes: Seq[Long], edges: Seq[(Long, Long)],
                       init: Map[Long, Long]): PState = {
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val x = nodes.map(v => v -> init.getOrElse(v, 0L)).toMap
    val s = nodes.map { v =>
      v -> edges.filter(_._2 == v).map { case (u, _) => x(u) / deg(u) }.sum
    }.toMap
    PState(x, s, nodes.map(v => v -> deg.getOrElse(v, 0L)).toMap)
  }

  private def refPush(st0: PState, edges: Seq[(Long, Long)], eps: Long,
                      maxRounds: Int,
                      scale: Long = 1000000000000L): PState = {
    val n = st0.x.size
    val base = (scale * 15L) / (100L * n)
    var st = st0
    var r = 0
    var done = false
    while (r < maxRounds && !done) {
      def res(v: Long) = base + (85L * st.s(v)) / 100L - st.x(v)
      val heavy = st.x.keys.filter(v => math.abs(res(v)) > eps).toSet
      if (heavy.isEmpty) done = true
      else {
        val ds = edges.filter(e => heavy(e._1)).groupBy(_._2).view.mapValues {
          es => es.map { case (u, _) =>
            (st.x(u) + res(u)) / st.deg(u) - st.x(u) / st.deg(u)
          }.sum
        }.toMap
        st = PState(
          st.x.map { case (v, xv) => v -> (if (heavy(v)) xv + res(v) else xv) },
          st.s.map { case (v, sv) => v -> (sv + ds.getOrElse(v, 0L)) },
          st.deg)
        r += 1
      }
    }
    st
  }

  private def stateOf(df: org.apache.spark.sql.DataFrame): PState = {
    val rows = df.select("node", "x", "s", "deg").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    PState(rows.map(t => t._1 -> t._2).toMap,
      rows.map(t => t._1 -> t._3).toMap,
      rows.map(t => t._1 -> t._4).toMap)
  }

  test("pageRankPush exactly equals the scalar push model, round for round") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val n = 40
    val edges = (0 until n).flatMap { u =>
      Seq.fill(3)((u.toLong, rnd.nextInt(n).toLong))
    }.distinct
    val nodes = (0L until n.toLong).toDF("node")
    val e = edges.toDF("src", "dst")
    val init = Rank.pageRank(nodes, e, 2)
    val st = Rank.pageRankResidualState(nodes, e, init)
    val refInit = refRanks(n, edges, 2)
    assert(stateOf(st) == refState(0L until n.toLong, edges, refInit),
      "residual-state bootstrap drifted from the scalar model")
    for (rounds <- Seq(1, 3, 8)) {
      val got = stateOf(Rank.pageRankPush(st, e, eps = 100000L,
        maxRounds = rounds))
      val want = refPush(refState(0L until n.toLong, edges, refInit),
        edges, 100000L, rounds)
      assert(got == want, s"push diverged from scalar model at $rounds rounds")
    }
  }

  test("pageRankPush converges: every residual ≤ eps, and ranks match converged power iteration") {
    import spark.implicits._
    val rnd = new scala.util.Random(29)
    val n = 30
    val edges = (0 until n).flatMap { u =>
      Seq.fill(2)((u.toLong, rnd.nextInt(n).toLong))
    }.distinct
    val nodes = (0L until n.toLong).toDF("node")
    val e = edges.toDF("src", "dst")
    val eps = 100000000L // 0.3% of the ~3.3e10 per-node mass at n = 30
    val st = Rank.pageRankResidualState(nodes, e,
      Rank.pageRank(nodes, e, 3))
    val pushed = Rank.pageRankPush(st, e, eps, maxRounds = 40)
    val res = Rank.withResidual(pushed, n).select("res")
      .collect().map(r => math.abs(r.getLong(0)))
    assert(res.max <= eps, s"push did not drain: max residual ${res.max}")
    // contraction bound: |x* - pow21| ≤ d/(1-d)·|pow21 - pow20|,
    // |x* - push| ≤ eps/(1-d) — generous slack on top
    def ranks(iters: Int) = Rank.pageRank(nodes, e, iters).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (p20, p21) = (ranks(20), ranks(21))
    val powErr = p21.map { case (k, v) => math.abs(v - p20(k)) }.max
    val bound = (powErr * 85L) / 15L + (eps * 100L) / 15L + n.toLong * 50L
    val push = stateOf(pushed).x
    val maxDiff = p21.map { case (k, v) => math.abs(push(k) - v) }.max
    assert(maxDiff <= bound,
      s"push ranks off converged power iteration: $maxDiff > $bound")
  }

  test("pageRankPushAdvance: delta fold + push equals the scalar pipeline; invariants hold on the grown graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val n = 36
    val all = (0 until n).flatMap { u =>
      Seq.fill(3)((u.toLong, rnd.nextInt(n).toLong))
    }.distinct
    val (delta, b1) = all.partition { case (u, v) => (u + v) % 4 == 0 }
    val nodes = (0L until n.toLong).toDF("node")
    val e1 = b1.toDF("src", "dst")
    val d = delta.toDF("src", "dst")
    val eps = 100000L
    val st1 = Rank.pageRankResidualState(nodes, e1,
      Rank.pageRank(nodes, e1, 5)).localCheckpoint()
    val adv = Rank.pageRankPushAdvance(st1, e1, d, eps, maxRounds = 6)
    // scalar pipeline: same bootstrap, same fold, same pushes
    val refInit = refRanks(n, b1, 5)
    val s1 = refState(0L until n.toLong, b1, refInit)
    val degN = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val foldS = s1.s.map { case (v, sv) =>
      val reSplit = b1.filter(e => delta.exists(_._1 == e._1) && e._2 == v)
        .map { case (u, _) => s1.x(u) / degN(u) - s1.x(u) / s1.deg(u) }.sum
      val gains = delta.filter(_._2 == v)
        .map { case (u, _) => s1.x(u) / degN(u) }.sum
      v -> (sv + reSplit + gains)
    }
    val s2 = PState(s1.x, foldS,
      (0L until n.toLong).map(v => v -> degN.getOrElse(v, 0L)).toMap)
    val want = refPush(s2, all, eps, 6)
    assert(stateOf(adv) == want, "advance diverged from the scalar pipeline")
    // structural invariants on the result: deg matches the grown graph,
    // s(v) is EXACTLY the from-scratch in-sum of the final x
    val got = stateOf(adv)
    val deg = all.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    (0L until n.toLong).foreach { v =>
      assert(got.deg(v) == deg.getOrElse(v, 0L))
      val sFresh = all.filter(_._2 == v)
        .map { case (u, _) => got.x(u) / deg(u) }.sum
      assert(got.s(v) == sFresh, s"in-sum invariant broken at node $v")
    }
  }
}
