package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.PortableHash
import graft.operators.Rank

/** Graph-ranking queries: iterative numeric algorithms whose every round
  * replays exactly in the oracle — fixed-point arithmetic makes the usual
  * "iterative float code can only be spot-checked" excuse unnecessary.
  */
object GraphQueries {

  def rowsOnly: Set[String] = Set.empty

  /** PageRank iterations to run (unrolled identically in the oracle). */
  private val Iters = 5

  /** Warm-start iterations after the graph grows (q201). */
  private val WarmIters = 3

  /** q214 residual-push parameters: bootstrap power iterations (enough
    * that the pre-delta residuals sit under eps — 0.85^12 ≈ 0.14 of the
    * initial gap), synchronous push rounds after the delta folds in, and
    * the eps denominator (eps = scale/(8n) ≈ 12% of the per-node mass —
    * above the bootstrap's leftover residual, below the ~28% kick a moved
    * edge gives its target). All three replay verbatim in the oracle. */
  private val PushIters = 12
  private val PushRounds = 6

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Fixed-point PageRank over a deterministic synthetic link graph on
    // the documents table (3 hash-derived out-links per doc — the graph
    // construction is itself part of the replayed contract; doc_ids are
    // contiguous 0..N-1 at every SF so hashed targets are valid nodes).
    // Top-20 by rank, ties to the smaller id. The web-graph quality prior
    // a CC-scale corpus pipeline ranks pages with.
    "q183_link_rank" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val nodes = docs.select(col("doc_id").as("node"))
      val edges = docs
        .select(col("doc_id").as("src"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("r"))
        .select(col("src"),
          pmod(PortableHash.mixpCol(col("src") * 7 + col("r")), lit(n)).as("dst"))
        .distinct()
      Rank.pageRank(nodes, edges, Iters)
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
    },

    // Global graph statistics over the same link graph, with the triangle
    // count going through the DEGREE-ORIENTED wedge join (each vertex's
    // wedge cost capped at its out-neighborhood — the hub-proof plan; the
    // oracle replays the count with the naive three-way join, which is fine
    // at oracle scale and proves the oriented plan counts the same
    // triangles).
    "q184_graph_stats" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val edges = docs
        .select(col("doc_id").as("src"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("r"))
        .select(col("src"),
          pmod(PortableHash.mixpCol(col("src") * 7 + col("r")), lit(n)).as("dst"))
        .distinct()
      val tri = Rank.triangleCount(edges)
      val und = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"))
        .distinct()
      val deg = und.select(col("u").as("x"))
        .unionAll(und.select(col("v").as("x")))
        .groupBy("x").agg(count(lit(1)).as("d"))
      und.agg(count(lit(1)).as("n_edges"))
        .crossJoin(deg.agg(max(col("d")).as("max_degree")))
        .select(lit(n).as("n_nodes"), col("n_edges"),
          lit(tri).as("n_triangles"), col("max_degree"))
    },

    // Incremental triangle maintenance — the graph family's §2.9
    // watermark member. The link graph splits into two disjoint edge
    // batches ((u+v) mod 4); each batch advances a persisted edge state
    // via the delta-probe identity (work linear in delta-incident degree,
    // NEVER a recount), and the output carries the recount next to the
    // incremental total per batch: matches_recount is computed by the
    // ENGINE from two genuinely different algorithms (delta probes vs the
    // degree-oriented wedge join), while the oracle derives the same rows
    // from naive three-way joins — incremental ≡ batch recount, chained.
    "q195_triangle_incremental" -> { (s, dir) =>
      import s.implicits._
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val edges = docs
        .select(col("doc_id").as("src"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("r"))
        .select(col("src"),
          pmod(PortableHash.mixpCol(col("src") * 7 + col("r")), lit(n)).as("dst"))
        .distinct()
      val und = Rank.canonicalEdges(edges).localCheckpoint()
      val state = PrepQueries.scratchTempDir("graft_q195_") + "/tri"
      def asEdges(df: org.apache.spark.sql.DataFrame) =
        df.select(col("u").as("src"), col("v").as("dst"))
      val b1 = und.filter((col("u") + col("v")) % 4 =!= 0)
      val b2 = und.filter((col("u") + col("v")) % 4 === 0)
      val r1 = Rank.triangleBatch(state)(asEdges(b1), 0L).head()
      val r2 = Rank.triangleBatch(state)(asEdges(b2), 1L).head()
      val tri1 = Rank.triangleCount(asEdges(b1))
      val triF = Rank.triangleCount(asEdges(und))
      val (new1, new2) = (r1.getLong(2), r2.getLong(2))
      Seq(
        (0L, r1.getLong(1), new1, new1, tri1, new1 == tri1),
        (1L, r2.getLong(1), new2, new1 + new2, triF, new1 + new2 == triF))
        .toDF("batch_id", "n_edges_added", "n_new_triangles",
          "n_triangles_total", "n_triangles_recount", "matches_recount")
        .orderBy("batch_id")
    },

    // PageRank's incremental form is a WARM START: exact per-edge delta
    // maintenance of an eigenvector doesn't exist, so production ranking
    // absorbs a crawl delta by resuming the fixed-point recurrence on the
    // grown graph from the persisted vector. Integer fixed point keeps
    // every warm round exactly replayable — the oracle unrolls the cold
    // chain on batch-1 edges, then the warm chain on the full graph FROM
    // that vector. Top-20 per phase.
    "q201_pagerank_warmstart" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val nodes = docs.select(col("doc_id").as("node"))
      val edges = docs
        .select(col("doc_id").as("src"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("r"))
        .select(col("src"),
          pmod(PortableHash.mixpCol(col("src") * 7 + col("r")), lit(n)).as("dst"))
        .distinct()
        .localCheckpoint()
      val b1 = edges.filter((col("src") + col("dst")) % 4 =!= 0)
      val v1 = Rank.pageRank(nodes, b1, Iters).localCheckpoint()
      val v2 = Rank.pageRankFrom(nodes, edges, v1, WarmIters).localCheckpoint()
      def top(v: org.apache.spark.sql.DataFrame, phase: String) =
        v.orderBy(col("rank").desc, col("node")).limit(20)
          .withColumn("phase", lit(phase))
      top(v1, "1_after_b1").unionByName(top(v2, "2_after_b2"))
        .select("phase", "node", "rank")
        .orderBy(col("phase"), col("rank").desc, col("node"))
    },

    // DELTA-SCOPED PageRank: the residual-push (Gauss–Southwell) advance —
    // q201's warm resume still pays one O(E) join per round; here the
    // state carries each node's EXACT integer in-sum, a sparse (~1%) edge
    // delta re-splits only its sources' already-absorbed mass, and the
    // synchronous push rounds touch only the |residual| > eps frontier's
    // out-neighborhoods. Same int64 fixed-point discipline (truncating
    // div matches DuckDB // on negatives too), so bootstrap, fold, and
    // every push round replay verbatim in the oracle. Output: top-20
    // (rank, residual) per phase.
    "q214_pagerank_push" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val eps = math.max(1L, 1000000000000L / (n * 8L))
      // the bootstrap (12 power rounds + the one-time exact in-sum build)
      // is the amortized-once cost the advance exists to avoid paying
      // again — build it once per suite (the q206/q175 fixture-cache
      // pattern) so the measured work is the DELTA fold + push rounds.
      // Edges land src-SORTED parquet, so the advance's pushed-isin
      // slices prune the seen graph at row-group grain — the persisted
      // layout the operator's 100 TB story assumes, now actually probed.
      val fix = PrepQueries.cachedFixture("q214_push", dir) { d =>
        val nodes = docs.select(col("doc_id").as("node"))
        val edges = docs
          .select(col("doc_id").as("src"),
            explode(array(lit(0L), lit(1L), lit(2L))).as("r"))
          .select(col("src"),
            pmod(PortableHash.mixpCol(col("src") * 7 + col("r")), lit(n)).as("dst"))
          .distinct()
        edges.sort("src").write.parquet(s"$d/edges")
        val b1 = edges.filter((col("src") + col("dst")) % 97 =!= 0)
        Rank.pageRankResidualState(nodes, b1,
            Rank.pageRank(nodes, b1, PushIters))
          .coalesce(1).write.parquet(s"$d/st1")
      }
      val edges = s.read.parquet(s"$fix/edges")
      val b1 = edges.filter((col("src") + col("dst")) % 97 =!= 0)
      val delta = edges.filter((col("src") + col("dst")) % 97 === 0)
      val st1 = s.read.parquet(s"$fix/st1")
        .select("node", "x", "s", "deg").localCheckpoint()
      val adv = Rank.pageRankPushAdvance(st1, b1, delta, eps, PushRounds)
        .localCheckpoint()
      def top(st: org.apache.spark.sql.DataFrame, phase: String) =
        Rank.withResidual(st, n)
          .orderBy(col("x").desc, col("node")).limit(20)
          .select(lit(phase).as("phase"), col("node"),
            col("x").as("rank"), col("res").as("resid"))
      top(st1, "1_after_b1").unionByName(top(adv, "2_after_b2"))
        .orderBy(col("phase"), col("rank").desc, col("node"))
    },

    // Incremental connected components: which components FUSE is decided
    // entirely by the delta edges' endpoint labels, so the fixed point
    // (pointer-doubling min-label) runs on the LABEL graph — one node per
    // touched component — instead of the data graph; the seen edges are
    // never touched again. Sparse fixture (one out-edge per 7th doc) keeps
    // components honest-sized for the oracle's recursive reach.
    "q202_incremental_components" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val edges = docs.filter(col("doc_id") % 7 === 0)
        .select(col("doc_id").as("src"),
          pmod(PortableHash.mixpCol(col("doc_id") * 11 + 1), lit(n)).as("dst"))
        .filter(col("src") =!= col("dst"))
        .localCheckpoint()
      val b1 = edges.filter((col("src") + col("dst")) % 3 =!= 0)
      val b2 = edges.filter((col("src") + col("dst")) % 3 === 0)
      val st1 = graft.operators.Dedup.dupClusters(
          docs.select(col("doc_id").as("node")), "node",
          Rank.canonicalEdges(b1), "u", "v")
        .select(col("node"), col("cluster_id").as("label"))
        .localCheckpoint()
      val st2 = Rank.componentsAdvance(st1, b2).localCheckpoint()
      def ph(st: org.apache.spark.sql.DataFrame, phase: String) =
        st.withColumn("phase", lit(phase))
      ph(st1, "1_after_b1").unionByName(ph(st2, "2_after_b2"))
        .select(col("phase"), col("node"), col("label").as("component_id"))
        .orderBy("phase", "node")
    },

    // q187's incremental twin — distances under edge ADDITIONS only ever
    // decrease, so relaxation seeded at the delta edges' settled sources
    // converges to the exact bounded-round BFS of the union while touching
    // only the affected region (never a from-source recount). The edge set
    // splits (src+dst) mod 5; output is the hop histogram after each
    // phase; the oracle unrolls BOTH frontiers from scratch.
    "q200_incremental_bfs" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val edges = docs
        .select(col("doc_id").as("src"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("r"))
        .select(col("src"),
          pmod(PortableHash.mixpCol(col("src") * 7 + col("r")), lit(n)).as("dst"))
        .distinct()
        .localCheckpoint()
      val b1 = edges.filter((col("src") + col("dst")) % 5 =!= 0)
      val b2 = edges.filter((col("src") + col("dst")) % 5 === 0)
      val d1 = Rank.bfsDistances(b1, source = 0L, rounds = BfsRounds)
        .localCheckpoint()
      val d2 = Rank.bfsAdvance(b1, d1, b2, rounds = BfsRounds)
        .localCheckpoint()
      def hist(d: org.apache.spark.sql.DataFrame, phase: String) =
        d.groupBy("dist").agg(count(lit(1)).as("n_nodes"))
          .withColumn("phase", lit(phase))
      hist(d1, "1_after_b1").unionByName(hist(d2, "2_after_b2"))
        .select("phase", "dist", "n_nodes")
        .orderBy("phase", "dist")
    },

    // BFS reach histogram from doc 0 over the link graph: how many nodes
    // sit at each hop distance within 4 rounds (the frontier-relaxation
    // plan — settled nodes never re-enter a shuffle; the oracle unrolls
    // the same four frontiers in SQL).
    "q187_bfs_reach" -> { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"))
      val n = docs.count()
      val edges = docs
        .select(col("doc_id").as("src"),
          explode(array(lit(0L), lit(1L), lit(2L))).as("r"))
        .select(col("src"),
          pmod(PortableHash.mixpCol(col("src") * 7 + col("r")), lit(n)).as("dst"))
        .distinct()
      Rank.bfsDistances(edges, source = 0L, rounds = BfsRounds)
        .groupBy("dist").agg(count(lit(1)).as("n_nodes"))
        .orderBy("dist")
    }
  )

  /** BFS rounds (unrolled identically in the oracle). */
  private val BfsRounds = 4

  private def iterCte(i: Int): String =
    s"""c$i AS (SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS s
       |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
       |  JOIN deg d ON e.src = d.src
       |  GROUP BY 1),
       |r$i AS (SELECT nodes.node,
       |    CAST((1000000000000 * 15) // (100 * nn.n)
       |         + (85 * COALESCE(c$i.s, 0)) // 100 AS BIGINT) AS rank
       |  FROM nodes CROSS JOIN nn LEFT JOIN c$i ON nodes.node = c$i.node)"""
      .stripMargin

  def oracleSql: Map[String, String] = Map(

    "q183_link_rank" ->
      s"""WITH nodes AS (SELECT doc_id AS node FROM documents),
         |nn AS (SELECT count(*) AS n FROM documents),
         |cand AS (SELECT doc_id AS src, x.r FROM documents
         |         CROSS JOIN (SELECT unnest(range(3)) AS r) x),
         |x0 AS (SELECT src, src * 7 + r AS x FROM cand),
         |x1 AS (SELECT src, (xor(x % 2147483648, (x % 2147483648) >> 16) * 73244475) % 2147483648 AS h FROM x0),
         |x2 AS (SELECT src, (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM x1),
         |edges AS (SELECT DISTINCT src, xor(h, h >> 16) % nn.n AS dst
         |          FROM x2 CROSS JOIN nn),
         |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |r0 AS (SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS rank
         |       FROM nodes CROSS JOIN nn),
         |${(1 to Iters).map(iterCte).mkString(",\n")}
         |SELECT node, rank FROM r$Iters
         |ORDER BY rank DESC, node
         |LIMIT 20""".stripMargin,

    "q184_graph_stats" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |cand AS (SELECT doc_id AS src, x.r FROM documents
        |         CROSS JOIN (SELECT unnest(range(3)) AS r) x),
        |x0 AS (SELECT src, src * 7 + r AS x FROM cand),
        |x1 AS (SELECT src, (xor(x % 2147483648, (x % 2147483648) >> 16) * 73244475) % 2147483648 AS h FROM x0),
        |x2 AS (SELECT src, (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM x1),
        |edges0 AS (SELECT DISTINCT src, xor(h, h >> 16) % nn.n AS dst
        |           FROM x2 CROSS JOIN nn),
        |und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |        FROM edges0 WHERE src <> dst),
        |deg AS (SELECT x, count(*) AS d FROM (
        |          SELECT u AS x FROM und UNION ALL SELECT v AS x FROM und)
        |        GROUP BY 1),
        |tri AS (SELECT count(*) AS t
        |        FROM und e1 JOIN und e2 ON e1.v = e2.u
        |        JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v)
        |SELECT (SELECT n FROM nn) AS n_nodes,
        |       (SELECT count(*) FROM und) AS n_edges,
        |       (SELECT t FROM tri) AS n_triangles,
        |       (SELECT max(d) FROM deg) AS max_degree""".stripMargin,

    // The chained incremental oracle: batch-1 and full-graph triangle
    // counts via the naive three-way join; the per-batch increment is the
    // set difference, so equality with the engine's delta-probe totals IS
    // the incremental ≡ recount proof.
    "q195_triangle_incremental" ->
      """WITH nn AS (SELECT count(*) AS n FROM documents),
        |cand AS (SELECT doc_id AS src, x.r FROM documents
        |         CROSS JOIN (SELECT unnest(range(3)) AS r) x),
        |x0 AS (SELECT src, src * 7 + r AS x FROM cand),
        |x1 AS (SELECT src, (xor(x % 2147483648, (x % 2147483648) >> 16) * 73244475) % 2147483648 AS h FROM x0),
        |x2 AS (SELECT src, (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM x1),
        |edges0 AS (SELECT DISTINCT src, xor(h, h >> 16) % nn.n AS dst
        |           FROM x2 CROSS JOIN nn),
        |und AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |        FROM edges0 WHERE src <> dst),
        |b1 AS (SELECT * FROM und WHERE (u + v) % 4 <> 0),
        |t1 AS (SELECT count(*) AS t FROM b1 e1 JOIN b1 e2 ON e1.v = e2.u
        |       JOIN b1 e3 ON e3.u = e1.u AND e3.v = e2.v),
        |tf AS (SELECT count(*) AS t FROM und e1 JOIN und e2 ON e1.v = e2.u
        |       JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        |n1 AS (SELECT count(*) AS c FROM b1),
        |n2 AS (SELECT count(*) AS c FROM und WHERE (u + v) % 4 = 0)
        |SELECT * FROM (
        |  SELECT CAST(0 AS BIGINT) AS batch_id,
        |         (SELECT c FROM n1) AS n_edges_added,
        |         (SELECT t FROM t1) AS n_new_triangles,
        |         (SELECT t FROM t1) AS n_triangles_total,
        |         (SELECT t FROM t1) AS n_triangles_recount,
        |         TRUE AS matches_recount
        |  UNION ALL
        |  SELECT 1, (SELECT c FROM n2),
        |         (SELECT t FROM tf) - (SELECT t FROM t1),
        |         (SELECT t FROM tf), (SELECT t FROM tf), TRUE)
        |ORDER BY batch_id""".stripMargin,

    // The warm-start oracle: the cold 5-round chain on batch-1 edges, then
    // the warm 3-round chain on the FULL graph seeded from the cold
    // vector — integer fixed point makes the handoff exact.
    "q201_pagerank_warmstart" ->
      s"""WITH nodes AS (SELECT doc_id AS node FROM documents),
         |nn AS (SELECT count(*) AS n FROM documents),
         |cand AS (SELECT doc_id AS src, x.r FROM documents
         |         CROSS JOIN (SELECT unnest(range(3)) AS r) x),
         |x0 AS (SELECT src, src * 7 + r AS x FROM cand),
         |x1 AS (SELECT src, (xor(x % 2147483648, (x % 2147483648) >> 16) * 73244475) % 2147483648 AS h FROM x0),
         |x2 AS (SELECT src, (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM x1),
         |edges AS (SELECT DISTINCT src, xor(h, h >> 16) % nn.n AS dst
         |          FROM x2 CROSS JOIN nn),
         |b1e AS (SELECT * FROM edges WHERE (src + dst) % 4 <> 0),
         |adeg AS (SELECT src, count(*) AS deg FROM b1e GROUP BY 1),
         |bdeg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
         |ar0 AS (SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS rank
         |        FROM nodes CROSS JOIN nn),
         |${(1 to Iters).map(i => iterCteOn("a", "b1e", "adeg", i)).mkString(",\n")},
         |br0 AS (SELECT node, rank FROM ar$Iters),
         |${(1 to WarmIters).map(i => iterCteOn("b", "edges", "bdeg", i)).mkString(",\n")}
         |SELECT phase, node, rank FROM (
         |  SELECT '1_after_b1' AS phase, node, rank FROM
         |    (SELECT node, rank FROM ar$Iters ORDER BY rank DESC, node LIMIT 20)
         |  UNION ALL
         |  SELECT '2_after_b2', node, rank FROM
         |    (SELECT node, rank FROM br$WarmIters ORDER BY rank DESC, node LIMIT 20))
         |ORDER BY phase, rank DESC, node""".stripMargin,

    // The residual-push chain replayed end to end: bootstrap power
    // iterations on the b1 graph, the exact in-sum/degree state, the
    // delta fold's re-split + gains, then every synchronous push round.
    "q214_pagerank_push" ->
      s"""WITH nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents),
         |nn AS MATERIALIZED (SELECT count(*) AS n FROM documents),
         |cand AS (SELECT doc_id AS src, x.r FROM documents
         |         CROSS JOIN (SELECT unnest(range(3)) AS r) x),
         |x0 AS (SELECT src, src * 7 + r AS x FROM cand),
         |x1 AS (SELECT src, (xor(x % 2147483648, (x % 2147483648) >> 16) * 73244475) % 2147483648 AS h FROM x0),
         |x2 AS (SELECT src, (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM x1),
         |edges AS MATERIALIZED (SELECT DISTINCT src, xor(h, h >> 16) % nn.n AS dst
         |          FROM x2 CROSS JOIN nn),
         |b1e AS MATERIALIZED (SELECT * FROM edges WHERE (src + dst) % 97 <> 0),
         |adeg AS MATERIALIZED (SELECT src, count(*) AS deg FROM b1e GROUP BY 1),
         |bs AS MATERIALIZED (SELECT (1000000000000 * 15) // (100 * n) AS b,
         |              GREATEST(1, 1000000000000 // (n * 8)) AS e FROM nn),
         |ar0 AS (SELECT node, CAST(1000000000000 // nn.n AS BIGINT) AS rank
         |        FROM nodes CROSS JOIN nn),
         |${(1 to PushIters).map(i => iterCteOn("a", "b1e", "adeg", i)).mkString(",\n")},
         |s0 AS (SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS s
         |       FROM b1e e JOIN ar$PushIters r ON e.src = r.node
         |       JOIN adeg d ON e.src = d.src
         |       GROUP BY 1),
         |st0 AS MATERIALIZED (SELECT n2.node, r.rank AS x, COALESCE(s0.s, 0) AS s,
         |               COALESCE(ad.deg, 0) AS deg
         |        FROM nodes n2 JOIN ar$PushIters r ON n2.node = r.node
         |        LEFT JOIN s0 ON n2.node = s0.node
         |        LEFT JOIN adeg ad ON n2.node = ad.src),
         |dd AS (SELECT src, count(*) AS dd FROM edges
         |       WHERE (src + dst) % 97 = 0 GROUP BY 1),
         |srcst AS (SELECT st.node AS src, st.x, st.deg AS old_deg,
         |                 st.deg + dd.dd AS new_deg
         |          FROM st0 st JOIN dd ON st.node = dd.src),
         |resplit AS (SELECT e.dst AS node,
         |    CAST(SUM(s.x // s.new_deg - s.x // s.old_deg) AS BIGINT) AS d
         |  FROM b1e e JOIN srcst s ON e.src = s.src GROUP BY 1),
         |gains AS (SELECT e.dst AS node,
         |    CAST(SUM(s.x // s.new_deg) AS BIGINT) AS d
         |  FROM edges e JOIN srcst s ON e.src = s.src
         |  WHERE (e.src + e.dst) % 97 = 0 GROUP BY 1),
         |dsum AS (SELECT node, CAST(SUM(d) AS BIGINT) AS d FROM
         |           (SELECT * FROM resplit UNION ALL SELECT * FROM gains)
         |         GROUP BY 1),
         |p0 AS MATERIALIZED (SELECT st.node, st.x,
         |              st.s + COALESCE(ds.d, 0) AS s,
         |              st.deg + COALESCE(dd.dd, 0) AS deg
         |       FROM st0 st LEFT JOIN dsum ds ON st.node = ds.node
         |       LEFT JOIN dd ON st.node = dd.src),
         |${(1 to PushRounds).map(pushCte).mkString(",\n")}
         |SELECT phase, node, rank, resid FROM (
         |  SELECT '1_after_b1' AS phase, node, rank, resid FROM
         |    (SELECT st.node, st.x AS rank,
         |            bs.b + (85 * st.s) // 100 - st.x AS resid
         |     FROM st0 st CROSS JOIN bs ORDER BY st.x DESC, st.node LIMIT 20)
         |  UNION ALL
         |  SELECT '2_after_b2', node, rank, resid FROM
         |    (SELECT p.node, p.x AS rank,
         |            bs.b + (85 * p.s) // 100 - p.x AS resid
         |     FROM p$PushRounds p CROSS JOIN bs
         |     ORDER BY p.x DESC, p.node LIMIT 20))
         |ORDER BY phase, rank DESC, node""".stripMargin,

    // The chained incremental-components oracle: recursive min-reachable
    // label on the batch-1 graph and on the union — exactly the state the
    // label-graph merge must reproduce.
    "q202_incremental_components" ->
      """WITH RECURSIVE nn AS (SELECT count(*) AS n FROM documents),
        |d AS (SELECT doc_id FROM documents),
        |y0 AS (SELECT doc_id AS src, doc_id * 11 + 1 AS x FROM d
        |       WHERE doc_id % 7 = 0),
        |y1 AS (SELECT src, (xor(x % 2147483648, (x % 2147483648) >> 16) * 73244475) % 2147483648 AS h FROM y0),
        |y2 AS (SELECT src, (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM y1),
        |e0 AS (SELECT src, xor(h, h >> 16) % nn.n AS dst FROM y2 CROSS JOIN nn
        |       WHERE src <> xor(h, h >> 16) % nn.n),
        |b1u AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |        FROM e0 WHERE (src + dst) % 3 <> 0),
        |fu AS (SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
        |       FROM e0),
        |e1 AS (SELECT u AS src, v AS dst FROM b1u UNION SELECT v, u FROM b1u),
        |ef AS (SELECT u AS src, v AS dst FROM fu UNION SELECT v, u FROM fu),
        |r1(id, r) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT r1.id, e.dst FROM r1 JOIN e1 e ON r1.r = e.src),
        |rf(id, r) AS (
        |  SELECT doc_id, doc_id FROM d
        |  UNION
        |  SELECT rf.id, e.dst FROM rf JOIN ef e ON rf.r = e.src)
        |SELECT phase, node, component_id FROM (
        |  SELECT '1_after_b1' AS phase, id AS node, MIN(r) AS component_id
        |  FROM r1 GROUP BY id
        |  UNION ALL
        |  SELECT '2_after_b2', id, MIN(r) FROM rf GROUP BY id)
        |ORDER BY phase, node""".stripMargin,

    // The chained incremental-BFS oracle: both phases' frontiers unrolled
    // from scratch — equality with the engine's relaxation-from-delta
    // state IS the incremental ≡ recount proof.
    "q200_incremental_bfs" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |cand AS (SELECT doc_id AS src, x.r FROM documents
         |         CROSS JOIN (SELECT unnest(range(3)) AS r) x),
         |x0 AS (SELECT src, src * 7 + r AS x FROM cand),
         |x1 AS (SELECT src, (xor(x % 2147483648, (x % 2147483648) >> 16) * 73244475) % 2147483648 AS h FROM x0),
         |x2 AS (SELECT src, (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM x1),
         |edges AS (SELECT DISTINCT src, xor(h, h >> 16) % nn.n AS dst
         |          FROM x2 CROSS JOIN nn),
         |b1 AS (SELECT * FROM edges WHERE (src + dst) % 5 <> 0),
         |pd0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
         |pf0 AS (SELECT node FROM pd0),
         |${(1 to BfsRounds).map(k => bfsCteOn("p", "b1", k)).mkString(",\n")},
         |qd0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
         |qf0 AS (SELECT node FROM qd0),
         |${(1 to BfsRounds).map(k => bfsCteOn("q", "edges", k)).mkString(",\n")}
         |SELECT phase, dist, n_nodes FROM (
         |  SELECT '1_after_b1' AS phase, dist, count(*) AS n_nodes
         |  FROM pd$BfsRounds GROUP BY 1, 2
         |  UNION ALL
         |  SELECT '2_after_b2', dist, count(*) FROM qd$BfsRounds GROUP BY 1, 2)
         |ORDER BY phase, dist""".stripMargin,

    "q187_bfs_reach" ->
      s"""WITH nn AS (SELECT count(*) AS n FROM documents),
         |cand AS (SELECT doc_id AS src, x.r FROM documents
         |         CROSS JOIN (SELECT unnest(range(3)) AS r) x),
         |x0 AS (SELECT src, src * 7 + r AS x FROM cand),
         |x1 AS (SELECT src, (xor(x % 2147483648, (x % 2147483648) >> 16) * 73244475) % 2147483648 AS h FROM x0),
         |x2 AS (SELECT src, (xor(h, h >> 13) * 73244475) % 2147483648 AS h FROM x1),
         |edges AS (SELECT DISTINCT src, xor(h, h >> 16) % nn.n AS dst
         |          FROM x2 CROSS JOIN nn),
         |d0 AS (SELECT CAST(0 AS BIGINT) AS node, CAST(0 AS BIGINT) AS dist),
         |f0 AS (SELECT node FROM d0),
         |${(1 to BfsRounds).map(bfsCte).mkString(",\n")}
         |SELECT dist, count(*) AS n_nodes FROM d$BfsRounds
         |GROUP BY 1 ORDER BY 1""".stripMargin
  )

  /** [[iterCte]] parameterized over prefix/edges/degree CTE names — q201
    * unrolls a cold chain on batch-1 edges and a warm chain on the full
    * graph from the cold chain's final vector. */
  private def iterCteOn(p: String, edgesCte: String, degCte: String,
                        i: Int): String =
    s"""${p}c$i AS (SELECT e.dst AS node, CAST(SUM(r.rank // d.deg) AS BIGINT) AS s
       |  FROM $edgesCte e JOIN ${p}r${i - 1} r ON e.src = r.node
       |  JOIN $degCte d ON e.src = d.src
       |  GROUP BY 1),
       |${p}r$i AS (SELECT nodes.node,
       |    CAST((1000000000000 * 15) // (100 * nn.n)
       |         + (85 * COALESCE(${p}c$i.s, 0)) // 100 AS BIGINT) AS rank
       |  FROM nodes CROSS JOIN nn LEFT JOIN ${p}c$i ON nodes.node = ${p}c$i.node)"""
      .stripMargin

  /** One synchronous residual-push round for the q214 oracle: the heavy
    * set absorbs its residual, its out-neighbors' in-sums absorb the
    * DIFFERENCE of truncated contributions — the bit-exact twin of
    * [[graft.operators.Rank.pageRankPush]]'s round. */
  private def pushCte(i: Int): String =
    s"""h$i AS (SELECT p.node, p.x, p.deg,
       |    bs.b + (85 * p.s) // 100 - p.x AS r
       |  FROM p${i - 1} p CROSS JOIN bs
       |  WHERE abs(bs.b + (85 * p.s) // 100 - p.x) > bs.e),
       |hds$i AS (SELECT e.dst AS node,
       |    CAST(SUM((h.x + h.r) // h.deg - h.x // h.deg) AS BIGINT) AS d
       |  FROM edges e JOIN h$i h ON e.src = h.node
       |  GROUP BY 1),
       |p$i AS (SELECT p.node,
       |    p.x + COALESCE(h.r, 0) AS x,
       |    p.s + COALESCE(d.d, 0) AS s, p.deg
       |  FROM p${i - 1} p LEFT JOIN h$i h ON p.node = h.node
       |  LEFT JOIN hds$i d ON p.node = d.node)"""
      .stripMargin

  /** [[bfsCte]] parameterized over the edge CTE and a name prefix — q200
    * unrolls TWO frontiers (batch-1 graph, union graph) in one oracle. */
  private def bfsCteOn(p: String, edgesCte: String, k: Int): String =
    s"""${p}f$k AS (SELECT DISTINCT e.dst AS node
       |  FROM $edgesCte e JOIN ${p}f${k - 1} f ON e.src = f.node
       |  WHERE e.dst NOT IN (SELECT node FROM ${p}d${k - 1})),
       |${p}d$k AS (SELECT node, dist FROM ${p}d${k - 1}
       |  UNION ALL SELECT node, CAST($k AS BIGINT) AS dist FROM ${p}f$k)"""
      .stripMargin

  private def bfsCte(k: Int): String =
    s"""f$k AS (SELECT DISTINCT e.dst AS node
       |  FROM edges e JOIN f${k - 1} f ON e.src = f.node
       |  WHERE e.dst NOT IN (SELECT node FROM d${k - 1})),
       |d$k AS (SELECT node, dist FROM d${k - 1}
       |  UNION ALL SELECT node, CAST($k AS BIGINT) AS dist FROM f$k)"""
      .stripMargin
}
