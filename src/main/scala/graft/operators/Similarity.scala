package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`Array[Float]`).
  *
  * Two paths:
  *   - [[bruteForceTopK]]: exact cosine top-k — the baseline and verifier.
  *     Query side broadcasts; corpus scans once; per-query top-k via
  *     row_number. Cost O(|queries| × |corpus|) — fine for small query sets,
  *     the reason the LSH path exists.
  *   - [[lshTopK]]: random-hyperplane LSH — corpus bucketed by sign-bit
  *     bands, candidates only from colliding buckets, exact cosine re-rank.
  *     Candidate generation is linear in corpus size; recall trades against
  *     bands/bits (DedupSpec-style recall property in SimilaritySpec).
  *
  * All arithmetic is pure Column expressions (zip_with + aggregate in
  * doubles) — no UDF, stays codegen-friendly.
  */
object Similarity {

  /** Dot product of two array columns, accumulated in double — composed
    * built-in form (zip_with + aggregate). Kept as the reference
    * implementation; the hot paths use [[dotNative]]. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Fused native dot product (one codegen'd loop, literals out of the
    * generated source) — same semantics as [[dot]] for float/double arrays
    * (SimilaritySpec asserts bit-equality). */
  def dotNative(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.DotProduct.column(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity via the native fused Catalyst expression (one
    * codegen'd loop — the ANN hot path); null on zero norm. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.CosineSimilarity.column(a, b)

  /** Composed built-in form — identical semantics to [[cosine]]
    * (SimilaritySpec asserts bit-equality); kept as the reference
    * implementation and for float-typed arrays wrapped differently. */
  def cosineComposed(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val denom = norm(a) * norm(b)
    when(denom > 0, d / denom)
  }

  /** Default ceiling for the O(n²)/broadcast verifier paths. Generous for a
    * verification sample, far below where the broadcast (8 GB Spark cap) or
    * the quadratic compare would die at cluster scale. */
  val MaxExactRows: Long = 200000L

  /** Guard rail for the exact verifiers: they broadcast a whole side and do
    * quadratic work BY DESIGN, so an accidental 100×-scale invocation must
    * fail fast with advice, not OOM the driver two hours in. The count is one
    * cheap aggregate over the (pruned) side being broadcast. */
  private def requireExactScale(df: DataFrame, what: String, max: Long,
                                alternative: String): Unit = {
    val n = df.count()
    require(n <= max,
      s"$what has $n rows > $max: this is the exact/quadratic verifier — " +
        s"use $alternative at scale, or raise maxRows explicitly for a bounded sample")
  }

  /** Exact cosine top-k: for each row of `queries`, the `k` nearest corpus
    * rows (self-matches excluded by id). Scores round to 4dp BEFORE ranking
    * so ranking is stable across accumulation orders; ties break by corpus
    * id. Cost O(|queries| × |corpus|) with `queries` broadcast — the guard
    * trips on an unboundedly large query side. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int,
                     maxRows: Long = MaxExactRows): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("__nq"))
    requireExactScale(q, "query set", maxRows, "lshTopK/ivfTopK/pqTopK")
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("__nc"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", graft.functions.Rounding.roundLikeC(
        hoistedCosine(dotNative(col("qv"), col("cv")), col("__nq"), col("__nc")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "vec_id", "score")
  }

  /** Hard-negative mining for contrastive/retrieval training: for each
    * query, the `k` HIGHEST-cosine corpus vectors whose label DIFFERS —
    * the near-miss examples a dual encoder learns most from (random
    * negatives are trivially separable; the hard ones sit just across the
    * decision boundary). Same exact-verifier shape and guard as
    * [[bruteForceTopK]]; at scale, mine from an ANN candidate pool
    * ([[lshTopK]]/[[ivfTopK]] with k ≫ target, label-filter, re-cut)
    * instead of the exact scan. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int,
                    maxRows: Long = MaxExactRows): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      col(labelCol).as("__ql"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("__nq"))
    requireExactScale(q, "query set", maxRows, "an ANN pool + label filter")
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"),
      col(labelCol).as("__cl"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("__nc"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id") && col("__cl") =!= col("__ql"))
      .withColumn("score", graft.functions.Rounding.roundLikeC(
        hoistedCosine(dotNative(col("qv"), col("cv")), col("__nq"), col("__nc")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col("vec_id"), col("__cl").as("neg_label"),
        col("score"))
  }

  /** Deterministic Rademacher (±1) hyperplanes from the portable
    * [[graft.functions.PortableHash.mixp]] mixer — sign-random-projection
    * LSH admits any symmetric component distribution, and ±1 components
    * over INTEGER-QUANTIZED vectors make every bucket bit exact integer
    * arithmetic both engines reproduce bit-for-bit (the affine mix2 is NOT
    * usable here: its periodic low bits gave planes that collapsed recall
    * to 0.22). Signs come back as doubles for the native dot kernel —
    * integer-valued doubles, so the arithmetic stays exact. */
  private[operators] def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Seq[Double]] = {
    val offset = seed * 16777619L
    Seq.tabulate(nPlanes)(p => Seq.tabulate(dim) { d =>
      if (graft.functions.PortableHash.mixp(offset + p.toLong * dim + d) % 2L == 0L) 1.0 else -1.0
    })
  }

  /** Sign-bit signature per band: each band packs `bitsPerBand` hyperplane
    * signs into an int bucket key. Returns (id, band, bucket) rows.
    *
    * Vectors quantize to integers (`round(x * 10^4)`, exact in double) so
    * each sign bit is a comparison on an exact integer dot product — no
    * float summation-order hazard, which is what lets the q32 oracle
    * replicate bucket assignment exactly. The 1e-4 quantization is far
    * below the angular resolution LSH operates at, so recall is
    * unaffected (measured: identical recall grid vs gaussian planes). */
  private def banded(df: DataFrame, idCol: String, vecCol: String,
                     bands: Int, bitsPerBand: Int, dim: Int, seed: Long): DataFrame = {
    val planes = hyperplanes(bands * bitsPerBand, dim, seed)
    val qx = transform(col(vecCol).cast("array<double>"), x => round(x * lit(10000.0d)))
    // ALL band buckets in one native expression (SignBandSignature): the
    // earlier bands × bits composed dot-product columns unrolled one loop
    // per literal hyperplane into the projection, and the generated method
    // drifted past JIT-friendly sizes as surrounding codegen grew (q32
    // 1.07 s → 1.8 s isolated); the fused loop's code size is constant in
    // bands × bits × dim. Same arithmetic bit-for-bit — ascending-order
    // double accumulation, strict > 0 — so the q32 oracle is unaffected.
    val sig = org.apache.spark.sql.graft.SignBandSignature.column(qx, planes, bitsPerBand)
    df.select(col(idCol).as("id"), posexplode(sig).as(Seq("band", "bucket")))
  }

  /** Deterministic hash-sampled initial centroids for the IVF coarse
    * quantizer — no global sort (a single-partition row_number window would
    * funnel the whole corpus through one task); the ~nList sampled vectors
    * are tiny and collect to the driver to get stable cell ids. Vectors come
    * back widened to double (exact). Selection uses the engine-portable
    * [[Packing.mix2]] LCG (pure integer arithmetic) so an external oracle
    * can reproduce the exact centroid choice. */
  private[graft] def sampledCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, nList: Int): Seq[(Int, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sampled = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      // top-nList by hash order = uniform sample via TakeOrderedAndProject
      // (no global sort materializes); id tiebreak keeps it total
      .orderBy(Packing.mix2(col(idCol)), col(idCol))
      .limit(nList)
      .as[(Long, Seq[Double])].collect()
    require(sampled.nonEmpty, "corpus too small to sample centroids")
    sampled.toSeq.zipWithIndex.map { case ((_, v), i) => (i, v) }
  }

  /** Lloyd refinement of IVF centroids (spherical k-means in all but the
    * final normalization, which cosine makes redundant): assign every corpus
    * vector to its argmax-cosine centroid, recompute each centroid as the
    * element-wise mean of its members, repeat. An empty cell keeps its old
    * centroid.
    *
    * Scale: assignment is a broadcast pass; the mean is computed per
    * (cell, position) via posexplode + partial-aggregated avg — one shuffle
    * of nList × dim running sums, never the vectors themselves. Only the
    * k × dim centroid matrix ever reaches the driver (it must: the next
    * iteration broadcasts it).
    */
  private[graft] def refineCentroids(corpus: DataFrame, idCol: String,
      vecCol: String, init: Seq[(Int, Seq[Double])],
      iters: Int): Seq[(Int, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    var cents = init
    for (_ <- 0 until iters) {
      // argmax as a single projection over the literal centroid array (see
      // ivfTopK.assign — the crossJoin + window form shuffles corpus×nList)
      val centArr = typedlit(cents.map { case (cell, v) => (v, cell) })
      val pick = array_min(transform(centArr, c =>
        struct(coalesce(-cosine(col(vecCol), c.getField("_1")), lit(Double.MaxValue)).as("negsim"),
          c.getField("_2").as("cell"))))
      val assigned = corpus
        .select(pick.getField("cell").as("cell"),
          col(vecCol).cast("array<double>").as("__v"))
      val means = assigned
        .select(col("cell"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy("cell", "pos").agg(avg(col("x")).as("m"))
        .as[(Int, Int, Double)].collect()
      val byCell = means.groupBy(_._1).view
        .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
      cents = cents.map { case (c, old) => (c, byCell.getOrElse(c, old)) }
    }
    cents
  }

  /** IVF (inverted-file) ANN: a coarse quantizer of `nList` centroids
    * (deterministic corpus sample, optionally Lloyd-refined with
    * `refineIters` k-means sweeps) partitions the corpus into cells; each
    * query probes its `nProbe` nearest cells and re-ranks exactly inside
    * them. Complements [[lshTopK]]: IVF adapts to the data distribution
    * (clustered embeddings → tight cells), LSH is distribution-free.
    *
    * Scale: assignment is one broadcast pass (centroids are tiny); the
    * candidate join shuffles on the cell id — candidates ≈ corpus ×
    * nProbe/nList, linear in corpus size. The default 6/8 probe fraction
    * buys recall@10 ≥ 0.9 on the weakly-clustered synthetic fixture; a
    * genuinely clustered embedding corpus (the 100 TB case IVF exists for)
    * runs nList in the thousands with nProbe/nList ≪ 1.
    */
  /** `keep`-nearest-centroid cell assignment as ONE projection: transform
    * over the literal centroid array → (negated 4dp-rounded sim, cell)
    * structs → array_sort → slice(keep) → explode. No crossJoin, no shuffle
    * — the crossJoin + row_number window form shuffled corpus × nList rows,
    * which at a production nList (thousands of cells) multiplies the corpus
    * thousands-fold before the window cuts it back down. (The centroid
    * matrix rides the plan as a literal — nList × dim doubles, ~2 MB at
    * nList=4096/dim=64 — well under task-binary limits.)
    *
    * 4dp rounding before the argmax: raw doubles one ULP apart across
    * engines could flip it; ties break by cell id (ascending struct order
    * on (negsim, cell)) — deterministic everywhere, and a 1e-4 quantization
    * of the COARSE quantizer costs no recall. Zero-norm vectors (null
    * cosine) coalesce past every real score, keeping the nulls-last order. */
  private[graft] def assignCells(df: DataFrame, cents: Seq[(Int, Seq[Double])],
      idOut: String, vecCol: String, keep: Int): DataFrame = {
    val centArr = typedlit(cents.map { case (cell, v) => (v, cell) })
    val scored = transform(centArr, c =>
      struct(
        coalesce(-graft.functions.Rounding.roundLikeC(
          cosine(col(vecCol), c.getField("_1")), 4), lit(Double.MaxValue))
          .as("negsim"),
        c.getField("_2").as("cell")))
    df.select(col(idOut), col(vecCol),
        explode(slice(array_sort(scored), 1, keep)).as("__t"))
      .select(col(idOut), col("__t.cell").as("cell"), col(vecCol))
  }

  /** Persisted IVF index state — the incremental member of the ANN family
    * (the similarity sibling of [[graft.operators.Dedup.advanceBandedIndex]]
    * and the curation index): `cells` is the stored (vec_id, cell, vector)
    * assignment table, `cents` the FROZEN coarse quantizer. [[append]]
    * assigns a new-vector batch with the frozen quantizer — one broadcast
    * projection pass over the batch, the corpus is never re-quantized or
    * re-shuffled — and [[topK]] serves queries against the union. This is
    * how production IVF deployments actually grow (FAISS `add` after
    * `train`): re-clustering is a periodic REBUILD decision, not a
    * per-batch cost; monitor drift by comparing per-cell populations and
    * rebuild when they skew. q140 oracle-checks build → append → query
    * end to end. */
  final case class IvfIndex(cells: DataFrame, cents: Seq[(Int, Seq[Double])],
                            vecCol: String) {
    /** Assign `batch` (idCol, vecCol) with the frozen quantizer and append
      * — batch-sized work only. */
    def append(batch: DataFrame, idCol: String): IvfIndex = copy(
      cells = cells.unionByName(assignCells(
        batch.withColumnRenamed(idCol, "vec_id"), cents, "vec_id", vecCol, keep = 1)
        .withColumnRenamed(vecCol, "cv")))
    /** Probe `nProbe` cells per query over the CURRENT index state, exact
      * re-rank inside them ([[ivfTopK]]'s query path over the stored
      * cells). */
    def topK(queries: DataFrame, idCol: String, k: Int, nProbe: Int = 6): DataFrame = {
      val queryCells = assignCells(queries.withColumnRenamed(idCol, "query_id"),
          cents, "query_id", vecCol, keep = nProbe)
        .withColumnRenamed(vecCol, "qv")
      val scored = queryCells.join(cells, "cell")
        .filter(col("vec_id") =!= col("query_id"))
        .withColumn("score",
          graft.functions.Rounding.roundLikeC(cosine(col("qv"), col("cv")), 4))
      val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
      scored.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= k)
        .select("query_id", "vec_id", "score")
    }
  }

  /** Cell-occupancy health report for a grown [[IvfIndex]] — the RETRAIN
    * TRIGGER the train-then-add protocol needs: the coarse quantizer is
    * frozen at build time, so as appended batches drift away from the
    * training distribution, vectors pile into few cells and probe cost
    * degrades toward a linear scan. FAISS's imbalance factor
    * `nlist · Σc²/n²` (1.0 = perfectly balanced, nlist = everything in
    * one cell) quantifies it; past `retrainAt` the report says rebuild.
    *
    * Emits one row per TRAINED cell (empty cells included — a starved
    * quantizer is the other drift signal): (cell, n_vecs, cell_frac,
    * n_total, n_empty_cells, imbalance_factor, needs_retrain). The flag
    * compares on the 4dp-ROUNDED factor so every engine renders the same
    * verdict at the boundary.
    *
    * Scale shape: one partial-agg'd count over the stored cells (output
    * is nlist rows), the centroid list is driver-held by construction
    * (the codebook), and the 1-row global fold broadcasts back — nothing
    * corpus-sized moves. */
  def ivfBalanceReport(index: IvfIndex, retrainAt: Double = 2.0): DataFrame = {
    import graft.functions.Rounding.roundLikeC
    val spark = index.cells.sparkSession
    import spark.implicits._
    val allCells = index.cents.map(_._1).toDF("cell")
    val filled = allCells
      .join(index.cells.groupBy("cell").agg(count(lit(1)).as("n_vecs")),
        Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n_vecs"), lit(0L)).as("n_vecs"))
    val g = filled.agg(
      sum("n_vecs").as("n_total"),
      sum(col("n_vecs") * col("n_vecs")).as("__ss"),
      sum(when(col("n_vecs") === 0, 1L).otherwise(0L)).as("n_empty_cells"))
    val nList = index.cents.size
    filled.crossJoin(broadcast(g))
      .select(col("cell"), col("n_vecs"),
        roundLikeC(col("n_vecs").cast("double") / col("n_total"), 4).as("cell_frac"),
        col("n_total"), col("n_empty_cells"),
        roundLikeC(lit(nList) * col("__ss").cast("double") /
          (col("n_total") * col("n_total")).cast("double"), 4).as("imbalance_factor"))
      .withColumn("needs_retrain", col("imbalance_factor") > retrainAt)
  }

  /** Train the coarse quantizer on `corpus` and assign it — the one-time
    * build [[IvfIndex.append]] then grows batch by batch. */
  def buildIvfIndex(corpus: DataFrame, idCol: String, vecCol: String,
                    nList: Int = 8, refineIters: Int = 0): IvfIndex = {
    val cents = refineCentroids(corpus, idCol, vecCol,
      sampledCentroids(corpus, idCol, vecCol, nList), refineIters)
    IvfIndex(assignCells(corpus.withColumnRenamed(idCol, "vec_id"),
      cents, "vec_id", vecCol, keep = 1).withColumnRenamed(vecCol, "cv"),
      cents, vecCol)
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, nList: Int = 8, nProbe: Int = 6,
              refineIters: Int = 0): DataFrame = {
    val cents = refineCentroids(corpus, idCol, vecCol,
      sampledCentroids(corpus, idCol, vecCol, nList), refineIters)

    val corpusCells = assignCells(corpus.withColumnRenamed(idCol, "vec_id"),
        cents, "vec_id", vecCol, keep = 1)
      .withColumnRenamed(vecCol, "cv")
    val queryCells = assignCells(queries.withColumnRenamed(idCol, "query_id"),
        cents, "query_id", vecCol, keep = nProbe)
      .withColumnRenamed(vecCol, "qv")

    val scored = queryCells.join(corpusCells, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("score", graft.functions.Rounding.roundLikeC(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "vec_id", "score")
  }

  /** SemDeDup — semantic deduplication by cluster-then-compare (Abbas et
    * al. 2023, arXiv:2303.09540): cluster the embedding corpus with the IVF
    * coarse quantizer, compare cosine only WITHIN each cluster, and drop
    * every vector that has a lower-id in-cluster neighbor at or above
    * `threshold` (keep-lowest-id is the deterministic stand-in for the
    * paper's keep-farthest-from-centroid — the dedup set is the same, the
    * chosen representative differs). Returns every corpus row as
    * (vec_id, cell, kept).
    *
    * Scale: the whole point of clustering first is that pairwise work is
    * quadratic only per cell, linear overall when `nList` grows with the
    * corpus (paper uses ~100k clusters for LAION — cells of a few thousand
    * rows). Assignment is one broadcast projection pass ([[assignCells]]);
    * the compare is a self-join on the cell id — ONE shuffle keyed by cell.
    * Norms are hoisted (one sqrt per row, not per pair). A pathological
    * cell (every row identical → one giant cell) degrades to jaccard-style
    * skew; mitigate upstream with exact dedup first, or raise `nList`.
    *
    * Dropped-if-lower-id-neighbor is evaluated on the FULL cell membership
    * (not only against kept rows): a chain a~b, b~c with cos(a,c) below
    * threshold drops BOTH b and c. This transitive-reach-free rule needs no
    * iteration (connected components would — that is [[Dedup.dupClusters]]'
    * job) and matches the paper's ε-ball sweep. */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
               threshold: Double, nList: Int = 8,
               refineIters: Int = 0): DataFrame = {
    val cents = refineCentroids(corpus, idCol, vecCol,
      sampledCentroids(corpus, idCol, vecCol, nList), refineIters)
    val cells = assignCells(
        corpus.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("__v")),
        cents, "vec_id", "__v", keep = 1)
      .withColumn("__n", sqrt(dotNative(col("__v"), col("__v"))))
    val a = cells.select(col("cell"), col("vec_id").as("id_a"),
      col("__v").as("va"), col("__n").as("na"))
    val b = cells.select(col("cell"), col("vec_id").as("id_b"),
      col("__v").as("vb"), col("__n").as("nb"))
    val dropped = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(graft.functions.Rounding.roundLikeC(
        hoistedCosine(dotNative(col("va"), col("vb")), col("na"), col("nb")), 4)
        >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    cells.join(dropped.withColumn("__dup", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"), col("__dup").isNull.as("kept"))
  }

  /** Embedding-cosine near-duplicate pairs — exact pairwise verifier.
    * Upper-triangle self-join (id_a < id_b), fused-cosine score rounded to
    * 4dp BEFORE the threshold test so the cut is reproducible across
    * engines and accumulation orders.
    *
    * Cost is O(n²) — this is the verifier, usable when one side fits in a
    * broadcast (queries-vs-corpus blocks at scale); [[cosineDupPairs]] is
    * the linear-candidate scale path.
    */
  /** Per-pair cosine with the norms HOISTED to one sqrt per row: the native
    * kernel's denominator is `sqrt(na)*sqrt(nb)` (CosineSimilarity.scala:57),
    * so `dot/(normA*normB)` with precomputed norms is bit-identical — same
    * values through the same IEEE ops — at a third of the per-pair flops
    * (64 mults vs 192 + two sqrts). Null on zero norm, like the kernel. */
  private def hoistedCosine(dotAB: Column, normA: Column, normB: Column): Column = {
    val denom = normA * normB
    when(denom > 0, dotAB / denom)
  }

  def cosineDupPairsExact(corpus: DataFrame, idCol: String, vecCol: String,
                          threshold: Double,
                          maxRows: Long = MaxExactRows): DataFrame = {
    // The stream side is HASH-SPREAD on the id before the broadcast
    // nested-loop join: the O(n²·d) cosine kernel inherits the stream
    // side's partitioning, and a narrow scan (one file, one task) would
    // run the whole quadratic kernel serially on one core (measured: q44
    // 3.6 s wall ≈ 4.4 s single-task time at sf0.1). The explicit
    // repartition pins kernel spread at cluster parallelism at EVERY
    // scale; its cost — one exchange of (id, vec, norm) rows — is linear
    // and strictly dominated by the quadratic kernel it balances (it also
    // guards the skew case where most input files are small, guide §2.5).
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"),
        sqrt(dotNative(col(vecCol), col(vecCol))).as("__na"))
      .repartition(par, col("id_a"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("__nb"))
    requireExactScale(b, "corpus", maxRows, "cosineDupPairs")
    a.crossJoin(broadcast(b))
      .filter(col("id_a") < col("id_b"))
      .withColumn("score",
        graft.functions.Rounding.roundLikeC(
          hoistedCosine(dotNative(col("va"), col("vb")), col("__na"), col("__nb")), 4))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }

  /** Embedding-cosine near-duplicate pairs — LSH-bucketed scale path.
    * Hyperplane sign bands generate candidate pairs (corpus self-join on
    * (band, bucket), upper triangle), then the exact cosine filter keeps
    * pairs at or above `threshold` (score rounded to 4dp first, like the
    * verifier).
    *
    * Recall: a pair colliding in ANY band is a candidate; positively scaled
    * duplicates (v, c·v) share every sign bit up to integer-quantization
    * flips on near-zero dots (measured: ≤1 bit in 32k on the clone
    * fixtures, never a whole band), so pure-rescale clones are found with
    * recall 1.0. General near-dups have recall < 1 governed by
    * bands × bitsPerBand (SimilaritySpec asserts ≥ brute-force agreement on
    * the clone fixture). Candidates are linear in corpus size for
    * well-spread buckets; precision is restored by the exact re-check, so
    * false bucket collisions only cost compute, never wrong rows.
    */
  def cosineDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, dim: Int, bands: Int = 8,
                     bitsPerBand: Int = 8, seed: Long = 42L): DataFrame = {
    val buckets = banded(corpus, idCol, vecCol, bands, bitsPerBand, dim, seed)
    val cands = buckets.join(
        buckets.withColumnRenamed("id", "id_b"), Seq("band", "bucket"))
      .filter(col("id") < col("id_b"))
      .select(col("id").as("id_a"), col("id_b"))
      .distinct()
    val a = corpus.select(col(idCol).as("id_a"), col(vecCol).as("va"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("__na"))
    val b = corpus.select(col(idCol).as("id_b"), col(vecCol).as("vb"),
      sqrt(dotNative(col(vecCol), col(vecCol))).as("__nb"))
    cands.join(a, "id_a").join(b, "id_b")
      .withColumn("score",
        graft.functions.Rounding.roundLikeC(
          hoistedCosine(dotNative(col("va"), col("vb")), col("__na"), col("__nb")), 4))
      .filter(col("score") >= threshold)
      .select("id_a", "id_b", "score")
  }

  /** The stored-vector table of a [[CosineLshIndex]]: each seen vector
    * ONCE, widened to double (exact), with its L2 norm precomputed so
    * verification never recomputes a seen sqrt. */
  private def storedVecs(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol).as("id"), v.as("vec"),
      sqrt(dotNative(v, v)).as("norm"))
  }

  /** Persisted sign-LSH index of a seen embedding corpus — the EMBEDDING
    * member of the incremental-dedup index family (MinHash bands q132,
    * repeated-span grams q134, SimHash chunks q143). Two tables:
    *
    *   - `bands` (band, bucket, id): hyperplane sign-band buckets,
    *     `nBands` rows per seen vector (~20 bytes each);
    *   - `vecs` (id, vec, norm): each seen vector stored once.
    *
    * The plane geometry (dim, nBands, bitsPerBand, seed) rides in the
    * index value itself, so every probe hashes its batch with the SAME
    * hyperplanes — mixing geometries is unrepresentable. Build once with
    * [[buildCosineLshIndex]], probe each batch with [[probe]], advance on
    * accepted survivors with [[advance]].
    *
    * 100 TB shape: a 10¹⁰-vector corpus at d=128 stores ~10 TB of doubles
    * + ~1.6 TB of band rows — both flat tables partitionable by their
    * join keys ((band, bucket) / id); per-batch probe cost is two index
    * scans regardless of history size (see [[probe]]), the
    * BENCH_INDEXSCALE-proven direction — WITH one sizing rule: false
    * bucket collisions arrive at a constant rate per (batch row, index
    * row) pair, so the candidate mass grows linearly in index size until
    * `bitsPerBand` gives the buckets room (measured: 8-bit buckets grow
    * the probe 5.7× over a 25× index; 16-bit buckets hold it flat at the
    * same recall structure — BENCH_INDEXSCALE_r07 §cosine). Size
    * 2^bitsPerBand ≫ corpusSize / tolerableCandidatesPerRow. Reference
    * anchor: the dedup sweep of `scripts/test/transform.py` on the
    * embedding modality, run as a daily increment instead of a corpus
    * recompute. */
  final case class CosineLshIndex(bands: DataFrame, vecs: DataFrame,
                                  dim: Int, nBands: Int, bitsPerBand: Int,
                                  seed: Long) {
    /** Batch-vs-seen cosine near-dup pairs WITHOUT touching the seen
      * corpus. The batch's sign-band buckets BROADCAST-probe the `bands`
      * table (the index streams through the join with no exchange and no
      * per-batch re-sort — the q143 probe direction), then the candidate
      * set (batch-bounded for well-spread buckets) broadcasts into the
      * `vecs` scan for the exact verify against the STORED vectors and
      * norms. Seen vectors are never re-read from the corpus and no seen
      * sqrt is recomputed.
      *
      * Emits (batch_id, seen_id, score) at the [[cosineDupPairs]] 4dp
      * rounded-then-thresholded cut. Recall follows [[cosineDupPairs]]:
      * rescale clones share every sign bit (recall 1.0, exact re-check
      * restores precision); general near-dups governed by
      * nBands × bitsPerBand. */
    def probe(batch: DataFrame, idCol: String, vecCol: String,
              threshold: Double): DataFrame = {
      val b = batch.select(col(idCol).as("batch_id"),
        col(vecCol).cast("array<double>").as("bvec"))
      val batchBands = banded(b, "batch_id", "bvec",
          nBands, bitsPerBand, dim, seed)
        .select(col("id").as("batch_id"), col("band"), col("bucket"))
      val cands = bands.join(broadcast(batchBands), Seq("band", "bucket"))
        .select(col("batch_id"), col("id").as("seen_id"))
        .distinct()
      val seenSide = vecs.join(broadcast(cands), vecs("id") === col("seen_id"))
        .select(col("batch_id"), col("seen_id"),
          col("vec").as("svec"), col("norm").as("snorm"))
      seenSide
        .join(b.withColumn("bnorm", sqrt(dotNative(col("bvec"), col("bvec")))),
          "batch_id")
        .withColumn("score",
          graft.functions.Rounding.roundLikeC(
            hoistedCosine(dotNative(col("bvec"), col("svec")),
              col("bnorm"), col("snorm")), 4))
        .filter(col("score") >= threshold)
        .select("batch_id", "seen_id", "score")
    }

    /** Advance on the accepted batch survivors: pure union on both
      * tables — existing index rows are never read, so chaining batches
      * costs O(batch) per advance (the [[advanceSimhashIndex]]
      * (Dedup.scala) contract on the embedding modality). */
    def advance(survivors: DataFrame, idCol: String, vecCol: String): CosineLshIndex =
      copy(
        bands = bands.unionByName(banded(survivors, idCol, vecCol,
          nBands, bitsPerBand, dim, seed)),
        vecs = vecs.unionByName(storedVecs(survivors, idCol, vecCol)))
  }

  /** The measured band-bucket sizing rule AS CODE (it was a scaladoc
    * footnote through r9, and a footnote is how an 8-bit index ends up in
    * production over a 10⁸-vector corpus): false bucket collisions arrive
    * at a constant rate per (batch row, index row, band) pair, so the
    * candidate mass grows LINEARLY in index size until `2^bitsPerBand`
    * outruns the corpus — measured on this suite, 8-bit buckets grew the
    * probe 5.7× over a 25× index while 16-bit buckets held it flat
    * (BENCH_INDEXSCALE_r07 §cosine, re-confirmed every round since).
    * Rule: `bits = clamp(ceil(log2(n)), 8, 24)` — bucket count at least
    * the index cardinality, so expected false collisions per (batch row,
    * band) stay O(1); floor 8 keeps small fixtures reproducible, cap 24
    * bounds the signature packing (LshSignature packs each band into an
    * int). */
  def autoBitsPerBand(indexCardinality: Long): Int = {
    val n = math.max(1L, indexCardinality)
    val ceilLog2 = 64 - java.lang.Long.numberOfLeadingZeros(n - 1)
    math.min(24, math.max(8, ceilLog2))
  }

  /** Build the persisted sign-LSH embedding index of a seen corpus (the
    * one-time cost [[CosineLshIndex.advance]] then grows batch by batch).
    *
    * `bitsPerBand <= 0` (the DEFAULT) auto-sizes from the seen
    * cardinality via [[autoBitsPerBand]] — one count() action at build
    * time, trivial against the banding pass itself — so the
    * production-safe geometry is what you get unless you pin one.
    * Fixture queries pin an explicit value: the oracle replays the
    * hyperplane arithmetic and the geometry must not drift with SF. Note
    * the geometry rides in the index — probes and [[CosineLshIndex
    * .advance]] reuse the build-time bits, so an index auto-sized at
    * build keeps its geometry as it grows (re-derive by REBUILDING when
    * the corpus outgrows it ~4×, the q166 retrain-loop discipline). */
  def buildCosineLshIndex(seen: DataFrame, idCol: String, vecCol: String,
                          dim: Int, bands: Int = 8, bitsPerBand: Int = 0,
                          seed: Long = 42L): CosineLshIndex = {
    val bits = if (bitsPerBand > 0) bitsPerBand
               else autoBitsPerBand(seen.count())
    CosineLshIndex(banded(seen, idCol, vecCol, bands, bits, dim, seed),
      storedVecs(seen, idCol, vecCol), dim, bands, bits, seed)
  }

  /** Integer quantization at 1e-4 (exact in double, exact in the oracle's
    * int64 — and far below PQ's own quantization error), optionally after
    * unit-norm scaling. Shared by the PQ family. */
  private[operators] def pqQuantize(v0: Array[Double], normalize: Boolean): Array[Double] = {
    val v = if (!normalize) v0 else {
      var s = 0.0; var i = 0
      while (i < v0.length) { s += v0(i) * v0(i); i += 1 }
      val n = math.sqrt(s)
      if (n > 0) v0.map(_ / n) else v0
    }
    v.map(x => math.round(x * 10000.0).toDouble)
  }

  private[operators] def pqL2(a: Array[Double], off: Int, c: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < c.length) { val d = a(off + i) - c(i); s += d * d; i += 1 }
    s
  }

  /** PQ codebook training — driver-side, on a deterministic mix2-hash-
    * ordered sample (codebook training is small-data by design; at scale
    * the SAMPLE, not the corpus, comes to the driver). Returns
    * (codebooks(m)(codebookSize)(sub), sub): stride-sampled codewords,
    * optionally Lloyd-refined per subspace. Shared by [[pqTopK]] and
    * [[ivfPqTopK]]. */
  private[operators] def pqCodebooks(corpus: DataFrame, idCol: String,
      vecCol: String, m: Int, codebookSize: Int, sampleN: Int,
      trainIters: Int = 0, normalize: Boolean = false): (Array[Array[Array[Double]]], Int) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val sample: Array[Array[Double]] = corpus
      .select(col(idCol).cast("long"), col(vecCol).cast("array<double>"))
      .orderBy(Packing.mix2(col(idCol)), col(idCol))
      .limit(sampleN)
      .as[(Long, Seq[Double])].collect().map(r => pqQuantize(r._2.toArray, normalize))
    require(sample.nonEmpty, "corpus too small to train PQ codebooks")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val sub = dim / m
    val codebooks: Array[Array[Array[Double]]] = Array.tabulate(m) { s =>
      val off = s * sub
      var cents = Array.tabulate(math.min(codebookSize, sample.length)) { j =>
        java.util.Arrays.copyOfRange(sample(j * sample.length / math.min(codebookSize, sample.length)), off, off + sub)
      }
      for (_ <- 0 until trainIters) {
        val sums = Array.fill(cents.length)(new Array[Double](sub))
        val counts = new Array[Int](cents.length)
        sample.foreach { v =>
          var best = 0; var bestD = Double.MaxValue; var j = 0
          while (j < cents.length) {
            val d = pqL2(v, off, cents(j)); if (d < bestD) { bestD = d; best = j }; j += 1
          }
          counts(best) += 1
          var i = 0
          while (i < sub) { sums(best)(i) += v(off + i); i += 1 }
        }
        cents = cents.zipWithIndex.map { case (c, j) =>
          if (counts(j) == 0) c else sums(j).map(_ / counts(j))
        }
      }
      cents
    }
    (codebooks, sub)
  }

  /** Per-query ADC lookup tables: built DISTRIBUTED (each query partition
    * dots its vectors against the broadcast codebooks); only the finished
    * tables — m × codebookSize doubles each, ~1 KB at the defaults, never
    * the raw vectors — come back for the scan broadcast. Every
    * candidate×query scan needs every table, so the query-set size is the
    * broadcast bound: `maxQueries` × 1 KB, require'd rather than
    * discovered as an OOM. Shared by [[pqTopK]] and [[ivfPqTopK]]. */
  private[operators] def pqAdcTables(queries: DataFrame, idCol: String,
      vecCol: String, bcCodebooks: org.apache.spark.broadcast.Broadcast[Array[Array[Array[Double]]]],
      m: Int, sub: Int, maxQueries: Int,
      normalize: Boolean): Array[(Long, Array[Array[Double]])] = {
    val spark = queries.sparkSession
    import spark.implicits._
    val ds = queries.select(col(idCol).cast("long").as("query_id"),
        col(vecCol).cast("array<double>").as("qv"))
      .as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        val cb = bcCodebooks.value
        rows.map { case (qid, qSeq) =>
          val q = pqQuantize(qSeq.toArray, normalize)
          val table: Seq[Seq[Double]] = (0 until m).map { s =>
            val off = s * sub
            cb(s).toSeq.map { c =>
              var d = 0.0; var i = 0
              while (i < sub) { d += q(off + i) * c(i); i += 1 }
              d
            }
          }
          (qid, table)
        }
      }
    val collected = ds.take(maxQueries + 1)
    require(collected.length <= maxQueries,
      s"query set exceeds maxQueries=$maxQueries: PQ/ADC broadcasts one table " +
        "per query; batch the query set or raise maxQueries deliberately")
    collected.map { case (qid, t) => (qid, t.map(_.toArray).toArray) }
  }

  /** Product-Quantization ANN (asymmetric distance computation): the
    * compressed-domain scan for corpora where raw vectors don't fit the
    * cluster's memory budget.
    *
    *  - TRAIN (driver, on a deterministic hash sample — codebooks are
    *    small-data): the vector splits into `m` subvectors; each subspace
    *    takes a stride-sampled codebook from the mix2-hash-ordered sample
    *    (`codebookSize` entries), optionally refined with `trainIters`
    *    Lloyd sweeps. With the default `trainIters = 0` every training
    *    input is integer-quantized (`round(x*10^4)`, exact in double) and
    *    every downstream distance/ADC value is exact integer arithmetic —
    *    the whole pipeline is engine-portable and the q54 oracle rebuilds
    *    it in SQL (recall@10 = 0.94 at the defaults on the synthetic
    *    fixture, BETTER than the previous Lloyd-refined 0.64 because the
    *    stride sample spreads codewords where the data is). Lloyd sweeps
    *    (`trainIters > 0`) improve codebooks on genuinely clustered
    *    corpora but produce non-integer centroids — not oracle-portable.
    *  - ENCODE (executors, one broadcast pass): every corpus vector →
    *    `m` bytes (nearest codebook entry per subspace) — dim 64 floats
    *    (256 B) become 8 B, a 32× compression, so a 100 TB embedding
    *    corpus scans from ~3 TB of codes.
    *  - SCAN (executors): each query precomputes an m × codebookSize
    *    table of subspace inner products; a candidate's approximate score
    *    is `m` table lookups instead of `dim` multiplies.
    *  - RE-RANK: the top `k × rerankFactor` candidates per query rejoin
    *    their exact vectors for the exact-cosine cut (same 4dp rounding
    *    as [[bruteForceTopK]]), restoring precision that quantization
    *    loses.
    *
    * Recall < 1 by construction (SimilaritySpec floors it against brute
    * force); raise `m`/`codebookSize`/`rerankFactor` for recall, lower
    * them for speed/size.
    *
    * METRIC CAVEAT: the ADC scan ranks candidates by raw INNER PRODUCT
    * while the final re-rank is cosine — on a corpus with heterogeneous
    * vector norms, large-norm vectors crowd the candidate cut and a
    * small-norm true neighbor can never reach the re-rank. Set
    * `normalize = true` to scale every vector to unit norm before
    * quantization (IP then IS cosine, SimilaritySpec proves the recovery);
    * it stays off by default because the division makes the pipeline
    * non-integer and therefore not oracle-portable (q54's fixture norms
    * are homogeneous, where raw IP ranks identically). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
             vecCol: String, k: Int, m: Int = 8, codebookSize: Int = 64,
             rerankFactor: Int = 16, sampleN: Int = 512,
             trainIters: Int = 0,
             maxQueries: Int = 100000,
             normalize: Boolean = false): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (codebooks, sub) = pqCodebooks(corpus, idCol, vecCol, m, codebookSize,
      sampleN, trainIters, normalize)
    val bcCodebooks = spark.sparkContext.broadcast(codebooks)

    // --- encode: corpus → m byte codes (one broadcast pass, no shuffle) ---
    val codes = corpus.select(col(idCol).cast("long").as("vec_id"),
        col(vecCol).cast("array<double>").as("v"))
      .as[(Long, Seq[Double])]
      .mapPartitions { rows =>
        val cb = bcCodebooks.value
        rows.map { case (id, vSeq) =>
          val v = pqQuantize(vSeq.toArray, normalize)
          val code = new Array[Byte](m)
          var s = 0
          while (s < m) {
            val off = s * sub
            var best = 0; var bestD = Double.MaxValue; var j = 0
            while (j < cb(s).length) {
              val d = pqL2(v, off, cb(s)(j)); if (d < bestD) { bestD = d; best = j }; j += 1
            }
            code(s) = best.toByte
            s += 1
          }
          (id, code)
        }
      }.toDF("vec_id", "code")

    // --- scan: ADC lookup tables per query ([[pqAdcTables]] — distributed
    // build, maxQueries-bounded collect), m lookups per candidate. This
    // operator is the ANN-serving shape — a corpus-sized "query set"
    // belongs in cosineDupPairs instead. ---
    val qTables = pqAdcTables(queries, idCol, vecCol, bcCodebooks, m, sub,
      maxQueries, normalize)
    val bcTables = spark.sparkContext.broadcast(qTables)

    val approx = codes.as[(Long, Array[Byte])].mapPartitions { rows =>
      val tables = bcTables.value
      rows.flatMap { case (vid, code) =>
        tables.iterator.collect { case (qid, table) if qid != vid =>
          var s = 0.0; var i = 0
          while (i < m) { s += table(i)((code(i) & 0xFF)); i += 1 }
          (qid, vid, s)
        }
      }
    }.toDF("query_id", "vec_id", "approx_score")

    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("approx_score").desc, col("vec_id"))
    val candidates = approx.withColumn("__rn", row_number().over(wApprox))
      .filter(col("__rn") <= k * rerankFactor)
      .select("query_id", "vec_id")

    // --- re-rank: exact cosine over the candidate pool only ---
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("cv"))
    val scored = candidates
      .join(broadcast(q), "query_id")
      .join(c, "vec_id")
      .withColumn("score",
        graft.functions.Rounding.roundLikeC(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "vec_id", "score")
  }

  /** IVF-PQ composed ANN — the production shape at corpus scale (the
    * FAISS `IVFx,PQy` index, Jégou et al. 2011): the IVF coarse quantizer
    * ([[ivfTopK]]'s deterministic sampled centroids) partitions the corpus
    * into `nList` cells; every corpus vector is stored as `m` PQ code
    * bytes; a query probes its `nProbe` nearest cells and ADC-scans ONLY
    * the codes in those cells; the top `k·rerankFactor` approximate hits
    * re-rank by exact cosine. Composes q42's cell pipeline with q54's
    * codebook/encode/ADC pipeline unchanged — both deterministic and
    * integer-exact, so the full composition is DuckDB-oracle-checked
    * (q136) and recall@10 is floored in SimilaritySpec.
    *
    * Scale shape — what neither piece achieves alone: the compressed-
    * domain scan touches corpus × nProbe/nList CODE rows (m bytes each,
    * ~32× smaller than raw vectors), so a 100 TB embedding corpus probes
    * from ~3 TB of codes × the probe fraction. Cell assignment and PQ
    * encode ride ONE broadcast projection pass (no vec_id-keyed join —
    * the encode maps over the assigned frame); the probe join is the one
    * shuffle, keyed by cell; ADC tables are `maxQueries`-bounded
    * ([[pqAdcTables]]); exact vectors are touched only for the re-rank
    * candidates. Raise nList with corpus size (thousands of cells at
    * production scale) to hold the probe fraction ≪ 1. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                vecCol: String, k: Int, nList: Int = 8, nProbe: Int = 6,
                m: Int = 8, codebookSize: Int = 64, rerankFactor: Int = 16,
                sampleN: Int = 512, maxQueries: Int = 100000): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cents = sampledCentroids(corpus, idCol, vecCol, nList)
    val (codebooks, sub) = pqCodebooks(corpus, idCol, vecCol, m, codebookSize, sampleN)
    val bcCodebooks = spark.sparkContext.broadcast(codebooks)

    // one pass over the corpus: argmax-cell projection, then the PQ encode
    // maps over the SAME frame — (vec_id, cell, code), no join
    val corpusCells = assignCells(corpus.withColumnRenamed(idCol, "vec_id"),
      cents, "vec_id", vecCol, keep = 1)
    val codes = corpusCells
      .select(col("vec_id").cast("long"), col("cell"),
        col(vecCol).cast("array<double>"))
      .as[(Long, Int, Seq[Double])]
      .mapPartitions { rows =>
        val cb = bcCodebooks.value
        rows.map { case (id, cell, vSeq) =>
          val v = pqQuantize(vSeq.toArray, normalize = false)
          val code = new Array[Byte](m)
          var s = 0
          while (s < m) {
            val off = s * sub
            var best = 0; var bestD = Double.MaxValue; var j = 0
            while (j < cb(s).length) {
              val d = pqL2(v, off, cb(s)(j)); if (d < bestD) { bestD = d; best = j }; j += 1
            }
            code(s) = best.toByte
            s += 1
          }
          (id, cell, code)
        }
      }.toDF("vec_id", "cell", "code")

    val queryCells = assignCells(queries.withColumnRenamed(idCol, "query_id"),
        cents, "query_id", vecCol, keep = nProbe)
      .select(col("query_id").cast("long").as("query_id"), col("cell"))
    val qTables = pqAdcTables(queries, idCol, vecCol, bcCodebooks, m, sub,
      maxQueries, normalize = false)
    val bcTables = spark.sparkContext.broadcast(qTables.toMap)

    // compressed-domain scan over PROBED cells only: the one shuffle,
    // keyed by cell; each surviving (query, code) pair costs m lookups
    val approx = queryCells.join(codes, "cell")
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), col("code"))
      .as[(Long, Long, Array[Byte])]
      .mapPartitions { rows =>
        val tables = bcTables.value
        rows.map { case (qid, vid, code) =>
          val t = tables(qid)
          var s = 0.0; var i = 0
          while (i < m) { s += t(i)(code(i) & 0xFF); i += 1 }
          (qid, vid, s)
        }
      }.toDF("query_id", "vec_id", "approx_score")

    val wApprox = Window.partitionBy("query_id")
      .orderBy(col("approx_score").desc, col("vec_id"))
    val candidates = approx.withColumn("__rn", row_number().over(wApprox))
      .filter(col("__rn") <= k * rerankFactor)
      .select("query_id", "vec_id")

    // exact re-rank over the candidate pool only (pqTopK's tail)
    val q = queries.select(col(idCol).cast("long").as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).cast("long").as("vec_id"), col(vecCol).as("cv"))
    val scored = candidates
      .join(broadcast(q), "query_id")
      .join(c, "vec_id")
      .withColumn("score",
        graft.functions.Rounding.roundLikeC(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "vec_id", "score")
  }

  /** LSH ANN: hyperplane-banded candidates, exact cosine re-rank, top-k.
    * Recall < 1 by construction; verify with [[bruteForceTopK]].
    *
    * Defaults (16 bands × 3 bits, like [[ivfTopK]]'s and [[pqTopK]]'s) are
    * tuned to recall@10 ≥ 0.9 on the weakly-clustered synthetic fixture —
    * the adversarial case for a bucketing index (SimilaritySpec floors
    * them). Candidate volume ∝ corpus × bands / 2^bits per query; a corpus
    * with real cluster structure can drop bands or raise bits for the same
    * recall at a fraction of the cost. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, dim: Int, bands: Int = 16,
              bitsPerBand: Int = 3, seed: Long = 42L): DataFrame = {
    val cB = banded(corpus, idCol, vecCol, bands, bitsPerBand, dim, seed)
    val qB = banded(queries, idCol, vecCol, bands, bitsPerBand, dim, seed)
      .withColumnRenamed("id", "query_id")
    val cands = qB.join(cB, Seq("band", "bucket"))
      .filter(col("id") =!= col("query_id"))
      .select(col("query_id"), col("id").as("vec_id"))
      .distinct()
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("vec_id"), col(vecCol).as("cv"))
    val scored = cands
      .join(broadcast(q), "query_id")
      .join(c, "vec_id")
      .withColumn("score", graft.functions.Rounding.roundLikeC(cosine(col("qv"), col("cv")), 4))
    val w = Window.partitionBy("query_id").orderBy(col("score").desc, col("vec_id"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select("query_id", "vec_id", "score")
  }

  /** Rademacher random projection — Johnson-Lindenstrauss dimensionality
    * reduction of an embedding column: component j of the output is the
    * input's dot product with ±1 plane j (the same [[hyperplanes]] family
    * the sign-LSH buckets use), scaled by 1/(sqrt(outDim)·10^4) to undo the
    * integer quantization and preserve expected inner products. JL gives
    * pairwise-distance distortion ~1/sqrt(outDim) — the standard cheap
    * pre-step before clustering or coarse ANN when the raw dim is large.
    *
    * Engine-portable by the LSH argument: quantized inputs make every dot an
    * exact integer, so both engines agree bit-for-bit after one division and
    * a 4dp round. Pure projection (no shuffle); emits one
    * (id, component_idx, component) row per output dimension.
    */
  def randomProject(df: DataFrame, idCol: String, vecCol: String,
                    dim: Int, outDim: Int, seed: Long = 42L): DataFrame = {
    val planes = hyperplanes(outDim, dim, seed)
    val qx = transform(col(vecCol).cast("array<double>"), x => round(x * lit(10000.0d)))
    val scale = lit(10000.0d * math.sqrt(outDim.toDouble))
    val comps = planes.map { p =>
      graft.functions.Rounding.roundLikeC(dotNative(col("__qx"), typedlit(p)) / scale, 4)
    }
    df.select(col(idCol), qx.as("__qx"))
      .select(col(idCol),
        posexplode(array(comps: _*)).as(Seq("component_idx", "component")))
  }

  /** SQ8 scalar quantization — the OTHER standard ANN compression next to
    * [[pqTopK]]'s product quantization: per-vector symmetric int8 codes,
    * `code_i = round(x_i · 127 / scale)` with `scale = max|x_i|`, 4 bytes →
    * 1 byte per dimension with reconstruction error ≤ scale/254 per
    * component. Zero-vector rows emit all-zero codes (scale 0).
    *
    * Pure projection, no shuffle. The scale is BOUND ONCE per row via the
    * array-wrap idiom ([[Dedup.shingles]]): referencing the array_max
    * directly from the per-component lambda would re-reduce the vector per
    * element — the O(d²) q98 trap. Engine-portable: the scale is a max of
    * exact float-widened doubles (no accumulation), each code is one
    * multiply, one divide, one std::round — both engines land on identical
    * integers, and the emitted scale is the identical double. */
  def sq8Quantize(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    val scale = array_max(transform(v, x => abs(x)))
    val bound = transform(array(struct(v.as("v"), scale.as("s"))), t =>
      struct(
        t.getField("s").as("s"),
        transform(t.getField("v"), x =>
          when(t.getField("s") > 0,
            round(x * lit(127.0) / t.getField("s"), 0).cast("long"))
            .otherwise(lit(0L))).as("codes")))
    df.select(col(idCol), element_at(bound, 1).as("__b"))
      .select(col(idCol), col("__b.s").as("scale"),
        posexplode(col("__b.codes")).as(Seq("dim_idx", "code")))
      .select(col(idCol), col("dim_idx"), col("code"), col("scale"))
  }
}
