package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data batch-prep operators: scalable global cumulative sums,
  * sequence packing (concat-and-chunk), and deterministic shard assignment.
  *
  * These extend the reference's ordered-computation family (SURVEY §2.6 —
  * its global `ROW_NUMBER() OVER (ORDER BY (SELECT NULL))`,
  * `dags/ssg_erp_op.py:296`) with the shapes an LLM-corpus pipeline needs:
  * "concatenate the corpus in a stable order and cut it into fixed-size
  * context windows" and "deterministically permute documents into shards".
  *
  * Scale design: a naive global cumsum is a single-partition window. Here the
  * order key is bucketed; per-bucket totals (one map-side-combinable shuffle
  * over ~thousands of buckets) produce prefix offsets on the driver-sized
  * bucket list, which broadcast-join back; the running sum inside each bucket
  * is an ordinary partitioned window. No stage ever sees more than one
  * bucket's rows in a single task.
  */
object Packing {

  /** Globally-ordered running sum of `measure` by `orderCol` (ascending),
    * bucketed for scale. `bucket` MUST be a monotone non-decreasing function
    * of `orderCol` (e.g. `floor(orderCol / B)`). Emits `alias` = inclusive
    * running sum as LONG.
    *
    * DETERMINISM: `orderCol` extended by `tieBreak` must be a total order —
    * rows that compare equal would get shuffle-order-dependent running sums
    * across runs. Callers with a unique key (packSequences orders by doc_id)
    * pass nothing; otherwise supply a tie-breaking column.
    */
  def bucketedCumSum(df: DataFrame, orderCol: Column, bucket: Column,
                     measure: Column, alias: String,
                     tieBreak: Seq[Column] = Nil): DataFrame = {
    val b = df.withColumn("__bucket", bucket)
    val totals = b.groupBy("__bucket").agg(sum(measure).as("__bsum"))
    // prefix offsets over the (small) bucket list: sum of all earlier buckets
    val offsets = totals
      .withColumn("__offset",
        coalesce(
          sum(col("__bsum")).over(
            Window.orderBy("__bucket").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .drop("__bsum")
    b.join(broadcast(offsets), Seq("__bucket"))
      .withColumn(alias,
        (col("__offset") +
          sum(measure).over(
            Window.partitionBy("__bucket").orderBy(orderCol +: tieBreak: _*)
              .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .cast("long"))
      .drop("__bucket", "__offset")
  }

  /** Sequence packing, concat-and-chunk style: documents are laid out in
    * `idCol` order and the token stream is cut every `capacity` tokens; each
    * document is assigned the chunk its FIRST token lands in. Emits
    * `start_tok` (0-based global token offset) and `pack_id`.
    */
  def packSequences(df: DataFrame, idCol: Column, tokensCol: Column,
                    capacity: Long, idBucketSize: Long = 65536L): DataFrame = {
    val cum = bucketedCumSum(
      df, idCol, floor(idCol / lit(idBucketSize)).cast("long"),
      tokensCol.cast("long"), "__cum")
    cum
      .withColumn("start_tok", col("__cum") - tokensCol.cast("long"))
      .withColumn("pack_id", expr(s"start_tok div ${capacity}L"))
      .drop("__cum")
  }

  /** Token-budget corpus selection — the "best docs until the budget is
    * spent" step of data curation: rank documents by quality (descending,
    * doc id breaking ties), run a global token cumsum down the ranking, and
    * mark every document whose running total fits the budget. The budget is
    * a FRACTION of the corpus's total tokens (integer `total * num / den`),
    * so the query means the same thing at every scale factor.
    *
    * Scale shape: the ranking cumsum is [[bucketedCumSum]] over quality
    * buckets (`floor((1-q)*bucketsPerUnit)` is monotone in descending
    * quality) — no single-partition window; the total-token scalar is a
    * 1-row broadcast. Emits every input row (selection is a flag, not a
    * filter — callers audit what was REJECTED as often as what was kept)
    * with `n_tokens`, `quality`, `cum_tokens`, `selected`.
    */
  def tokenBudgetSelect(df: DataFrame, idCol: Column, textCol: Column,
                        stopwords: Seq[String],
                        budgetNum: Long, budgetDen: Long,
                        bucketsPerUnit: Int = 50): DataFrame = {
    require(budgetDen > 0 && budgetNum >= 0, s"bad budget $budgetNum/$budgetDen")
    // the id goes out under the CALLER'S column name (an earlier form
    // hardcoded "doc_id", silently renaming any other id — inconsistent
    // with bucketedCumSum, which preserves input columns)
    val outIdName = df.select(idCol).columns.head
    val scored = df.select(idCol.as("__id"), textCol.as("__t"))
      .withColumn("n_tokens", size(graft.functions.Text.tokens(col("__t"))).cast("long"))
      .withColumn("quality", graft.functions.Text.qualityScore(col("__t"), stopwords))
      .withColumn("__ord", -col("quality"))
    val cum = bucketedCumSum(
      scored, col("__ord"),
      floor(col("__ord") * lit(bucketsPerUnit)).cast("long"),
      col("n_tokens"), "cum_tokens", tieBreak = Seq(col("__id")))
    val total = scored.agg(sum(col("n_tokens")).as("__total"))
    cum.crossJoin(broadcast(total))
      .withColumn("selected",
        col("cum_tokens") * lit(budgetDen) <= col("__total") * lit(budgetNum))
      .select(col("__id").as(outIdName), col("n_tokens"), col("quality"),
        col("cum_tokens"), col("selected"))
  }

  /** Per-document sliding token-window chunking — the RAG / context-window
    * prep shape: each document's token stream is cut into windows of
    * `chunkSize` tokens starting every `stride` tokens. Windows never start
    * at-or-past the end, the final window may be short, and empty documents
    * yield no chunks, so a doc with n tokens yields `(n-1)/stride + 1`
    * chunks. `stride <= chunkSize` is required — a larger stride would skip
    * tokens between windows.
    *
    * Scale shape: pure per-row projection + generator — no shuffle, no
    * state; parallelism is the scan's. Emits the id column unchanged plus
    * `chunk_idx` (0-based), `start_tok` (0-based token offset), `n_tokens`,
    * and `chunk_md5`, an md5 fingerprint of the space-joined window — the
    * downstream dedup/lookup key. (Carrying the chunk TEXT would multiply
    * corpus bytes by ~chunkSize/stride; callers that need it re-slice from
    * the source row instead.)
    */
  def slidingChunks(df: DataFrame, idCol: Column, textCol: Column,
                    chunkSize: Int, stride: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(stride >= 1 && stride <= chunkSize,
      s"stride must be in [1, chunkSize]: stride=$stride chunkSize=$chunkSize")
    val chunk = slice(col("__w"), col("start_tok") + lit(1), lit(chunkSize))
    df.select(idCol, graft.functions.Text.tokens(textCol).as("__w"))
      .withColumn("__n", size(col("__w")))
      .filter(col("__n") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0), floor((col("__n") - 1) / lit(stride)).cast("int"))))
      .withColumn("start_tok", col("chunk_idx") * lit(stride))
      .withColumn("__c", chunk)
      .withColumn("n_tokens", size(col("__c")))
      .withColumn("chunk_md5", md5(array_join(col("__c"), " ")))
      .drop("__w", "__n", "__c")
  }

  /** Deterministic pseudo-random shard assignment: an LCG over the id column
    * (mod 2^31, overflow-free in 64-bit for any id) permutes documents; the
    * permuted value picks the shard and orders documents inside it. The same
    * ids always land in the same shard at the same position — re-runnable
    * shuffles for training-data sharding, no RNG state.
    *
    * Emits `shard` and `pos` (1-based within-shard rank). The rank window
    * partitions by shard — at 100 TB each shard is still one task's sort; for
    * very large shards raise `numShards` (position only needs per-shard
    * order, so shard count is the parallelism knob).
    */
  def shardAssign(df: DataFrame, idCol: Column, numShards: Int): DataFrame = {
    val m = 2147483648L // 2^31
    val h = (pmod(idCol.cast("long"), lit(m)) * lit(1103515245L) + lit(12345L)) % lit(m)
    // bucket on the HIGH bits (h * n / 2^31): an LCG's low-order bits cycle
    // with tiny periods (bit k has period 2^(k+1)), so `h % n` over
    // sequential ids visits only a few residues — high bits are the
    // well-mixed ones
    df.withColumn("__h", h)
      .withColumn("shard", expr(s"(__h * $numShards) div $m").cast("int"))
      .withColumn("pos",
        row_number().over(Window.partitionBy("shard").orderBy(col("__h"), idCol)))
      .drop("__h")
  }

  /** TWO LCG rounds over an id, result in [0, 2^31): one round over
    * sequential ids sweeps the high bits too slowly (dense id blocks land
    * together), and low bits of any LCG cycle (bit k has period 2^(k+1)) —
    * so mix twice and consume the HIGH bits only. Engine-portable integer
    * arithmetic (the DuckDB oracles reproduce it exactly); empirically
    * 0..499 → 449/25/26 at a 90/5/5 cut. */
  def mix2(idCol: Column): Column = {
    val m = 2147483648L // 2^31
    val h1 = (pmod(idCol.cast("long"), lit(m)) * lit(1664525L) + lit(1013904223L)) % lit(m)
    (h1 * lit(1103515245L) + lit(12345L)) % lit(m)
  }

  /** Curriculum ordering — the difficulty-staged training order (Bengio et
    * al. 2009's curriculum learning, as data pipelines realize it): rank
    * every document by a difficulty score (an LM NLL, a quality score),
    * cut the ranking into `numBuckets` equal-population stages, and
    * pseudo-randomly shuffle WITHIN each stage ([[mix2]] order) so the
    * trainer consumes stages easy→hard without intra-stage ordering bias.
    * Consume in (bucket, pos_in_bucket) order.
    *
    * Emits (input columns +) `difficulty_rank` (1-based LONG over
    * (score, id) — deterministic tie-break), `bucket` (0-based stage),
    * `pos_in_bucket` (1-based mix2 order within the stage).
    *
    * Determinism + parity: the rank is an exact ROW_NUMBER over the
    * two-column (score, id) key — [[Windows.globalRowNumberOrdered]]
    * buckets on the score alone and tie-breaks inside each bucket, so the
    * id never enters any arithmetic and the ordering is exact for the FULL
    * long id range (negative ids, ids ≥ 2³¹) and any score magnitude. (An
    * earlier form packed `round(score·10⁴)·2³¹ + id` into one long, which
    * silently mis-ordered past those ranges — the round-6 advisory; an
    * external ROW_NUMBER OVER (ORDER BY score, id) lands identically.)
    * Bucket = floor((rank−1)·B / n): exact below 2⁵³/B docs; the long rank
    * itself never overflows.
    *
    * Scale shape: the global rank is the COMPOSED form (bucketed
    * row_number + offsets — no single-partition window,
    * [[graft.operators.Windows.globalRowNumberOrdered]]); the in-stage
    * shuffle windows partition by bucket (≈ n/B rows each — raise
    * numBuckets if a stage outgrows one task's sort); the doc count is a
    * 1-row broadcast. */
  def curriculumOrder(scored: DataFrame, idCol: String, scoreCol: String,
                      numBuckets: Int = 10): DataFrame = {
    require(numBuckets >= 1, "numBuckets must be >= 1")
    // materialize the scored frame ONCE: the composed rank takes two driver
    // actions (bounds, bucket counts), the doc count a third, and the final
    // plan references it again — an un-checkpointed input re-runs its whole
    // scoring DAG (a corpus LM train+score for q135) per action: measured
    // 5.8 s -> ~2.9 s isolated at sf0.1 (the remaining cost is the single
    // materialization of the scoring DAG itself), results bit-identical
    // (the dupClusters lesson)
    val packed = scored.localCheckpoint()
    val ranked = graft.operators.Windows.globalRowNumberOrdered(packed,
      col(scoreCol), Seq(col(scoreCol), col(idCol)), "difficulty_rank")
    val n = packed.agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(n))
      .withColumn("bucket",
        floor((col("difficulty_rank").cast("long") - 1L) * numBuckets /
          col("__n").cast("double")).cast("int"))
      .withColumn("pos_in_bucket", row_number().over(
        Window.partitionBy("bucket").orderBy(mix2(col(idCol)), col(idCol))))
      .drop("__n")
  }

  /** Deterministic corpus shuffle — the seeded training-order permutation
    * every pretraining run needs: consecutive crawl/source rows must not
    * land consecutively in the token stream, and the order must be exactly
    * reproducible (resume-from-checkpoint, ablation reruns, multi-worker
    * sharding all read the same permutation). `rand()` cannot do this — it
    * reseeds per partition layout.
    *
    * shuffle key = [[mix2]](id·131 + seed) — an engine-portable LCG
    * bijection of [0, 2^31), so distinct small ids collide only past 2^31
    * and the SQL oracle replays the key exactly; ties (possible only via
    * mod-collision) break by id, as the SECOND column of the composite
    * rank order, never packed into the key — so ids of any sign/magnitude
    * position exactly (the curriculum-key lesson). Position = the composed
    * bucket+offset global row number ([[Windows.globalRowNumberOrdered]])
    * — no single-partition sort; mix2's output is uniform on [0, 2^31), so
    * the range buckets balance regardless of input id distribution. Emits
    * the id column plus `shuffle_pos` (1-based). */
  def deterministicShuffle(df: DataFrame, idCol: Column,
                           seed: Long = 42L): DataFrame = {
    val outIdName = df.select(idCol).columns.head
    val keyed = df.select(idCol.as(outIdName))
      .withColumn("__shufkey", mix2(idCol * lit(131L) + lit(seed)))
    Windows.globalRowNumberOrdered(keyed, col("__shufkey"),
        Seq(col("__shufkey"), col(outIdName)), "shuffle_pos", rankAsLong = false)
      .select(col(outIdName), col("shuffle_pos"))
  }

  /** Deterministic per-stratum sample: exactly `n` rows per stratum (fewer
    * if the stratum is smaller), chosen by the [[mix2]] pseudo-random order
    * — balanced subsampling for training mixes, stable across re-runs. One
    * shuffle on the stratum key; each stratum sorts only its own rows. */
  def stratifiedSample(df: DataFrame, idCol: Column, stratumCol: Column,
                       n: Int): DataFrame =
    df.withColumn("__h", mix2(idCol))
      .withColumn("sample_rank",
        row_number().over(Window.partitionBy(stratumCol).orderBy(col("__h"), idCol)))
      .filter(col("sample_rank") <= n)
      .drop("__h")

  /** Weighted domain mixture — the pretraining-mix sampler ("40% src0, 30%
    * src1, …"): per stratum, keep the first `quota(stratum)` rows of the
    * [[mix2]] pseudo-random order (fewer if the stratum runs out). Strata
    * absent from `weights` contribute nothing. Same determinism and shuffle
    * shape as [[stratifiedSample]] (ONE shuffle on the stratum key); re-runs
    * and engine twins reproduce the exact member set, so the mix is
    * auditable — the property `rand()`-weighted sampling lacks.
    *
    * Quotas are apportioned by largest remainder (floor every exact share,
    * then hand the leftover units to the largest fractional parts, ties by
    * key), so they sum EXACTLY to `total` whenever the weights sum to 1 —
    * independent per-stratum rounding can drift by one per stratum (e.g.
    * 1/3,1/3,1/3 × 50 → 17+17+17 = 51). */
  def weightedMix(df: DataFrame, idCol: Column, stratumCol: Column,
                  weights: Map[String, Double], total: Int): DataFrame = {
    val quota = typedlit(apportion(weights, total))
    df.withColumn("__h", mix2(idCol))
      .withColumn("sample_rank",
        row_number().over(Window.partitionBy(stratumCol).orderBy(col("__h"), idCol)))
      .filter(col("sample_rank") <= coalesce(element_at(quota, stratumCol), lit(0)))
      .drop("__h")
  }

  /** Leakage-safe train/eval split — the assignment rule that makes a
    * held-out set actually held out: documents are split by DUPLICATE
    * CLUSTER, not individually, so a near-duplicate of a training document
    * can never land in eval (the contamination mode individual random
    * splits are blind to, and the reason decontamination (q74) exists as
    * a repair step — this operator prevents the leak at split time).
    *
    * `pairs` is any near-dup pair frame (jaccardPairs, simhashPairs, an
    * LSH+verify DAG); [[graft.operators.Dedup.dupClusters]] closes it
    * transitively, then every CLUSTER assigns to a side by the [[mix2]]
    * hash-rate rule (`mix2(cluster_id) < evalFraction·2³¹` — the q147
    * idiom: a deterministic rate, zero extra shuffle, engine-portable).
    * Emits (id, cluster_id, split ∈ train|eval).
    *
    * Scale shape: the cluster pass dominates (pointer-doubling label
    * propagation, one shuffle per round); the split itself is a pure
    * projection on its output. Fraction is rate-exact over clusters, not
    * quota-exact — a leakage-safe split cannot be quota-exact anyway,
    * since clusters are atomic. */
  def leakageSafeSplit(nodes: DataFrame, idCol: String, pairs: DataFrame,
                       evalFraction: Double,
                       idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    require(evalFraction >= 0.0 && evalFraction <= 1.0,
      s"evalFraction=$evalFraction must lie in [0, 1]")
    val thresh = math.floor(evalFraction * 2147483648.0).toLong
    graft.operators.Dedup.dupClusters(nodes, idCol, pairs, idA, idB)
      .withColumn("split",
        when(mix2(col("cluster_id")) < thresh, lit("eval")).otherwise(lit("train")))
  }

  /** Epoch-aware mixture expansion — the "train 2 epochs of wiki, 0.4 of
    * CommonCrawl" repeat schedule (the LLaMA / Pile mixture recipe): every
    * document of source s appears `floor(e_s)` times, plus one extra copy
    * for a deterministic ~frac(e_s) fraction of its documents. Emits the
    * input columns + `copy_idx` (0-based); feed the result to
    * [[detShuffle]] keyed on (id, copy_idx) for the training order.
    *
    * The fractional epoch is a RATE, not a quota, so selection is a pure
    * hash threshold (`mix2(id) < frac·2³¹` — exact integer comparison,
    * engine-portable) rather than a per-source ranked quota: the whole
    * operator stays a ZERO-SHUFFLE projection — no count pass, no
    * per-source window (which would funnel each source through one task
    * at corpus scale). When exact quotas matter, [[weightedMix]] /
    * [[temperatureMix]] are the ranked paths. Sources not in `epochs` get
    * `defaultEpochs`. A 0.0 epoch drops the source entirely. */
  def epochMix(df: DataFrame, idCol: Column, sourceCol: Column,
               epochs: Map[String, Double],
               defaultEpochs: Double = 1.0): DataFrame = {
    require((epochs.values ++ Seq(defaultEpochs)).forall(e => e >= 0.0 && e <= 1000.0),
      "epoch factors must be in [0, 1000]")
    val m = 2147483648L // 2^31, the mix2 modulus
    def wholeOf(e: Double) = math.floor(e).toLong
    def threshOf(e: Double) = math.floor((e - math.floor(e)) * m).toLong
    val whole = typedlit(epochs.map { case (k, v) => k -> wholeOf(v) })
    val thresh = typedlit(epochs.map { case (k, v) => k -> threshOf(v) })
    val copies = coalesce(element_at(whole, sourceCol), lit(wholeOf(defaultEpochs))) +
      when(mix2(idCol) <
          coalesce(element_at(thresh, sourceCol), lit(threshOf(defaultEpochs))),
        1L).otherwise(0L)
    df.withColumn("copy_idx",
        explode(when(copies > 0, sequence(lit(0L), copies - 1))))
  }

  /** Largest-remainder apportionment of `total × weight/Σweights` units. */
  /** T5-style span corruption (Raffel et al. 2020) — the masked-LM example
    * prep: the token stream splits into fixed `blockLen`-token blocks, a
    * deterministic ~(maskNumerator/10) of blocks mask out, and each example
    * becomes (input with sentinels, target of sentinel+span pairs):
    *
    *   tokens:  the quick brown | fox jumps over | the lazy dog
    *   input:   the quick brown <extra_id_0> the lazy dog
    *   target:  <extra_id_0> fox jumps over
    *
    * Span selection is [[mix2]](id·131 + block) — reproducible across
    * re-runs, layouts, and engines (every ablation needs the SAME masks; a
    * `rand()` mask is a different dataset every run). Zero-shuffle: the
    * whole transform is one projection; the token array binds ONCE per row
    * (array-wrap idiom) and sentinel numbering is an in-row prefix count
    * over blocks (O(blocks²) integer LCG evals per row — bounded by
    * (len/blockLen)², trivial next to the string work). Sub-`blockLen`
    * tails mask as shorter spans, exactly like the paper's boundary. */
  def spanCorrupt(df: DataFrame, idCol: Column, textCol: Column,
                  blockLen: Int = 3, maskNumerator: Int = 2): DataFrame = {
    val outId = df.select(idCol).columns.head
    def maskedBlk(id: Column, b: Column): Column =
      mix2(id * lit(131L) + b) % 10 < maskNumerator
    val bound = transform(
      array(struct(idCol.cast("long").as("id"),
        graft.functions.Text.tokens(textCol).as("ts"))),
      t => {
        val id = t.getField("id")
        val ts = t.getField("ts")
        val nb = ceil(size(ts).cast("double") / blockLen).cast("int")
        val blocks = sequence(lit(0), nb - 1)
        def blockToks(b: Column) = slice(ts, b * blockLen + 1, lit(blockLen))
        def prefix(b: Column) = when(b === 0, lit(0)).otherwise(
          aggregate(sequence(lit(0), b - 1), lit(0),
            (acc, j) => acc + when(maskedBlk(id, j), 1).otherwise(0)))
        val inputArr = transform(blocks, b =>
          when(maskedBlk(id, b),
            concat(lit("<extra_id_"), prefix(b).cast("string"), lit(">")))
            .otherwise(concat_ws(" ", blockToks(b))))
        val targetArr = transform(blocks, b =>
          when(maskedBlk(id, b),
            concat(lit("<extra_id_"), prefix(b).cast("string"), lit("> "),
              concat_ws(" ", blockToks(b)))))
        val nMasked = aggregate(blocks, lit(0),
          (acc, b) => acc + when(maskedBlk(id, b), 1).otherwise(0))
        when(size(ts) === 0,
          struct(lit(0).as("n_blocks"), lit(0).as("n_masked"),
            lit("").as("input"), lit("").as("target")))
          .otherwise(struct(nb.as("n_blocks"), nMasked.as("n_masked"),
            concat_ws(" ", inputArr).as("input"),
            concat_ws(" ", targetArr).as("target")))
      })
    df.select(idCol.as(outId), element_at(bound, 1).as("__sc"))
      .select(col(outId), col("__sc.n_blocks").as("n_blocks"),
        col("__sc.n_masked").as("n_masked"),
        col("__sc.input").as("input"), col("__sc.target").as("target"))
  }

  /** Chat-template rendering with loss spans — the SFT/instruction-tuning
    * example prep (the ChatML shape): each conversation's turns render as
    *
    *   <|im_start|>ROLE\nCONTENT<|im_end|>\n
    *
    * concatenated in turn order, and every ASSISTANT turn reports the
    * 1-based character span of its CONTENT inside the rendered
    * conversation — the span the loss mask trains on (everything else —
    * system prompt, user turns, template tokens — is context only; a
    * trainer masking wrongly by even one template character trains on the
    * wrong tokens, which is why the offsets are first-class output, not
    * left for the consumer to re-derive).
    *
    * Emits one row per assistant turn: (convCol, turnCol, loss_start,
    * loss_end, conv_len, conv_md5) — the md5 of the full rendered
    * conversation ties each span row to the exact string it indexes
    * (the q151 fingerprint idea at conversation grain).
    *
    * Scale shape: per-turn segment lengths fold into spans with a window
    * over (conversation, turn) — bounded by turns-per-conversation (tens),
    * partitioned by conversation, no hot key; the rendered string
    * assembles once per conversation in an ordered collect_list fold
    * (conversation-sized, the natural grain). Pure string/integer
    * arithmetic end to end — engine-exact. */
  def chatRender(turns: DataFrame, convCol: String, turnCol: String,
                 roleCol: String, contentCol: String): DataFrame = {
    val seg = concat(lit("<|im_start|>"), col(roleCol), lit("\n"),
      col(contentCol), lit("<|im_end|>\n"))
    val w = Window.partitionBy(col(convCol)).orderBy(col(turnCol))
    val base = turns.select(col(convCol), col(turnCol), col(roleCol),
        col(contentCol), seg.as("__seg"))
      .withColumn("__prefix", coalesce(
        sum(length(col("__seg")))
          .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val convs = base.groupBy(col(convCol)).agg(
      count(lit(1)).as("n_turns"),
      sum(length(col("__seg"))).as("conv_len"),
      md5(array_join(transform(
        sort_array(collect_list(struct(col(turnCol).as("t"), col("__seg").as("s")))),
        x => x.getField("s")), "")).as("conv_md5"))
    base.filter(col(roleCol) === "assistant")
      .select(col(convCol), col(turnCol),
        (col("__prefix") + length(lit("<|im_start|>")) + length(col(roleCol)) +
          lit(2)).as("loss_start"),
        (col("__prefix") + length(lit("<|im_start|>")) + length(col(roleCol)) +
          lit(1) + length(col(contentCol))).as("loss_end"))
      .join(convs, Seq(convCol))
  }

  /** Fill-in-the-middle transform (Bavarian et al. 2022) — the code-model
    * twin of [[spanCorrupt]]: two deterministic cut points split the token
    * stream into prefix|middle|suffix, re-emitted in PSM order
    * (`<PRE> prefix <SUF> suffix <MID> middle`) so the model learns infill
    * with an ordinary causal objective. Cuts derive from [[mix2]](id·131+1)
    * and (id·131+2) scaled into [0, n] with exact integer arithmetic
    * (`h·(n+1) div 2³¹` — the [[shardAssign]] high-bits rule), ordered so
    * cut1 ≤ cut2 — reproducible across runs, layouts, and engines. Boundary
    * behavior for tiny docs: the cuts land anywhere in [0, n], so a 1-token
    * doc whose salted cuts come out (0, 1) places its only token in the
    * MIDDLE (not the paper's empty-middle convention — we keep the uniform
    * cut rule instead of special-casing n<2, and the oracle replays the
    * identical arithmetic, so parity is unaffected).
    * One zero-shuffle projection; the token array binds once per row. */
  def fimTransform(df: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    val outId = df.select(idCol).columns.head
    val bound = transform(
      array(struct(idCol.cast("long").as("id"),
        graft.functions.Text.tokens(textCol).as("ts"))),
      t => {
        val id = t.getField("id")
        val ts = t.getField("ts")
        val n = size(ts).cast("long")
        // high-bits scaling into [0, n] via an exact shift (never a double
        // division): h·(n+1) >> 31 with h < 2^31 stays inside int64
        def cut(salt: Int): Column =
          shiftright((mix2(id * lit(131L) + lit(salt)) * (n + 1L)).cast("long"), 31)
        val a = least(cut(1), cut(2))
        val b = greatest(cut(1), cut(2))
        val pre = concat_ws(" ", slice(ts, lit(1), a.cast("int")))
        val mid = concat_ws(" ", slice(ts, a.cast("int") + 1, (b - a).cast("int")))
        val suf = concat_ws(" ", slice(ts, b.cast("int") + 1, size(ts)))
        struct(
          n.cast("int").as("n_tokens"), a.cast("int").as("cut1"), b.cast("int").as("cut2"),
          concat(lit("<PRE> "), pre, lit(" <SUF> "), suf, lit(" <MID> "), mid)
            .as("psm"))
      })
    df.select(idCol.as(outId), element_at(bound, 1).as("__f"))
      .select(col(outId), col("__f.n_tokens").as("n_tokens"),
        col("__f.cut1").as("cut1"), col("__f.cut2").as("cut2"),
        col("__f.psm").as("psm"))
  }

  /** Temperature-scaled domain mixture (the DoReMi/proportional-sampling
    * family): per-stratum quotas ∝ n^τ — τ=1 reproduces natural
    * proportions, τ→0 flattens toward uniform; the default τ=0.5 (sqrt
    * scaling) is the classic multilingual re-balancing. Unlike
    * [[weightedMix]] (caller-fixed weights), the weights DERIVE from the
    * observed stratum counts, so the whole pipeline — count, weight,
    * apportion, sample — is data-driven yet exactly reproducible.
    *
    * Engine parity: τ=0.5 uses `sqrt` (correctly rounded by IEEE 754 in
    * every engine — `pow(x, 0.5)` is NOT, which is why it's the oracle-safe
    * default); the weight sum folds in SORTED-STRATUM order
    * ([[apportionOrdered]]) so an external replay lands on the identical
    * double; apportionment is largest-remainder with (remainder DESC,
    * stratum ASC) ties. Only the stratum-count table (bounded by the number
    * of strata) reaches the driver; membership is the one [[weightedMix]]
    * shuffle. */
  def temperatureMix(df: DataFrame, idCol: Column, stratumCol: Column,
                     total: Int, tau: Double = 0.5): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // stratum keys as STRINGS throughout (count, quota map, membership
    // probe) so a numeric stratum column can't silently mismatch the
    // map's key type
    val sKey = stratumCol.cast("string")
    val rawCounts = df.groupBy(sKey.as("__s"))
      .agg(count(lit(1)).as("__n"))
      .as[(String, Long)].collect()
    // fail fast with INPUT-oriented messages: a null stratum would NPE in
    // sortBy / the typedlit map below, and an empty input would surface as
    // apportionOrdered's generic weights require — name the real problem.
    require(rawCounts.nonEmpty,
      "temperatureMix: input DataFrame is empty — no strata to apportion")
    require(rawCounts.forall(_._1 != null),
      "temperatureMix: stratum column contains NULL — filter or fill nulls " +
        "before mixing (a null stratum has no defined quota)")
    val counts = rawCounts.sortBy(_._1).toSeq
    val weights = counts.map { case (k, n) =>
      (k, if (tau == 0.5) math.sqrt(n.toDouble) else math.pow(n.toDouble, tau))
    }
    val quota = typedlit(apportionOrdered(weights, total).toMap)
    df.withColumn("__h", mix2(idCol))
      .withColumn("sample_rank",
        row_number().over(Window.partitionBy(stratumCol).orderBy(col("__h"), idCol)))
      .filter(col("sample_rank") <= coalesce(element_at(quota, sKey), lit(0)))
      .drop("__h")
  }

  /** [[apportion]] with a DETERMINISTIC weight-sum order: `weights` must
    * arrive sorted by key, and the sum folds left-to-right in that order —
    * float addition is not associative, and an arbitrary Map-iteration sum
    * could differ in the last ulp from an external replay, flipping a
    * floor() on an exact-half share. Same largest-remainder rule as
    * [[apportion]]. */
  private[graft] def apportionOrdered(weights: Seq[(String, Double)],
                                      total: Int): Seq[(String, Int)] = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0) &&
      weights.map(_._2).sum > 0.0, "weights must be non-negative, not all zero")
    val wSum = weights.foldLeft(0.0) { case (a, (_, w)) => a + w }
    val exact = weights.map { case (k, w) => (k, w / wSum * total) }
    val floored = exact.map { case (k, e) => (k, e.toInt) }
    val leftover = total - floored.map(_._2).sum
    val bump = exact
      .map { case (k, e) => (k, e - math.floor(e)) }
      .sortBy { case (k, r) => (-r, k) }
      .take(leftover).map(_._1).toSet
    floored.map { case (k, n) => (k, if (bump(k)) n + 1 else n) }
  }

  private[graft] def apportion(weights: Map[String, Double],
                                   total: Int): Map[String, Int] = {
    require(weights.nonEmpty && weights.values.forall(_ >= 0.0) &&
      weights.values.sum > 0.0, "weights must be non-negative, not all zero")
    val wSum = weights.values.sum
    val exact = weights.view.mapValues(w => w / wSum * total).toMap
    val floored = exact.view.mapValues(_.toInt).toMap
    val leftover = total - floored.values.sum
    val byRemainder = exact.toSeq
      .map { case (k, e) => (k, e - math.floor(e)) }
      .sortBy { case (k, r) => (-r, k) }
      .take(leftover).map(_._1).toSet
    floored.map { case (k, n) => k -> (if (byRemainder(k)) n + 1 else n) }
  }

  /** Deterministic train/val/test split: a second LCG (independent constants
    * from [[shardAssign]]'s) maps each id to a percentile bucket 0-99;
    * `cuts` are cumulative percentage thresholds, e.g. 90/95 → 90% train,
    * 5% val, 5% test. Pure projection — no shuffle, no RNG state, stable
    * under re-runs and incremental appends (a document's split never changes
    * when new documents arrive — the property sampling by `rand()` lacks).
    */
  def splitAssign(df: DataFrame, idCol: Column,
                  trainPct: Int = 90, valPct: Int = 5,
                  alias: String = "split"): DataFrame = {
    require(trainPct + valPct < 100, "train + val must leave room for test")
    val m = 2147483648L // 2^31
    // floor((h*100)/2^31): h*100 < 2^38, exact in double, ≡ integer division
    val bucket = floor((mix2(idCol) * 100) / lit(m)).cast("long")
    df.withColumn(alias,
      when(bucket < trainPct, "train")
        .when(bucket < trainPct + valPct, "val")
        .otherwise("test"))
  }
}
