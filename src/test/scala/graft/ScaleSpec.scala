package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew
import graft.analytics.SessionQueries

/** Scale-mechanics specs: salted aggregation/join equal their direct
  * counterparts; bucketed tables co-locate the join (no shuffle exchange);
  * the HLL sketch lands within its error bound.
  */
class SkewSpec extends SparkSpec {

  test("saltedSum equals direct groupBy sum") {
    val li = Tables.lineitem(spark, sf)
    val direct = li.groupBy("l_returnflag")
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("s"))
    val salted = Skew.saltedSum(li, Seq("l_returnflag"),
      col("l_quantity").cast("decimal(18,2)"), "s")
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("saltCol override keeps results equal while spreading duplicate rows") {
    import spark.implicits._
    // bit-identical rows of one hot key: the default whole-row salt sends
    // them all to one bucket; a unique-id salt spreads them — results equal
    val hot = spark.range(1000).select(lit("hot").as("k"), lit(1L).as("v"),
      col("id"))
    val direct = hot.groupBy("k").agg(sum(col("v")).as("s"))
    val salted = Skew.saltedSum(hot, Seq("k"), col("v"), "s",
      saltCol = Some(xxhash64(col("id"))))
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }

  test("saltedJoin equals direct join") {
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_custkey", "o_totalprice")
    val cust = Tables.customer(spark, sf).select(
      col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    val direct = ord.join(cust, "o_custkey")
    val salted = Skew.saltedJoin(ord, cust, "o_custkey", saltBuckets = 8)
      .select(direct.columns.map(col): _*)
    assert(direct.count() === salted.count())
    assert(direct.exceptAll(salted).isEmpty && salted.exceptAll(direct).isEmpty)
  }
}

class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    val db = "bucketdemo"
    spark.sql(s"DROP TABLE IF EXISTS ${db}_orders")
    spark.sql(s"DROP TABLE IF EXISTS ${db}_customer")
    graft.sources.Bucketed.write(Tables.orders(spark, sf),
      s"${db}_orders", "o_custkey", 8, sortCols = Seq("o_custkey"))
    graft.sources.Bucketed.write(
      Tables.customer(spark, sf).selectExpr("c_custkey AS o_custkey", "c_mktsegment"),
      s"${db}_customer", "o_custkey", 8, sortCols = Seq("o_custkey"))

    // disable broadcast so the join would otherwise shuffle both sides
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table(s"${db}_orders")
        .join(spark.table(s"${db}_customer"), "o_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n${plan.take(1500)}")
      assert(joined.count() === Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf),
          col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor"
    ).map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      import spark.implicits._
      // 200k rows on ONE key vs a trickle on the rest: the hot partition
      // dwarfs the others and AQE must split it
      val fact = spark.range(200000).select(
        when(col("id") % 100 =!= 0, 0L).otherwise(col("id")).as("k"),
        col("id").as("v"))
      val dim = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = fact.join(dim, "k")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE should have split the hot key's partition:\n${p.take(2000)}")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("date-partitioned layout prunes partitions at the scan (PartitionFilters)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString + "/events"
    val events = Tables.events(spark, sf).withColumn("d", to_date(col("ts")))
    events.write.partitionBy("d").parquet(dir)
    val day = events.select(max(col("d"))).head.getDate(0)
    val q = spark.read.parquet(dir).filter(col("d") === lit(day))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
    q.collect()
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("PartitionFilters: [isnotnull(d") || p.contains(s"PartitionFilters: [(d"),
      s"date filter must prune partitions, not scan-and-filter:\n${p.take(1500)}")
    assert(q.count() === events.filter(col("d") === lit(day))
      .select("event_type").distinct().count())
  }

  test("aggregation on the bucket key runs without a shuffle exchange") {
    graft.sources.Bucketed.write(Tables.lineitem(spark, sf),
      "bucketdemo_li", "l_orderkey", 8)
    val agg = graft.sources.Bucketed.table(spark, "bucketdemo_li")
      .groupBy("l_orderkey").agg(count(lit(1)).as("n"))
    agg.collect()
    val p = agg.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(!p.contains("Exchange hashpartitioning(l_orderkey"),
      s"bucketed aggregation must not shuffle:\n${p.take(1500)}")
    assert(agg.count() ===
      Tables.lineitem(spark, sf).select("l_orderkey").distinct().count())
  }
}

/** Adversarial skew for the valuation fold (SURVEY §7.4's top risk): one
  * (item, warehouse) group holding 50% of a 2M-row ledger. The fold is
  * order-dependent and cannot split a key, so the hot group must complete
  * inside ONE task on each path:
  *   - `revalue` (groupByKey.flatMapGroups) buffers and sorts the 1M-row
  *     group in executor memory — the bound the scaladoc documents;
  *   - `revalueStreaming` (repartition + sortWithinPartitions) leans on
  *     Spark's spill-capable external sort and folds with O(1) state, so a
  *     group LARGER than executor memory still finishes — the 100 TB path.
  * Both must agree exactly (same doubles) with a driver-side brute-force
  * re-fold of the hot group.
  */
/** Hot-key resilience for the corpus-dedup doc-frequency shuffles (r4
  * verdict item 6): a single viral span/line shared by EVERY document is the
  * adversarial input. Fixtures `repartition` round-robin first — a
  * Range-derived id is otherwise already clustered, which silently satisfies
  * the aggregates' distribution requirements and hides every exchange this
  * spec exists to inspect.
  *
  * History: `dupSpanFraction` originally joined doc-frequency back on the
  * fingerprint; this spec's fixture proved AQE does NOT split that join's
  * viral partition (the fp exchange is reused by the frequency aggregate,
  * and OptimizeSkewedJoin skips reused stages), so the operator was
  * restructured to need no fingerprint join at all — these tests pin the
  * skew-safe shapes both operators now share: two-phase countDistinct
  * (viral key spread by (key, doc) in phase 1, bounded partials merged in
  * phase 2) and doc-keyed aggregates.
  */
class DedupSkewSpec extends SparkSpec {

  private val viral5 = "viral0 viral1 viral2 viral3 viral4"

  test("dupSpanFraction: viral fingerprint never funnels into one partition — no fp join, (fp,doc) spread, exact fractions") {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      // model 100 TB: per-key frames are corpus-sized there, forbid broadcast
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 20k docs, each = the shared viral 5-token span + a unique 5-token
      // span: the viral fingerprint occurs 20000x any other key
      val docs = spark.range(20000).select(col("id").as("doc_id"),
        concat(lit(viral5 + " "),
          concat_ws(" ", (0 until 5).map(j => concat(lit(s"u${j}_"), col("id"))): _*))
          .as("text"))
        .repartition(8) // arbitrary layout, as on a real cluster
      val scored = graft.operators.Dedup.dupSpanFraction(docs, "doc_id", "text",
        spanTokens = 5, flagAt = 0.5)
      val rows = scored.collect()
      val plan = scored.queryExecution.executedPlan.toString
      // the hot key must never be a join key: the only join is doc-keyed
      assert(!"Join \\[fp".r.findFirstIn(plan).isDefined,
        s"no join may key on the fingerprint:\n${plan.take(2000)}")
      // phase-1 spread of the doc-frequency: an exchange keyed (fp, doc)
      assert("hashpartitioning\\(fp#\\d+, doc_id#\\d+".r.findFirstIn(plan).isDefined,
        s"doc-frequency must spread the viral fingerprint by (fp, doc) first:\n${plan.take(2000)}")
      // every doc: 2 distinct spans, 1 duplicated -> dup_frac exactly 0.5
      assert(rows.length === 20000)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_spans") === 2L && r.getAs[Long]("n_dup_spans") === 1L
          && r.getAs[Double]("dup_frac") === 0.5 && r.getAs[Boolean]("is_dup"),
          s"wrong span accounting for doc ${r.get(0)}: $r")
      }
    } finally saved.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("repeatedSpans: viral anchor gram never keys a join — df==1 identity holds at 20k-doc skew") {
    val conf = spark.conf
    val saved = conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // 20k docs = one shared viral 8-token run + 8 unique tokens: the
      // viral 8-gram occurs 20000x; every straddling gram is unique
      val viral8 = (0 until 8).map(i => s"v$i").mkString(" ")
      val docs = spark.range(20000).select(col("id").as("doc_id"),
        concat(lit(viral8 + " "),
          concat_ws(" ", (0 until 8).map(j => concat(lit(s"u${j}_"), col("id"))): _*))
          .as("text"))
        .repartition(8)
      val out = graft.operators.Dedup.repeatedSpans(docs, "doc_id", "text", minLen = 8)
      val rows = out.collect()
      val plan = out.queryExecution.executedPlan.toString
      // the viral gram must never be a join key (it would funnel 20000
      // occurrences into one partition); unique occurrences come out of the
      // count aggregate instead and the anti-join keys on (doc_id, p)
      assert(!"Join \\[g#".r.findFirstIn(plan).isDefined,
        s"no join may key on the gram:\n${plan.take(2000)}")
      assert(rows.length === 20000)
      rows.foreach { r =>
        assert(r.getAs[Long]("n_tokens") === 16L &&
          r.getAs[Long]("n_spans") === 1L &&
          r.getAs[Long]("n_repeated_tokens") === 8L &&
          r.getAs[Double]("repeated_frac") === 0.5 &&
          r.getAs[String]("cleaned_text").startsWith("u0_"),
          s"wrong span accounting: $r")
      }
    } finally saved.fold(conf.unset("spark.sql.autoBroadcastJoinThreshold"))(
      conf.set("spark.sql.autoBroadcastJoinThreshold", _))
  }

  test("dropBoilerplateLines: viral-line doc frequency is two-phase (spread on (line, doc) first), results exact") {
    // one cookie-banner line in all 20k docs + a unique line per doc
    val docs = spark.range(20000).select(col("id").as("doc_id"),
      concat(lit("ACCEPT ALL COOKIES\n"), concat(lit("unique line "), col("id")))
        .as("text"))
      .repartition(8)
    val cleaned = graft.operators.Dedup.dropBoilerplateLines(docs, "doc_id", "text")
    val rows = cleaned.collect()
    val plan = cleaned.queryExecution.executedPlan.toString
    // phase-1 exchange must partition on (line, doc) — the viral line spreads
    // over every reducer instead of landing on one; phase 2 then merges
    // bounded per-partition partial counts on line alone
    assert("hashpartitioning\\(line#\\d+L?, doc_id#\\d+".r.findFirstIn(plan).isDefined,
      s"countDistinct must spread the hot line by (line, doc) first:\n${plan.take(2000)}")
    assert(rows.length === 20000)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") === 1L && r.getAs[Long]("n_dropped") === 1L,
        s"boilerplate accounting wrong for doc ${r.get(0)}: $r")
      assert(r.getAs[String]("text").startsWith("unique line "))
    }
  }
}

object ValuationSkewFixture extends Serializable {
  import java.sql.Timestamp
  import graft.operators.StockLedgerRow

  def mkRow(item: String, seq: Long): StockLedgerRow = {
    val vt =
      if (seq % 13 == 0) "Stock Reconciliation"
      else if (seq % 3 == 0) "Purchase Receipt"
      else "Delivery Note"
    val qty =
      if (vt == "Purchase Receipt") (seq % 7 + 1).toDouble
      else if (vt == "Stock Reconciliation") (seq % 5 + 10).toDouble
      else -((seq % 3) + 1).toDouble
    StockLedgerRow(
      item_code = item, warehouse = "W1",
      posting_ts = new Timestamp(1600000000000L + seq * 1000L),
      creation = new Timestamp(1600000000000L + seq * 1000L),
      voucher_type = vt,
      actual_qty = qty,
      qty_after_transaction = if (vt == "Stock Reconciliation") qty else 0.0,
      incoming_rate = if (vt == "Purchase Receipt") (seq % 11 + 1) * 0.25 else 0.0,
      valuation_rate = (seq % 9 + 1) * 0.5,
      stock_value = if (vt == "Stock Reconciliation") qty * ((seq % 9 + 1) * 0.5) else 0.0,
      stock_value_difference =
        if (vt == "Purchase Receipt") qty * ((seq % 11 + 1) * 0.25) else -qty * 0.75)
  }
}

class ValuationSkewScaleSpec extends SparkSpec {
  import graft.operators.Valuation

  test("2M-row ledger with one group holding 50%: both fold paths finish and match brute force") {
    import spark.implicits._
    val n = 2000000L
    val hotN = n / 2
    // rows 0..1M-1: the hot group; rows 1M..2M-1: 1000 cold keys x 1000 rows
    val ledger = spark.range(n).map { i =>
      if (i < hotN) ValuationSkewFixture.mkRow("I_HOT", i)
      else ValuationSkewFixture.mkRow(s"I_${i % 1000}", (i - hotN) / 1000)
    }

    // driver-side brute force over the hot group's input (the oracle)
    val hotInput = ledger.filter(_.item_code == "I_HOT").collect()
    assert(hotInput.length === hotN)
    val expected = Valuation.foldGroup(hotInput.iterator, Valuation.zeroState).toArray

    def hotSorted(out: org.apache.spark.sql.Dataset[graft.operators.ValuedStockRow]) =
      out.filter(_.item_code == "I_HOT").collect().sortBy(_.posting_ts.getTime)

    val inMem = Valuation.revalue(ledger)
    assert(inMem.count() === n, "flatMapGroups fold must cover every row")
    assert(hotSorted(inMem) === expected,
      "flatMapGroups fold diverged from brute force on the hot group")

    val streamed = Valuation.revalueStreaming(ledger)
    assert(streamed.count() === n, "streaming fold must cover every row")
    assert(hotSorted(streamed) === expected,
      "secondary-sort streaming fold diverged from brute force on the hot group")
  }
}

class SketchSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact at rsd=0.02") {
    // q39 emits the tolerance verdicts directly (so the oracle can assert
    // them); the spec checks every flag is true for both id columns
    val rows = SessionQueries.queries("q39_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("users_within_5pct") &&
        r.getAs[Boolean]("events_within_5pct"),
        s"${r.getAs[String]("event_type")}: HLL estimate drifted past 5%")
    }
  }

  test("approx_percentile (the q48 scale path) lands within the accuracy rank bound") {
    import org.apache.spark.sql.functions._
    // exact percentile sorts the group; approx_percentile keeps a bounded
    // GK sketch — at accuracy A the rank error is n/A, so with the default
    // 10000 the value must sit within that rank window of the exact one
    val o = Tables.orders(spark, sf)
    val rows = o.groupBy("o_orderstatus")
      .agg(expr("percentile(o_totalprice, 0.5)").as("exact_p50"),
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("approx_p50"),
        expr("percentile(o_totalprice, 0.45)").as("lo_rank"),
        expr("percentile(o_totalprice, 0.55)").as("hi_rank"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val a = r.getAs[Double]("approx_p50")
      assert(a >= r.getAs[Double]("lo_rank") && a <= r.getAs[Double]("hi_rank"),
        s"${r.get(0)}: approx $a outside the exact p45-p55 band")
    }
  }

  test("2M-row synthetic smoke: core aggregates and dedup stay distributed and finish") {
    // 50x the sf0.1 fixture via the DSv2 generator — the partition-planned
    // reader gives every core 1/32nd of the stream, no driver funnel
    val big = spark.read.format("graft-synthetic")
      .option("rows", 2000000L).option("numPartitions", 32).load()
    assert(big.rdd.getNumPartitions === 32, "generator must honor partition planning")

    // map-side-combinable rollup: category cardinality is tiny, so the
    // shuffle carries ~categories x mappers rows, not 2M
    val agg = big.groupBy("category")
      .agg(count(lit(1)).as("n"), sum("amount").as("total"))
      .collect()
    assert(agg.map(_.getLong(1)).sum === 2000000L)

    // exact dedup at 2M: min_by keeps the shuffle at surviving candidates
    val dups = graft.operators.Dedup.exact(
      big.select(col("txn_id"), col("txn_uuid").as("text")), "text",
      Seq(col("txn_id")))
    assert(dups.count() === 2000000L, "uuids are unique - dedup must keep all")

    // bucketed global cumsum (the q57 shape) at 2M ids without a
    // single-partition window
    val packed = graft.operators.Packing.bucketedCumSum(
      big.select(col("txn_id")).withColumn("one", lit(1L)),
      col("txn_id"), floor(col("txn_id") / 65536L).cast("long"), col("one"), "cum")
    val last = packed.agg(max("cum")).head().getLong(0)
    assert(last === 2000000L, "cumsum must cover every row exactly once")

    // consecutive global row number at 2M without a single-partition sort:
    // sum 1..2M pins both completeness and consecutiveness in one aggregate
    val numbered = graft.operators.Windows.globalRowNumberComposed(
      big.select(col("txn_id")), "txn_id")
    val s = numbered.agg(sum(col("entry_no")), count(lit(1))).head()
    assert(s.getLong(1) === 2000000L)
    assert(s.getLong(0) === 2000000L * 2000001L / 2L,
      "entry numbers must be exactly 1..2M")
  }
}

/** The full fuzzy-dedup DAG at a scale where every stage's mechanics are
  * exercised for real: 20k documents (10k designed near-dup pairs), no
  * broadcast crutch — signatures, banding, the bucket-size gate, candidate
  * verification, and label propagation all run distributed. Asserts the
  * contract precisely: verification makes FALSE merges impossible (hard
  * zero), while recall belongs to the LSH layer (floored, not pinned).
  */
class FuzzyDedupScaleSpec extends SparkSpec {

  test("20k-doc fuzzy dedup: zero false merges, near-dup recall floored, survivors consistent") {
    import spark.implicits._
    // base text i: 10 unique-ish tokens; variant i+1000000 appends one token
    // (token-set Jaccard 10/11 = 0.909 >= 0.8, shares 8 of its 9 3-shingles)
    val base = spark.range(10000).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until 10).map(j =>
        concat(lit(s"w${j}_"), col("id") * 31 + j)): _*).as("text"))
    val variants = base.select((col("doc_id") + 1000000L).as("doc_id"),
      concat(col("text"), lit(" appended_tail_token")).as("text"))
    val docs = base.unionByName(variants).repartition(16)

    val out = graft.operators.Dedup.fuzzyDedup(docs, "doc_id", "text",
      threshold = 0.8)
    val rows = out.select("doc_id", "cluster_id", "kept")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length === 20000)

    // ZERO false merges: a cluster may only ever contain {i, i+1000000}
    rows.foreach { case (id, cl, _) =>
      val baseOf = if (id >= 1000000L) id - 1000000L else id
      val clBase = if (cl >= 1000000L) cl - 1000000L else cl
      assert(clBase === baseOf,
        s"doc $id merged into foreign cluster $cl — verification must forbid this")
    }
    // recall floor: the LSH layer must surface the vast majority of the
    // designed pairs (8/9 shared shingles collide in >= 1 of 8 bands with
    // overwhelming probability)
    val merged = rows.count { case (id, cl, _) => id >= 1000000L && cl < 1000000L }
    assert(merged >= 9500, s"only $merged of 10000 designed pairs merged")
    // survivor bookkeeping: kept == (cluster representative), one per cluster
    val keptCount = rows.count(_._3)
    assert(keptCount === 20000 - merged, s"kept=$keptCount vs merged=$merged")
  }
}
