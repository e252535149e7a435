package graft

/** Physical-plan regression guards: the properties that matter at 100 TB —
  * dims broadcast (no fact shuffle), filters reach the parquet scan, top-k
  * plans as TakeOrderedAndProject (no global sort), whole-stage codegen
  * covers the hot paths. A change that silently degrades any of these fails
  * here, not in production.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q2 star join: every dimension joins as BroadcastHashJoin, no SortMergeJoin") {
    val p = plan("q2_star_revenue_by_nation")
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "fact side must not sort-merge against dims")
  }

  test("q1 pricing summary: shipdate filter pushes into the parquet scan") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
  }

  test("q1 reads only the columns it needs") {
    val p = plan("q1_pricing_summary")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"projection must prune unused lineitem columns: $readSchema")
  }

  test("q3 top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan("q3_topk_parts")
    assert(p.contains("TakeOrderedAndProject"), p.take(2000))
  }

  test("q12 anti join broadcasts the key side") {
    val p = plan("q12_customers_no_orders")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(2000))
  }

  test("aggregates run partial+final (map-side combine before the shuffle)") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("HashAggregate"), p.take(2000))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expected partial and final HashAggregate stages")
  }

  test("q21 hierarchy: left joins broadcast the dimension side") {
    val p = plan("q21_hierarchy_rollup")
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin"), p.take(1500))
  }

  test("q41 as-of join: ONE hash shuffle regardless of side sizes") {
    val p = plan("q41_asof_join")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(hashExchanges === 1, s"expected exactly 1 hash exchange, got $hashExchanges:\n${p.take(1500)}")
    assert(p.contains("Window"), "as-of must be the union-window formulation")
  }

  test("q38 sessionize: windows share the user_id partitioning (no re-shuffle between them)") {
    val p = plan("q38_sessionize_batch")
    // lag + cumsum windows over the same (user_id, ts) ordering must plan as
    // consecutive Window nodes over ONE exchange
    val idx = p.indexOf("Exchange hashpartitioning(user_id")
    assert(idx >= 0, p.take(1500))
    val afterFirst = p.substring(0, idx)
    assert("Window".r.findAllIn(afterFirst).length >= 2 ||
      "Window".r.findAllIn(p).length >= 2, "expected both windows planned")
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).length === 1,
      "lag and cumsum must reuse one user_id shuffle")
  }

  test("q47 range join: bucketed equi-join, never a nested loop") {
    val p = plan("q47_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated into a nested loop:\n${p.take(2000)}")
  }

  test("q49 rollup: all grouping levels share ONE shuffle (Expand, not a union of groupBys)") {
    val df = SparkEntry.queries("q49_grouping_rollup")(spark, sf)
    df.collect()
    // AQE's tree string appends the pre-adaptive "Initial Plan" — count
    // exchanges only in the final section
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("Expand"), s"rollup should plan an Expand:\n${p.take(2000)}")
    assert(!p.contains("Union"), "rollup must not union per-level aggregations")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1, s"expected 1 aggregation shuffle, got $exchanges")
  }

  test("q57 packing: bucket offsets broadcast; the big window partitions by bucket") {
    val p = plan("q57_pack_sequences")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket offsets must broadcast-join, not shuffle the corpus:\n${p.take(2000)}")
    assert(p.contains("windowspecdefinition(__bucket"),
      "corpus-side running sum must partition by __bucket (never a global window)")
  }

  test("q59 winnowing: pure projection pipeline, no hash shuffle before the sort") {
    val p = plan("q59_winnow_fingerprints")
    assert(!p.contains("Exchange hashpartitioning"),
      s"winnowing must stay shuffle-free (HOF projection + explode only):\n${p.take(2000)}")
  }

  test("q69 hopping windows: bucket expansion feeds ONE aggregation shuffle") {
    val df = SparkEntry.queries("q69_hopping_windows")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert(p.contains("Expand") || p.contains("Generate"),
      s"hopping windows should expand buckets in-plan:\n${p.take(1500)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges === 1,
      s"expected 1 aggregation shuffle, got $exchanges:\n${p.take(1500)}")
  }

  test("q67 basket lift: dimension counts broadcast, top-k without global sort") {
    val df = SparkEntry.queries("q67_basket_lift")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"item-count joins must broadcast:\n${p.take(1500)}")
    assert(!p.contains("SortMergeJoin"), "no sort-merge in the lift join tree")
    assert(p.contains("TakeOrderedAndProject"),
      "top-20 must plan as TakeOrderedAndProject")
  }

  test("whole-stage codegen covers the scan→filter→aggregate hot path") {
    // AQE materializes the final plan only on execution
    val df = SparkEntry.queries("q1_pricing_summary")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // treeString renders WholeStageCodegen stages as "*(n) " prefixes
    assert(p.contains("*(1) HashAggregate") || p.contains("WholeStageCodegen"), p.take(2000))
    assert(p.contains("*(1) Filter"), "filter must run inside codegen stage 1")
  }
}
