package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY §2.4).
  *
  * All reference joins are equi-joins plus one theta residual (the basket
  * pair join); the scale-relevant decision is WHICH side broadcasts. Dims in
  * the reference star are tiny (employee/operation/size/colour/style masters),
  * so every star-join dim is broadcast here — at 100 TB the fact table never
  * shuffles for these joins.
  */
object Joins {

  /** J1: star inner equi-join — fact joined to N small dimensions
    * (`dags/hanger_lane.py:341-348`, 7-way). Each dim is broadcast so the plan
    * is a chain of BroadcastHashJoins over a single fact scan: no shuffle,
    * no sort, survives any fact-side scale-up.
    */
  def star(fact: DataFrame, dims: Seq[(DataFrame, Column)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, cond)) =>
      acc.join(broadcast(dim), cond, "inner")
    }

  /** J2: left self-join hierarchy — one table aliased N times to resolve
    * upper levels, with composite-key conditions allowed
    * (`dags/ssg_gl_etl.py:321-326`: GL ⟕ Coa3 ⟕ UL_COA ×3 on
    * `ULID1=ID1 AND ULID2=ID2`). Dimension side broadcasts. */
  def hierarchy(base: DataFrame, levels: Seq[(DataFrame, Column)]): DataFrame =
    levels.foldLeft(base) { case (acc, (dim, cond)) =>
      acc.join(broadcast(dim), cond, "left")
    }

  /** J3 + A6 + O2: market-basket pair frequency
    * (`scripts/SQL/Product_Association.sql:5-23`).
    *
    * DISTINCT items per basket, self-joined on the basket key with the
    * `a.item < b.item` theta residual to dedup unordered pairs, then pair
    * frequency + top-k. Catalyst plans the equi part as a shuffle join on the
    * basket key and applies the `<` as a residual filter — at scale this
    * shuffles each side once on the basket key, and the top-k is a
    * TakeOrderedAndProject (no global sort materialization).
    */
  def basketPairs(items: DataFrame, basketKeys: Seq[String], itemCol: String,
                  topK: Int): DataFrame = {
    val distinctItems = items.select((basketKeys :+ itemCol).map(col): _*).distinct()
    val a = distinctItems.withColumnRenamed(itemCol, "item_a")
    val b = distinctItems.withColumnRenamed(itemCol, "item_b")
    a.join(b, basketKeys)
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("pair_count"))
      .orderBy(desc("pair_count"), asc("item_a"), asc("item_b"))
      .limit(topK)
  }

  /** One-shuffle variant of [[basketPairs]]: collect each basket's distinct
    * item set (one shuffle, map-side combined), expand ordered pairs from
    * the sorted set in a projection, count pairs (second, much smaller
    * shuffle after map-side combine). Same result (JoinsSpec); preferable
    * at scale because the self-join's basket-key shuffle carried EVERY item
    * row twice, while this carries each basket once. Baskets are bounded
    * (items per order), so the per-row expansion is bounded too. */
  /** Upper-triangle pair expansion of a sorted `__items` array — the ONE
    * definition [[basketPairsViaSets]] and [[basketLift]] both explode. */
  private def orderedPairsExpr: String =
    """flatten(transform(__items, (x, i) ->
      |  transform(slice(__items, i + 2, size(__items)), y -> struct(x AS item_a, y AS item_b))))"""
      .stripMargin

  def basketPairsViaSets(items: DataFrame, basketKeys: Seq[String], itemCol: String,
                         topK: Int): DataFrame = {
    val sets = items.groupBy(basketKeys.map(col): _*)
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
    val pairs = sets.select(explode(expr(orderedPairsExpr)).as("p"))
      .select(col("p.item_a"), col("p.item_b"))
    pairs.groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("pair_count"))
      .orderBy(desc("pair_count"), asc("item_a"), asc("item_b"))
      .limit(topK)
  }

  /** Market-basket LIFT — the statistical extension of the reference's
    * pair-frequency analysis (`scripts/SQL/Product_Association.sql`):
    * lift(a,b) = P(a,b) / (P(a)·P(b)) = n_ab·N / (n_a·n_b). Computed as a
    * single division of exact integer products (all < 2^53), so the double
    * is bit-identical across engines — log-PMI would hinge on libm `ln`
    * ulps and never hash-match an oracle.
    *
    * Shuffles: one basket-set aggregation (as [[basketPairsViaSets]]), one
    * pair count, one item count; item counts are dimension-sized and
    * broadcast. N arrives as a broadcast scalar, never a driver collect. */
  def basketLift(items: DataFrame, basketKeys: Seq[String], itemCol: String,
                 minPairCount: Long, topK: Int): DataFrame = {
    val distinctItems = items.select((basketKeys :+ itemCol).map(col): _*).distinct()
    val sets = distinctItems.groupBy(basketKeys.map(col): _*)
      .agg(sort_array(collect_set(col(itemCol))).as("__items"))
    val pairCounts = sets.select(explode(expr(orderedPairsExpr)).as("p"))
      .select(col("p.item_a"), col("p.item_b"))
      .groupBy("item_a", "item_b")
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val itemCounts = distinctItems.groupBy(col(itemCol)).agg(count(lit(1)).as("n_i"))
    val total = distinctItems.select(basketKeys.map(col): _*).distinct()
      .agg(count(lit(1)).as("__n"))
    pairCounts
      .join(broadcast(itemCounts.select(col(itemCol).as("item_a"), col("n_i").as("__na"))), "item_a")
      .join(broadcast(itemCounts.select(col(itemCol).as("item_b"), col("n_i").as("__nb"))), "item_b")
      .crossJoin(broadcast(total))
      .withColumn("lift", graft.functions.Rounding.roundLikeC(
        (col("n_ab") * col("__n")).cast("double") / (col("__na") * col("__nb")), 6))
      .select("item_a", "item_b", "n_ab", "lift")
      .orderBy(desc("lift"), asc("item_a"), asc("item_b"))
      .limit(topK)
  }

  /** J6: left join + null-test classification
    * (`scripts/SQL/new_v_return_plus_retention_rate.sql:34-41`). */
  def classify(left: DataFrame, right: DataFrame, keys: Seq[String],
               probe: String, label: String, ifMatch: String, ifMiss: String): DataFrame =
    left.join(right, keys, "left")
      .withColumn(label, when(col(probe).isNotNull, lit(ifMatch)).otherwise(lit(ifMiss)))

  /** J7/P10: IN-subquery semi filter (`item_valuation_update.py:73`). */
  def semi(df: DataFrame, keys: DataFrame, on: Seq[String]): DataFrame =
    df.join(keys, on, "left_semi")

  /** J8/P12: key-level anti join (`ETL Incremental Load` nb cell 20). */
  def anti(df: DataFrame, keys: DataFrame, on: Seq[String]): DataFrame =
    df.join(keys, on, "left_anti")

  /** Size-tiered key-membership slice of a BIG table — the late-data
    * rescan's read strategy, shared by the behavioral advances
    * ([[graft.operators.Aggregates.funnelAdvanceLate]],
    * [[graft.operators.Sessions.advanceLate]]). `keys` is a single-column
    * distinct key frame the caller has pinned and counted (`nKeys`); `key`
    * is the matching expression over `df`. Non-null keys only (the
    * [[StateKeys.asLong]] contract) — isin and semi-join equality then
    * agree exactly.
    *
    * Tiers, chosen by `nKeys`:
    *  1. `<= maxPushdown`: collect the ids and slice with `key.isin(ids)` —
    *     a PUSHABLE predicate: against a parquet history clustered/sorted
    *     by the key, the scan prunes at row-group/page grain from footer
    *     statistics, so the read is O(affected keys' rows), not O(history).
    *     This is the 100 TB path for the normal trickle of late data.
    *  2. `<= maxBroadcast`: broadcast left-semi — no pushdown (the scan
    *     reads everything) but the big side streams, never shuffles.
    *  3. above: plain shuffle left-semi — a backfill-sized key set must
    *     not be collected or broadcast (an unbounded driver-side build is
    *     the OOM the 100 TB framing forbids).
    */
  /** The pushdown tier's driver-side id list, collected ONCE — callers
    * slicing several frames by the same keys (the late routes run two
    * slices + one anti-slice per batch) pass the result to every call
    * instead of paying one collect job each. `None` above the pushdown
    * bound (the join tiers never need the ids). */
  def keyIdsIfSmall(keys: DataFrame, nKeys: Long,
                    maxPushdown: Int = 10000): Option[IndexedSeq[Any]] =
    if (nKeys > 0L && nKeys <= maxPushdown)
      Some(keys.collect().map(_.get(0)).toIndexedSeq)
    else None

  def keyedSlice(df: DataFrame, key: Column, keys: DataFrame, nKeys: Long,
                 maxPushdown: Int = 10000,
                 maxBroadcast: Long = 5000000L,
                 precollected: Option[IndexedSeq[Any]] = None): DataFrame = {
    if (nKeys == 0L) return df.filter(lit(false))
    if (nKeys <= maxPushdown) {
      val ids = precollected.getOrElse(keys.collect().map(_.get(0)).toIndexedSeq)
      df.filter(key.isin(ids: _*))
    } else {
      // the key frame's column gets an internal name so the join condition
      // can never be ambiguous against a same-named column of `df`
      val k2 = keys.toDF("__slice_key")
      if (nKeys <= maxBroadcast)
        df.join(broadcast(k2), key === k2("__slice_key"), "left_semi")
      else df.join(k2, key === k2("__slice_key"), "left_semi")
    }
  }

  /** [[keyedSlice]]'s complement: everything whose key is NOT in `keys`.
    * Same tiers; the pushdown tier is a pure NOT-isin filter (no join at
    * all). Requires non-null `key` values on the kept side — a null key
    * would survive a left-anti join but not a NOT-isin filter, so the
    * caller's state keys must be guarded ([[StateKeys.asLong]]). */
  def keyedAntiSlice(df: DataFrame, key: Column, keys: DataFrame,
                     nKeys: Long, maxPushdown: Int = 10000,
                     maxBroadcast: Long = 5000000L,
                     precollected: Option[IndexedSeq[Any]] = None): DataFrame = {
    if (nKeys == 0L) return df
    if (nKeys <= maxPushdown) {
      val ids = precollected.getOrElse(keys.collect().map(_.get(0)).toIndexedSeq)
      df.filter(!key.isin(ids: _*))
    } else {
      val k2 = keys.toDF("__slice_key")
      if (nKeys <= maxBroadcast)
        df.join(broadcast(k2), key === k2("__slice_key"), "left_anti")
      else df.join(k2, key === k2("__slice_key"), "left_anti")
    }
  }

  /** J9: as-of / argmax lookup — the row at max(orderCols) per group
    * (`scripts/test/item_valuation_update.py:98-120`, correlated subquery
    * decorrelated into a window). One shuffle on the group keys; at scale
    * prefer this over a self-join-on-max which would shuffle twice.
    */
  def latestPerKey(df: DataFrame, partitionKeys: Seq[String], orderCols: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partitionKeys.map(col): _*).orderBy(orderCols.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** Two-table as-of join: each left row picks the latest right row with
    * `right.ts <= left.ts` on the same keys (J9 generalized — the lookup the
    * reference fakes with a correlated max subquery).
    *
    * Union-window formulation, not a per-row subquery or range join: tag
    * sides, union, sort each key group by (ts, side) with right rows first
    * at equal ts (inclusive match), and carry the last non-null right
    * payload forward. ONE shuffle on the keys regardless of either side's
    * size — survives a 100× scale-up where a range join's quadratic bucket
    * pairs would not. Right/left column names must be disjoint apart from
    * the keys.
    */
  /** Planner-level as-of join — same semantics and output shape as
    * [[asOf]], executed by the dedicated physical operator
    * (`org.apache.spark.sql.graft.AsOfJoinExec`): both sides hash-shuffle
    * on the keys, sort (keys, ts) within partitions, and merge in ONE
    * forward pass with O(1) state — no window frame materialization, no
    * union of the two sides through a single sort.
    *
    * Registered on first use via `spark.experimental.extraStrategies`
    * (or session-wide with
    * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`).
    * JoinsSpec asserts result equality with [[asOf]] and the plan shape
    * (AsOfJoinExec + one Exchange per side).
    */
  def asOfNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                 leftTs: String, rightTs: String,
                 joinType: String = "inner"): DataFrame = {
    val payloadCols = right.columns.filterNot(c => keys.contains(c)).toSeq
    val joinedAll = org.apache.spark.sql.graft.AsOfJoinNative.asOf(
      left, right, keys, leftTs, rightTs, joinType)
    // match asOf's output: left columns + right payload (right keys drop).
    // Both sides carry the key names, so every column is picked by POSITION
    // in the join output (left attributes first, then right's).
    val leftCols = left.columns.indices.map(i =>
      org.apache.spark.sql.graft.AsOfJoinNative.columnAt(joinedAll, i))
    val rightPayload = payloadCols.map { c =>
      val idx = left.columns.length + right.columns.indexOf(c)
      org.apache.spark.sql.graft.AsOfJoinNative.columnAt(joinedAll, idx).as(c)
    }
    joinedAll.select(leftCols ++ rightPayload: _*)
  }

  /** `rightTieBreak`: deterministic ordering among right rows sharing the
    * same (keys, rightTs) — without it the matched payload for such ties is
    * whichever row the shuffle delivered last (same hazard
    * `Scd2.fromHistory`'s tieBreak exists for). Pass a sequence/offset
    * column when the right side can carry same-timestamp duplicates; the
    * LARGEST tie-break value wins (last write). [[asOfNative]] has no such
    * knob — it requires (keys, rightTs)-unique input. */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, joinType: String = "inner",
           rightTieBreak: Option[Column] = None): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(Seq("inner", "left").contains(joinType), s"unsupported: $joinType")
    val payloadCols = right.columns.filterNot(keys.contains)
    val r = right.select(
      keys.map(col) ++ Seq(col(rightTs).cast("timestamp").as("__ts"),
        lit(0).as("__side"), rightTieBreak.getOrElse(lit(0L)).as("__tb"),
        struct(payloadCols.map(col): _*).as("__r")): _*)
    val l = left.select(
      left.columns.map(col) ++ Seq(col(leftTs).cast("timestamp").as("__ts"),
        lit(1).as("__side")): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // left rows order AFTER right at equal ts via __side before __tb is
    // consulted, so their null __tb never matters
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val base = if (joinType == "inner") matched.filter(col("__m").isNotNull) else matched
    base.select(left.columns.map(col) ++
      payloadCols.map(c => col(s"__m.$c").as(c)): _*)
  }

  /** Range (interval-containment) join: each left "point" row matches the
    * right rows whose `[startCol, endCol)` interval contains its `pointCol`,
    * on equal `keys`. Timestamp-typed point/bounds.
    *
    * Bucketed formulation, not a theta join: a raw
    * `l.ts >= r.start AND l.ts < r.end` predicate on top of an equi-join on
    * the keys degenerates into per-key nested loops wherever keys repeat
    * (and into BroadcastNestedLoopJoin without keys). Instead, time is cut
    * into fixed `bucketWidth` buckets: points land in exactly one bucket,
    * intervals explode into the buckets they overlap, and the join becomes
    * a plain equi-join on (keys, bucket) — ONE hash shuffle per side,
    * SMJ/SHJ-eligible, AQE-skew-splittable — followed by the exact
    * containment filter. A point matches an interval in exactly one bucket
    * (the point's own), so no dedup pass is needed.
    *
    * `bucketWidth` trades replication for selectivity: right-side blow-up
    * is ceil(intervalLength / bucketWidth) + 1 rows per interval — pick it
    * near the typical interval length so the explode stays O(1) per
    * interval while buckets stay selective. Left/right non-key column
    * names must be disjoint.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                pointCol: String, startCol: String, endCol: String,
                bucketWidth: java.time.Duration): DataFrame = {
    val widthUs = bucketWidth.toNanos / 1000L
    require(widthUs > 0, "bucketWidth must be positive")
    val lb = left.withColumn("__bucket",
      floor(unix_micros(col(pointCol).cast("timestamp")) / widthUs))
    val rb = right.withColumn("__bucket",
      explode(sequence(
        floor(unix_micros(col(startCol).cast("timestamp")) / widthUs),
        floor(unix_micros(col(endCol).cast("timestamp")) / widthUs))))
    lb.join(rb, keys :+ "__bucket")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bucket")
  }
}
