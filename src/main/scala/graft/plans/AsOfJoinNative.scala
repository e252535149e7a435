/** Native planner-level as-of join: custom logical plan + planner strategy +
  * physical operator, registered through `SparkSessionExtensions` (or
  * `spark.experimental.extraStrategies` on an already-built session).
  *
  * Lives under `org.apache.spark.sql` because `Dataset.ofRows` and the
  * classic-session internals it builds on are `private[sql]` — the standard
  * placement for third-party plan nodes. Public API:
  * `graft.operators.Joins.asOfNative`.
  *
  * Why a custom operator: the composable formulations of as-of both carry
  * avoidable cost — the union-window form (graft.operators.Joins.asOf)
  * funnels left+right through ONE window sort and materializes a
  * last-non-null struct per row; a range-join form explodes candidates
  * before re-filtering. The dedicated operator gets exactly the plan a
  * distributed engine wants: hash-shuffle both sides on the keys
  * (EnsureRequirements inserts the exchanges from our declared
  * ClusteredDistribution, so AQE still re-plans them), sort each side
  * (keys, ts) within partitions, then ONE streaming merge pass per
  * partition with O(1) state — no buffered window frames, no candidate
  * blow-up, no single-partition hazard.
  *
  * Semantics (matches Joins.asOf and DuckDB ASOF JOIN): for each left row,
  * the single right row with equal keys and the greatest right-ts <=
  * left-ts; inner drops unmatched left rows, left-outer null-pads them.
  * Rows with null keys or null ts never match (SQL join semantics; the
  * right side skips them, a null left under outer null-pads).
  */
package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Logical as-of join. Constructed already-resolved (attributes are taken
  * from analyzed children), so the analyzer passes it through untouched. */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    isLeftOuter: Boolean) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Physical as-of join: co-partitioned (hash on keys), co-sorted
  * (keys, ts), merged in one forward pass per partition. State per
  * partition is one buffered right row + one candidate — O(1). */
case class AsOfJoinExec(
    leftKeys: Seq[Attribute], rightKeys: Seq[Attribute],
    leftTs: Attribute, rightTs: Attribute,
    isLeftOuter: Boolean,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  require(leftTs.dataType == rightTs.dataType,
    s"as-of ts types differ: ${leftTs.dataType} vs ${rightTs.dataType}")
  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of key types differ between sides")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // children are shuffled to a compatible hash partitioning by
  // EnsureRequirements (same contract SortMergeJoin uses)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTs).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  protected override def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val tsType = leftTs.dataType
    val leftOutput = left.output
    val rightOutput = right.output
    val lKeys = leftKeys; val rKeys = rightKeys
    val lTs = leftTs; val rTs = rightTs
    val outer = isLeftOuter

    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOutput)
      val lTsProj = UnsafeProjection.create(Seq(lTs), leftOutput)
      val rTsProj = UnsafeProjection.create(Seq(rTs), rightOutput)
      // final UnsafeProjection, same discipline as SortMergeJoinExec: a raw
      // JoinedRow handed upward crashes any parent that requires UnsafeRow
      // (sorts, exchanges, getByteArrayRdd on a bare collect)
      val outProj = UnsafeProjection.create(outAttrs, outAttrs)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val tsOrd = RowOrdering.createNaturalAscendingOrdering(Seq(tsType))

      new Iterator[InternalRow] {
        private val joined = new JoinedRow
        private val nullRight = new GenericInternalRow(rightOutput.size)
        // next unconsumed right row (copied: the child iterator reuses its
        // row buffer) — null means exhausted
        private var rHead: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
        // latest right row with rts <= current left ts, and its key
        private var candidate: InternalRow = _
        private var candidateKey: UnsafeRow = _
        private var nextRow: InternalRow = _

        private def advanceRight(): Unit =
          rHead = if (rIter.hasNext) rIter.next().copy() else null

        /** Advance the right side to the last row at-or-before (lk, ltsRow),
          * remembering it as the candidate; stop at the first row beyond. */
        private def catchUp(lk: UnsafeRow, l: InternalRow): Unit = {
          var done = false
          while (!done && rHead != null) {
            val rk = rKeyProj(rHead)
            if (rk.anyNull || rTsProj(rHead).isNullAt(0)) advanceRight()
            else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) advanceRight()
              else if (c == 0 && tsOrd.compare(rTsProj(rHead), lTsProj(l)) <= 0) {
                candidate = rHead
                candidateKey = rk.copy()
                advanceRight()
              } else done = true
            }
          }
        }

        // Lazy production: the JoinedRow is a shared buffer, so the next
        // output must not be assembled until AFTER the consumer is done
        // with the previous one — i.e. on the subsequent hasNext/next
        // call, never eagerly inside next() (that would corrupt the row
        // the caller is still holding).
        private def computeNext(): Unit = {
          while (nextRow == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyProj(l)
            val lNull = lk.anyNull || lTsProj(l).isNullAt(0)
            if (!lNull) catchUp(lk, l)
            val matched = !lNull && candidate != null &&
              keyOrd.compare(candidateKey, lKeyProj(l)) == 0
            if (matched) nextRow = joined(l, candidate)
            else if (outer) nextRow = joined(l, nullRight)
          }
        }

        override def hasNext: Boolean = {
          if (nextRow == null) computeNext()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (nextRow == null) computeNext()
          if (nextRow == null) throw new NoSuchElementException("empty iterator")
          val r = outProj(nextRow)
          nextRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] to [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts, outer) =>
      AsOfJoinExec(lk, rk, lts, rts, outer, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Session wiring + the DataFrame-level builder. */
object AsOfJoinNative {

  /** `spark.sql.extensions`-style injection for sessions built with
    * `.withExtensions(new GraftExtensions)` or
    * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`. */
  def inject(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)

  /** Idempotent runtime registration for an already-built session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val exp = spark.asInstanceOf[ClassicSession].experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
  }

  /** Column referencing the dataframe's output attribute at `idx` —
    * position-based disambiguation for join outputs where both sides carry
    * a column of the same name. */
  def columnAt(df: DataFrame, idx: Int): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(
      df.queryExecution.analyzed.output(idx))

  /** Build the as-of join dataframe. Key/ts columns are resolved by name on
    * each side; right-side attributes are re-aliased when ids collide with
    * the left (self-join on the same source). */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, joinType: String): DataFrame = {
    require(Seq("inner", "left").contains(joinType), s"unsupported: $joinType")
    require(keys.nonEmpty,
      "as-of needs at least one equi-key (a global un-keyed as-of would be " +
        "a single ordered merge — sort both sides and use the union-window " +
        "Joins.asOf instead)")
    val spark = left.sparkSession.asInstanceOf[ClassicSession]
    register(spark)
    val lplan = left.queryExecution.analyzed
    val rplan0 = right.queryExecution.analyzed
    val rplan =
      if (lplan.outputSet.intersect(rplan0.outputSet).isEmpty) rplan0
      else Project(rplan0.output.map(a => Alias(a, a.name)()), rplan0)

    // the session's own resolver, so name matching follows
    // spark.sql.caseSensitive exactly like every other column lookup
    val resolver = spark.sessionState.conf.resolver
    def attr(plan: LogicalPlan, name: String): Attribute = {
      val hits = plan.output.filter(a => resolver(a.name, name))
      require(hits.length <= 1,
        s"column $name is ambiguous under the session resolver: " +
          hits.map(_.name).mkString(", "))
      hits.headOption.getOrElse(
        throw new IllegalArgumentException(
          s"column $name not found in ${plan.output.map(_.name).mkString(", ")}"))
    }

    val node = AsOfJoinPlan(lplan, rplan,
      keys.map(attr(lplan, _)), keys.map(attr(rplan, _)),
      attr(lplan, leftTs), attr(rplan, rightTs),
      isLeftOuter = joinType == "left")
    Dataset.ofRows(spark, node)
  }
}

/** `SparkSessionExtensions` entry point (install with
  * `spark.sql.extensions=org.apache.spark.sql.graft.GraftExtensions`):
  * registers the as-of join planner strategy, the cosine-fusion optimizer
  * rule, and the `cosine_similarity` SQL function for every session of the
  * builder. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    AsOfJoinNative.inject(e)
    e.injectOptimizerRule(_ => CosineFusionRule)
    // the class doc promises the SQL function comes with the extension —
    // keep that true for builder-installed sessions, not only for callers
    // of CosineSimilarity.register
    e.injectFunction((
      org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_similarity"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[CosineSimilarity].getName, "cosine_similarity"),
      (exprs: Seq[Expression]) => {
        require(exprs.length == 2,
          s"cosine_similarity expects 2 arguments, got ${exprs.length}")
        CosineSimilarity(exprs.head, exprs(1))
      }))
  }
}
