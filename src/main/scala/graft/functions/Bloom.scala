/* Column bridge for Spark's internal Bloom-filter expressions.
 *
 * `bloom_filter_agg` / `might_contain` power Spark's own runtime-filter
 * join pruning (InjectRuntimeFilter) but are NOT registered in the public
 * FunctionRegistry, so `expr("bloom_filter_agg(...)")` fails to resolve.
 * The expressions themselves are public catalyst classes; this bridge
 * exposes them as Columns the same way DotProduct does — which keeps the
 * Bloom-prefiltered incremental dedup (Dedup.incrementalBloom) on Spark's
 * battle-tested BloomFilterImpl instead of a hand-rolled one.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils

object Bloom {

  /** `bloom_filter_agg(xxhash64-long, estimatedItems, numBits)` as an
    * aggregate Column returning the serialized filter (binary). */
  def agg(hashed: Column, estimatedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(hashed),
      Literal(estimatedItems), Literal(numBits)).toAggregateExpression())

  /** `might_contain(filter, xxhash64-long)` — false ⇒ definitely absent. */
  def mightContain(bloom: Column, hashed: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      ExpressionUtils.expression(bloom), ExpressionUtils.expression(hashed)))
}
