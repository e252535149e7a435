package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequency sketches for corpus statistics: exact heavy hitters (the
  * two-shuffle verifier) and a Misra-Gries summary (the one-pass bounded-
  * memory scale path — think hot-token detection over 100 TB of text
  * without materializing the full vocabulary histogram).
  */
object Sketches {

  /** Exact heavy hitters: tokens appearing in more than `support` fraction
    * of all token occurrences. ONE corpus scan: the scalar total sums the
    * vocabulary-sized counts table (identical value) instead of
    * re-exploding the corpus a second time. */
  def heavyHitters(df: DataFrame, tokensCol: String,
                   support: Double): DataFrame = {
    val tokens = df.select(explode(col(tokensCol)).as("token"))
    val counts = tokens.groupBy("token").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("__total"))
    counts.crossJoin(broadcast(total))
      .filter(col("n") > col("__total") * support)
      .drop("__total")
  }

  /** Misra-Gries summary with `k` counters. GUARANTEE: every element whose
    * true frequency exceeds N/(k+1) is present in the summary (counts are
    * underestimates by at most N/(k+1)). The buffer never exceeds k entries
    * on any executor, and `merge` is the standard counter-sum + subtract-
    * (k+1)-th-largest trim, so partial aggregation keeps the shuffle at k
    * entries per mapper — one pass, bounded memory, any data size. */
  final class MisraGries(k: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    require(k > 0)
    override def zero: Map[String, Long] = Map.empty

    override def reduce(buf: Map[String, Long], x: String): Map[String, Long] =
      buf.get(x) match {
        case Some(c) => buf.updated(x, c + 1)
        case None if buf.size < k => buf.updated(x, 1L)
        case None => // decrement all, drop zeros (the MG eviction step)
          buf.flatMap { case (t, c) => if (c > 1) Some(t -> (c - 1)) else None }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val summed = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (summed.size <= k) summed
      else {
        // subtract the (k+1)-th largest count from everything; ≤0 drops out
        val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
        summed.flatMap { case (t, c) =>
          if (c - cut > 0) Some(t -> (c - cut)) else None
        }
      }
    }

    override def finish(r: Map[String, Long]): Map[String, Long] = r
    override def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  def misraGries(k: Int): MisraGries = new MisraGries(k)
}
