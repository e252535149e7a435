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

  /** Count-min sketch rows use these polynomial bases — the same four the
    * 60-bit token hash packs, and the DuckDB oracle rebuilds the identical
    * sketch from them (hashing is [[graft.functions.PortableHash.poly]], so
    * bucket assignment is engine-portable, bit for bit). */
  val CmsBases: Seq[Long] = Seq(31L, 131L, 137L, 139L)

  /** Count-min sketch over weighted keys: a `d` (= CmsBases.take(d)) by `w`
    * counter grid; each (key, n) adds n to one bucket per row, an estimate
    * reads the MINIMUM of a key's d cells — never an underestimate, over by
    * at most the colliding mass in its emptiest row.
    *
    * The aggregator is LINEAR (merge = elementwise sum), so partial
    * aggregation ships one d×w array per mapper regardless of key
    * cardinality — the bounded-memory frequency path when even the distinct
    * key set is too big to shuffle (CDN logs, token streams). Feed it the
    * pre-aggregated (key, count) table when one exists; feeding raw
    * occurrences with n=1 builds the identical sketch.
    */
  final class CountMin(d: Int, w: Int)
    extends Aggregator[(String, Long), Array[Long], Array[Long]] {
    require(d >= 1 && d <= CmsBases.length, s"d must be in [1, ${CmsBases.length}]")
    require(w >= 1)
    override def zero: Array[Long] = Array.ofDim[Long](d * w)

    override def reduce(buf: Array[Long], x: (String, Long)): Array[Long] = {
      var r = 0
      while (r < d) {
        val b = (graft.functions.PortableHash.poly(x._1, CmsBases(r)) % w).toInt
        buf(r * w + b) += x._2
        r += 1
      }
      buf
    }

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }

    override def finish(r: Array[Long]): Array[Long] = r
    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
    override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  }

  def countMin(d: Int, w: Int): CountMin = new CountMin(d, w)

  /** Count-min estimates for every key of `keyed` (columns: key string `k`,
    * weight `n`): builds the sketch with [[CountMin]] (one array per mapper
    * into a single-row reduce), broadcasts that one row back, and reads each
    * key's d cells lazily in-plan — `element_at` at `r*w + poly_r(k) % w + 1`
    * with the shared [[graft.functions.PortableHash.polySql]] bucket
    * expression. No driver collect; the probe side stays distributed.
    * Emits (k, n, cms_est). */
  def countMinEstimates(keyed: DataFrame, d: Int, w: Int): DataFrame = {
    val spark = keyed.sparkSession
    import spark.implicits._
    // `keyed` feeds BOTH the sketch aggregate and the probe side, and the
    // typed-Aggregator subplan does not canonicalize equal to the probe
    // subplan (no ReusedExchange) — the input's lineage therefore runs
    // TWICE. When that lineage is expensive (the corpus-sized stream a
    // sketch exists for), the CALLER persists `keyed` and unpersists after
    // consuming the result; persisting here would register a CacheManager
    // entry nobody can release (cached plans are strong references — LRU
    // only demotes the memory tier, disk blocks survive to app exit).
    val sketch = keyed.select(col("k"), col("n").cast("long"))
      .as[(String, Long)]
      .select(countMin(d, w).toColumn.name("sketch"))
      .toDF("sketch")
    val cells = (0 until d).map { r =>
      val bucket = (expr(graft.functions.PortableHash.polySql("k", CmsBases(r)))
        % w).cast("int")
      element_at(col("sketch"), bucket + lit(r * w + 1))
    }
    keyed.crossJoin(broadcast(sketch))
      .withColumn("cms_est", if (cells.length == 1) cells.head else least(cells: _*))
      .drop("sketch")
  }
}
