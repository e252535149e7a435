package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks (SURVEY §2.11 V2/V3) — the engine's port
  * of the reference's pytest column contracts
  * (`scripts/Python_ETL/product/test_product_pipeline.py:19-45`) and Great
  * Expectations suites (`GreatExpectations/dimproducts_suite.json`,
  * `adv_suite.json`: row-count equality, max/mean-between, `mostly` null
  * tolerance, value-set membership).
  *
  * Every expectation compiles to aggregate expressions evaluated in ONE
  * `agg(...)` pass — a single scan regardless of how many checks run, which
  * is the property that matters when the table is 100 TB. The gate
  * ([[validate]]) raises on failure like the GE checkpoint notebook
  * (`Great Expectations Data Quality Tests.ipynb` cell 33).
  */
object Expectations {

  sealed trait Expectation { def describe: String }
  final case class RowCountEquals(n: Long) extends Expectation {
    val describe = s"row_count == $n"
  }
  final case class RowCountBetween(lo: Long, hi: Long) extends Expectation {
    val describe = s"row_count in [$lo,$hi]"
  }
  /** `mostly` = minimum tolerated non-null fraction (GE semantics). */
  final case class NotNull(column: String, mostly: Double = 1.0) extends Expectation {
    val describe = s"$column not null (mostly=$mostly)"
  }
  final case class Unique(column: String) extends Expectation {
    val describe = s"$column unique"
  }
  final case class ValuesIn(column: String, allowed: Seq[String]) extends Expectation {
    val describe = s"$column ⊆ ${allowed.mkString("{", ",", "}")}"
  }
  final case class MinBetween(column: String, lo: Double, hi: Double) extends Expectation {
    val describe = s"min($column) in [$lo,$hi]"
  }
  final case class MaxBetween(column: String, lo: Double, hi: Double) extends Expectation {
    val describe = s"max($column) in [$lo,$hi]"
  }
  final case class MeanBetween(column: String, lo: Double, hi: Double) extends Expectation {
    val describe = s"mean($column) in [$lo,$hi]"
  }
  final case class ColumnExists(column: String) extends Expectation {
    val describe = s"column $column exists"
  }

  final case class Result(expectation: String, passed: Boolean, observed: String)

  final class ValidationException(val failures: Seq[Result])
    extends RuntimeException(
      s"${failures.size} expectation(s) failed: ${failures.map(_.expectation).mkString("; ")}")

  /** Evaluate all expectations in one aggregation pass over `df`. Checks on
    * missing columns fail without poisoning the shared scan. */
  def run(df: DataFrame, expectations: Seq[Expectation]): Seq[Result] = {
    val schemaCols = df.columns.toSet
    val indexed = expectations.zipWithIndex

    val aggChecks = indexed.filter { case (e, _) =>
      !e.isInstanceOf[ColumnExists] && columnOf(e).forall(schemaCols.contains)
    }
    val aggCols: Seq[Column] = count(lit(1)).as("__n") +: aggChecks.flatMap {
      case (e, i) => aggExprs(e, i)
    }
    val row = df.agg(aggCols.head, aggCols.tail: _*).head()
    val n = row.getAs[Long]("__n")
    val aggIdx = aggChecks.map(_._2).toSet

    indexed.map {
      case (c @ ColumnExists(col), _) =>
        Result(c.describe, schemaCols.contains(col), s"columns=${df.columns.length}")
      case (e, i) if aggIdx.contains(i) => evaluate(e, i, row, n)
      case (e, _) => Result(e.describe, passed = false, "column missing")
    }
  }

  /** Gate: raise on any failure (GE checkpoint behavior). */
  def validate(df: DataFrame, expectations: Seq[Expectation]): Seq[Result] = {
    val results = run(df, expectations)
    val failures = results.filterNot(_.passed)
    if (failures.nonEmpty) throw new ValidationException(failures)
    results
  }

  private def columnOf(e: Expectation): Option[String] = e match {
    case NotNull(c, _) => Some(c)
    case Unique(c) => Some(c)
    case ValuesIn(c, _) => Some(c)
    case MinBetween(c, _, _) => Some(c)
    case MaxBetween(c, _, _) => Some(c)
    case MeanBetween(c, _, _) => Some(c)
    case ColumnExists(c) => Some(c)
    case _ => None
  }

  private def aggExprs(e: Expectation, i: Int): Seq[Column] = e match {
    case RowCountEquals(_) | RowCountBetween(_, _) => Seq.empty
    case NotNull(c, _) => Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__e$i"))
    case Unique(c) => Seq(countDistinct(col(c)).as(s"__e$i"),
      sum(when(col(c).isNotNull, 1L).otherwise(0L)).as(s"__e${i}b"))
    case ValuesIn(c, allowed) =>
      Seq(sum(when(!col(c).isin(allowed: _*), 1L).otherwise(0L)).as(s"__e$i"))
    case MinBetween(c, _, _) => Seq(min(col(c)).cast("double").as(s"__e$i"))
    case MaxBetween(c, _, _) => Seq(max(col(c)).cast("double").as(s"__e$i"))
    case MeanBetween(c, _, _) => Seq(avg(col(c)).cast("double").as(s"__e$i"))
    case ColumnExists(_) => Seq.empty
  }

  /** Aggregates over zero rows (or all-null columns) come back null; unboxing
    * through getAs[Long] would NPE — exactly on the empty/all-null tables a
    * DQ gate exists to catch. */
  private def optLong(row: org.apache.spark.sql.Row, name: String): Option[Long] =
    if (row.isNullAt(row.fieldIndex(name))) None else Some(row.getAs[Long](name))
  private def optDouble(row: org.apache.spark.sql.Row, name: String): Option[Double] =
    if (row.isNullAt(row.fieldIndex(name))) None else Some(row.getAs[Double](name))

  private def evaluate(e: Expectation, i: Int,
                       row: org.apache.spark.sql.Row, n: Long): Result = e match {
    case x @ RowCountEquals(m) => Result(x.describe, n == m, s"row_count=$n")
    case x @ RowCountBetween(lo, hi) => Result(x.describe, n >= lo && n <= hi, s"row_count=$n")
    case x @ NotNull(_, mostly) =>
      val nulls = optLong(row, s"__e$i").getOrElse(0L)
      val frac = if (n == 0) 1.0 else (n - nulls).toDouble / n
      Result(x.describe, frac >= mostly, f"non_null_fraction=$frac%.4f")
    case x @ Unique(_) =>
      val distinct = optLong(row, s"__e$i").getOrElse(0L)
      val nonNull = optLong(row, s"__e${i}b").getOrElse(0L)
      Result(x.describe, distinct == nonNull, s"distinct=$distinct non_null=$nonNull")
    case x @ ValuesIn(_, _) =>
      val bad = optLong(row, s"__e$i").getOrElse(0L)
      Result(x.describe, bad == 0, s"out_of_set=$bad")
    case x @ MinBetween(_, lo, hi) =>
      val v = optDouble(row, s"__e$i")
      Result(x.describe, v.exists(d => d >= lo && d <= hi), s"min=${v.orNull}")
    case x @ MaxBetween(_, lo, hi) =>
      val v = optDouble(row, s"__e$i")
      Result(x.describe, v.exists(d => d >= lo && d <= hi), s"max=${v.orNull}")
    case x @ MeanBetween(_, lo, hi) =>
      val v = optDouble(row, s"__e$i")
      Result(x.describe, v.exists(d => d >= lo && d <= hi), s"mean=${v.orNull}")
    case x @ ColumnExists(_) => Result(x.describe, passed = true, "")
  }
}
