package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift reconciliation for dynamic multi-table loops.
  *
  * The reference's catalog-driven pipelines (S13,
  * `build_etl_pipeline_python.py:23-30`) re-extract whole tables every run;
  * when a source schema wanders — a column added upstream, one dropped, one
  * retyped, or the vendor flips identifier casing — a rigid `select` fails
  * the load (or worse, binds positionally). `align` reconciles a drifted
  * frame to the target table's contract and reports exactly what drifted,
  * so the load survives benign drift and the report feeds the DQ log
  * (the same side-channel discipline as quality/Validate).
  *
  * Rules, per target column, source matched case-insensitively (the
  * analyzer's own resolution convention — see Catalog.tablesMatching):
  *  - same type  → kept (renamed to the target's casing)
  *  - other type → cast to the target type (`retyped`; cast failure follows
  *    the session's ANSI setting — a strict pipeline fails loudly, a
  *    permissive one gets nulls)
  *  - absent     → null-filled (`null_filled`)
  * Source columns with no target twin are dropped and reported.
  *
  * Pure projection — no shuffle; the report is built from the two schemas
  * alone (no data pass).
  */
object SchemaAlign {

  final case class Aligned(data: DataFrame, report: DataFrame)

  def align(df: DataFrame, target: StructType): Aligned = {
    def key(n: String) = n.toLowerCase(java.util.Locale.ROOT)
    val src = df.schema.fields.map(f => key(f.name) -> f).toMap
    require(src.size == df.schema.size,
      "source has columns identical up to case — alignment would be ambiguous")
    require(target.fields.map(f => key(f.name)).distinct.length == target.size,
      "target has columns identical up to case — two target fields would bind " +
        "the same source column and the output could not be resolved downstream")
    // one resolution pass decides BOTH the projection and its report row —
    // a second match over the same fields could silently drift from the
    // columns actually selected
    val resolved = target.fields.map { tf =>
      src.get(key(tf.name)) match {
        case Some(sf) if sf.dataType == tf.dataType =>
          (col(sf.name).as(tf.name),
            (tf.name, "kept", sf.dataType.simpleString, tf.dataType.simpleString))
        case Some(sf) =>
          (col(sf.name).cast(tf.dataType).as(tf.name),
            (tf.name, "retyped", sf.dataType.simpleString, tf.dataType.simpleString))
        case None =>
          (lit(null).cast(tf.dataType).as(tf.name),
            (tf.name, "null_filled", null: String, tf.dataType.simpleString))
      }
    }
    val targetKeys = target.fields.map(f => key(f.name)).toSet
    val rows = resolved.map(_._2).toSeq ++
      df.schema.fields.filterNot(f => targetKeys.contains(key(f.name)))
        .map(f => (f.name, "dropped", f.dataType.simpleString, null: String))
    val spark = df.sparkSession
    import spark.implicits._
    Aligned(df.select(resolved.map(_._1).toSeq: _*),
      rows.toDF("column", "status", "source_type", "target_type"))
  }
}
