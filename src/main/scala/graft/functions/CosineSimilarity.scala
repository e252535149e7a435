/** Native Catalyst expression for the ANN hot path. Lives under
  * `org.apache.spark.sql` because `AbstractDataType` / `ExpressionUtils`
  * are `private[sql]` — the standard placement for third-party native
  * expressions (the alternative, a Scala UDF, would serialize per row and
  * fall out of codegen). Public API: `graft.operators.Similarity.cosine`.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Cosine similarity of two `array<float>` / `array<double>` columns, fused
  * into one loop with real `doGenCode` — no intermediate zipped array, no
  * per-element lambda call. Runs |queries| × |corpus| times per search,
  * which is why it is a native expression rather than the composed
  * `zip_with`+`aggregate` form.
  *
  * Semantics match the composed form exactly (sequential double
  * accumulation, `sqrt(na)*sqrt(nb)` denominator, null on zero norm), so
  * the DuckDB oracle for q31/q44 is unaffected. Array elements must be
  * non-null (embedding vectors). Each side may independently be float or
  * double typed; floats widen per element, which is exact.
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_similarity"

  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    // null on length mismatch — same as the composed zip_with form, where
    // the null-padded products null the whole aggregate
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val xd = isDouble(left); val yd = isDouble(right)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xe = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val ye = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xe * ye; na += xe * xe; nb += ye * ye
      i += 1
    }
    val denom = math.sqrt(na) * math.sqrt(nb)
    if (denom > 0.0) java.lang.Double.valueOf(dot / denom) else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xe = ctx.freshName("xe")
      val ye = ctx.freshName("ye")
      val denom = ctx.freshName("denom")
      // element accessor is chosen at codegen time from the static type
      val getX = if (isDouble(left)) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getY = if (isDouble(right)) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $xe = $getX;
         |    double $ye = $getY;
         |    $dot += $xe * $ye; $na += $xe * $xe; $nb += $ye * $ye;
         |  }
         |  double $denom = java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb);
         |  if ($denom > 0.0) { ${ev.value} = $dot / $denom; }
         |  else { ${ev.isNull} = true; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(CosineSimilarity(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cosine_similarity", { exprs =>
        if (exprs.length != 2)
          throw new org.apache.spark.sql.AnalysisException(
            errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
            messageParameters = Map("functionName" -> "cosine_similarity",
              "expectedNum" -> "2", "actualNum" -> exprs.length.toString,
              "docroot" -> "https://spark.apache.org/docs/latest"))
        CosineSimilarity(exprs.head, exprs(1))
      }, "scala_udf")
}
