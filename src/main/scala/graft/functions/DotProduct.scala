/** Native fused dot product — companion to [[CosineSimilarity]] for the LSH
  * hot path, where every row evaluates `bands × bitsPerBand` hyperplane
  * projections: the composed `aggregate(zip_with(...))` form interprets two
  * lambdas per element and, with 64-element literal hyperplanes, inflates
  * generated code past JIT-friendly sizes. This expression is one tight
  * loop; literals live in the references array, not the generated source.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, TypeCollection}

/** Dot product of two `array<float>` / `array<double>` columns in double
  * accumulation. Same null semantics as the composed
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form: null on null input or
  * length mismatch, 0.0 on empty arrays. Elements must be non-null. */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)),
    TypeCollection(ArrayType(FloatType), ArrayType(DoubleType)))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "dot_product"

  private def isDouble(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    val xd = isDouble(left); val yd = isDouble(right)
    var dot = 0.0
    var i = 0
    while (i < n) {
      val xe = if (xd) x.getDouble(i) else x.getFloat(i).toDouble
      val ye = if (yd) y.getDouble(i) else y.getFloat(i).toDouble
      dot += xe * ye
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val getX = if (isDouble(left)) s"$a.getDouble($i)" else s"(double) $a.getFloat($i)"
      val getY = if (isDouble(right)) s"$b.getDouble($i)" else s"(double) $b.getFloat($i)"
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += $getX * $getY;
         |  }
         |  ${ev.value} = $dot;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def column(a: Column, b: Column): Column =
    ExpressionUtils.column(DotProduct(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
