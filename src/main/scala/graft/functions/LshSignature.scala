/** Native all-bands LSH signature — the fix for the q32/q45 hot-path
  * codegen blowup: composing bands × bitsPerBand separate [[DotProduct]]s
  * against literal hyperplanes emits one unrolled loop PER PLANE (48 for
  * the default 16×3 index) into a single projection, pushing the generated
  * method past JIT-friendly sizes. This expression computes every band's
  * bucket in one nested loop over a plane matrix held in the references
  * array — the generated code size is constant in bands × bits × dim.
  */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, IntegerType}

/** For each band b, packs the signs of `bitsPerBand` hyperplane dot
  * products into an int bucket key: bit i of band b is set iff
  * `dot(vec, planes(b*bitsPerBand + i)) > 0`. Returns
  * `array<int>` of length `planes.length / bitsPerBand`.
  *
  * Arithmetic is bit-identical to the composed
  * `when(dot_product(vec, plane) > 0, 1 << i)` form it replaces: double
  * accumulation in ascending element order, strict `> 0` sign test. A
  * plane whose length differs from the vector's contributes a 0 bit —
  * the same observable the composed form's null-propagating `when` gave. */
case class SignBandSignature(child: Expression, planes: Array[Array[Double]],
                             bitsPerBand: Int)
  extends UnaryExpression with ExpectsInputTypes {

  require(bitsPerBand >= 1 && bitsPerBand <= 30, s"bitsPerBand out of range: $bitsPerBand")
  require(planes.nonEmpty && planes.length % bitsPerBand == 0,
    s"planes (${planes.length}) must be a positive multiple of bitsPerBand ($bitsPerBand)")

  private def bands: Int = planes.length / bitsPerBand

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "sign_band_signature"

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0
      var i = 0
      while (i < bitsPerBand) {
        val p = planes(b * bitsPerBand + i)
        if (p.length == n) {
          var dot = 0.0
          var j = 0
          while (j < n) { dot += v.getDouble(j) * p(j); j += 1 }
          if (dot > 0) bucket |= 1 << i
        }
        i += 1
      }
      out(b) = bucket
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val b = ctx.freshName("b")
      val bucket = ctx.freshName("bucket")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val dot = ctx.freshName("dot")
      val j = ctx.freshName("j")
      s"""
         |int $n = $v.numElements();
         |int[] $out = new int[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  int $bucket = 0;
         |  for (int $i = 0; $i < $bitsPerBand; $i++) {
         |    double[] $p = $planesRef[$b * $bitsPerBand + $i];
         |    if ($p.length == $n) {
         |      double $dot = 0.0;
         |      for (int $j = 0; $j < $n; $j++) {
         |        $dot += $v.getDouble($j) * $p[$j];
         |      }
         |      if ($dot > 0) $bucket |= 1 << $i;
         |    }
         |  }
         |  $out[$b] = $bucket;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SignBandSignature {
  def column(vec: Column, planes: Seq[Seq[Double]], bitsPerBand: Int): Column =
    ExpressionUtils.column(SignBandSignature(
      ExpressionUtils.expression(vec), planes.map(_.toArray).toArray, bitsPerBand))
}
