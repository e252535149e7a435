/** Native Unicode normalization — corpus text arrives in mixed composed /
  * decomposed forms (the same visible string as different codepoint
  * sequences), which silently breaks exact dedup, token equality, and
  * fingerprinting. Spark ships no normalizer function; a Scala UDF would
  * fall out of codegen on the hottest path in a text pipeline (every
  * document, every run). This is a unary expression over the JDK's
  * `java.text.Normalizer` — available on every executor, zero
  * dependencies — with codegen that emits the static call directly.
  */
package org.apache.spark.sql.graft

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Normalize a string column to `form` (NFC/NFD/NFKC/NFKD). Null in, null
  * out; the form is validated at construction, not per row. */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression with ExpectsInputTypes {

  // fail at plan time on a bad form name, never inside a task
  private val normForm: Normalizer.Form = Normalizer.Form.valueOf(form)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "unicode_normalize"

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      Normalizer.normalize(input.asInstanceOf[UTF8String].toString, normForm))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.${normForm.name()}));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  def column(c: Column, form: String = "NFC"): Column =
    ExpressionUtils.column(UnicodeNormalize(ExpressionUtils.expression(c), form))
}
