package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All character trigram slots of a string (NON-distinct, in order) as
  * one native pass — the feature extractor for n-gram language
  * identification (Cavnar-Trenkle-style profiles).
  *
  * Equivalent composable form `transform(sequence(1, length(s)-2),
  * i -> substr(s, i, 3))` is interpreted per element (higher-order
  * lambdas never codegen) and re-evaluates `substr` through the UTF-8
  * prefix each call — quadratic per document. This walks code points
  * once. Code-point semantics match `substr` on both engines (a CJK
  * char is one position). */
case class CharTrigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_trigrams expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    CharTrigrams.trigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CharTrigrams.trigrams($c)")

  override def prettyName: String = "char_trigrams"
  override protected def withNewChildInternal(newChild: Expression): CharTrigrams =
    copy(child = newChild)
}

object CharTrigrams {
  def trigrams(s: UTF8String): ArrayData = {
    val str = s.toString
    val n = str.codePointCount(0, str.length)
    if (n < 3) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 2)
    // sliding window over char offsets of 4 consecutive code points
    var i0 = 0
    var i1 = str.offsetByCodePoints(i0, 1)
    var i2 = str.offsetByCodePoints(i1, 1)
    var k = 0
    while (k < n - 2) {
      val i3 = str.offsetByCodePoints(i2, 1)
      out(k) = UTF8String.fromString(str.substring(i0, i3))
      i0 = i1; i1 = i2; i2 = i3
      k += 1
    }
    new GenericArrayData(out)
  }
}
