package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** |A ∩ B| for two SORTED string arrays — a two-pointer merge count.
  *
  * Spark's ArrayIntersect builds an open hash set and materializes the
  * intersection array per row, interpreted (no codegen for the set ops);
  * on a candidate-verification hot path (millions of pairs × hundreds of
  * shingles) that was measured ~10x the cost of the whole join. This
  * expression returns just the count, O(|A|+|B|), no allocation, inside
  * whole-stage codegen. Inputs MUST be sorted ascending (array_sort at
  * the document level — once per doc, not per pair). */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expects (array<string>, array<string>), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.SortedIntersectCount.count($a, $b)")

  override def prettyName: String = "sorted_intersect_count"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Two-pointer distinct-intersection count over sorted UTF8 arrays.
    * Inputs are distinct (WordBigrams emits distinct shingles), so no
    * duplicate handling is needed. */
  def count(a: ArrayData, b: ArrayData): Int = {
    var i = 0
    var j = 0
    var n = 0
    val la = a.numElements()
    val lb = b.numElements()
    while (i < la && j < lb) {
      val x = a.getUTF8String(i)
      val y = b.getUTF8String(j)
      val c = x.compareTo(y)
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  /** The long-fingerprint twin (audio landmark sets — see
    * graft.operators.Multimodal.audioNearDupPairs). */
  def countLong(a: ArrayData, b: ArrayData): Int = {
    var i = 0
    var j = 0
    var n = 0
    val la = a.numElements()
    val lb = b.numElements()
    while (i < la && j < lb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { n += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    n
  }
}

/** [[SortedIntersectCount]] over sorted distinct `array<bigint>` —
  * same two-pointer merge, long comparisons instead of UTF8. */
case class SortedIntersectCountLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.LongType, _),
            ArrayType(org.apache.spark.sql.types.LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"expects (array<bigint>, array<bigint>), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.countLong(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.plans.SortedIntersectCount.countLong($a, $b)")

  override def prettyName: String = "sorted_intersect_count_long"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountLong =
    copy(left = newLeft, right = newRight)
}
