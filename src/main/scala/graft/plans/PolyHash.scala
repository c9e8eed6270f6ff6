package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen'd polynomial rolling hash: h = fold(chars)(h*31 + cp) mod
  * 1e9+7 over Unicode code points; empty string -> 0.
  *
  * Semantically identical to the HOF form
  * `aggregate(sequence(1,length(s)), 0, (acc,i) -> (acc*31 +
  * ascii(substr(s,i,1))) % 1e9+7)` and to the DuckDB oracle's
  * `list_reduce` equivalent — but it runs as a tight generated loop
  * instead of an interpreted per-character lambda chain, which is the
  * difference between O(n) native and O(n²)-ish boxed evaluation on long
  * documents. This is the engine's content-hash primitive (exact dedup,
  * shingle fingerprints, minhash, simhash).
  */
case class PolyHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"poly_hash expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.PolyHash.hash($c)")

  override def prettyName: String = "poly_hash"
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  final val P = 1000000007L

  /** Code-point iteration (not UTF-16 units) to match `ascii(substr(s,i,1))`
    * / DuckDB `ascii(s[i])` semantics beyond the BMP. */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      h = (h * 31 + cp) % P
      i += Character.charCount(cp)
    }
    h
  }
}
