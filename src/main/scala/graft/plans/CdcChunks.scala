package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking: split a string where a w=8 rolling hash of
  * the trailing code points hits `H % 64 == 0` (Rabin/FastCDC-style
  * boundaries, deterministic, no parameters to tune per corpus).
  *
  * Why content-defined: fixed-offset chunking (RAG docChunks) shifts
  * every boundary after an insertion, so two near-identical documents
  * share almost no chunks; CDC boundaries depend only on LOCAL content,
  * so chunks re-align right after any edit — the storage-dedup trick
  * (LBFS, Muthitacharoen 2001) applied to corpus near-dedup. Expected
  * chunk length is the mask size (64 code points).
  *
  * Hash: H(i) = Σ cp(i−7..i)·31^(7−k) mod 1e9+7 — the same polynomial
  * family as PolyHash, windowed; maintained incrementally here (one
  * multiply/subtract per code point), reproduced by the oracle as the
  * direct 8-term sum (identical integer arithmetic, BIGINT-safe).
  * A boundary cuts AFTER position i; the remainder is the final chunk.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cdc_chunks expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any =
    CdcChunks.chunks(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.CdcChunks.chunks($c)")

  override def prettyName: String = "cdc_chunks"
  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {
  final val W = 8
  final val B = 31L
  final val P = 1000000007L
  final val Mask = 64L
  /** B^W mod P — the retire coefficient of the incremental update. */
  final val Bw: Long = {
    var x = 1L
    var i = 0
    while (i < W) { x = x * B % P; i += 1 }
    x
  }

  def chunks(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.isEmpty) return new GenericArrayData(Array.empty[Any])
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    val window = new Array[Int](W)
    var h = 0L
    var chunkStart = 0 // char offset
    var charIdx = 0
    var k = 0 // code-point index
    while (charIdx < str.length) {
      val cp = str.codePointAt(charIdx)
      val next = charIdx + Character.charCount(cp)
      h = (h * B + cp) % P
      if (k >= W) h = (h - window(k % W) * Bw % P + P) % P
      window(k % W) = cp
      if (k >= W - 1 && h % Mask == 0L) {
        out += UTF8String.fromString(str.substring(chunkStart, next))
        chunkStart = next
      }
      charIdx = next
      k += 1
    }
    if (chunkStart < str.length)
      out += UTF8String.fromString(str.substring(chunkStart))
    new GenericArrayData(out.toArray)
  }
}
