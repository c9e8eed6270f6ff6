package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Deterministic pseudo-embedding (V1 embed_text stand-in,
  * /root/reference/src/pinecone_utils.py:46-53) as ONE native expression.
  *
  * The composed form — `array((0 until dim).map(i => f(polyHash(c), i)))`
  * — gets the shared `polyHash(c)` re-inlined into every array element by
  * Catalyst's projection collapse: dim full passes over the document text
  * per row (round-1 schema_cascade hot spot). Here the hash is computed
  * once and the dim arithmetic derivations are a trivial loop.
  *
  * Values are integers/1024 — exactly representable in float32 so Spark
  * float cosine and DuckDB double cosine agree bit-for-bit.
  */
case class PseudoEmbed(child: Expression, dim: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"pseudo_embed expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    PseudoEmbed.embed(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.PseudoEmbed.embed($c, $dim);
    """)

  override def prettyName: String = "pseudo_embed"
  override protected def withNewChildInternal(newChild: Expression): PseudoEmbed =
    copy(child = newChild)
}

object PseudoEmbed {
  /** Same arithmetic as SchemaRetrieval.pseudoEmbedLocal / the DuckDB
    * oracle twin: dim derivations of one polynomial content hash. */
  def embed(s: UTF8String, dim: Int): ArrayData = {
    val ph = PolyHash.hash(s)
    val out = new Array[Any](dim)
    var i = 0
    while (i < dim) {
      out(i) = (((ph * (2L * i + 3) + i) % 1021L).toDouble / 1024.0).toFloat
      i += 1
    }
    new GenericArrayData(out)
  }
}
