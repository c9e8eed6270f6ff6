package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-bigram shingles as one native pass.
  *
  * Semantics identical to the composable form
  * `array_distinct(transform(sequence(1, size(toks)-1), i =>
  * concat(element_at(toks,i), ' ', element_at(toks,i+1))))` with
  * `toks = split(trim(text), "\\s+")` — but that form is pathological
  * after Catalyst's projection collapse: the `split` lands INSIDE the
  * lambda, so every `element_at` re-splits the whole document
  * (~2·tokens full regex splits per doc, interpreted). Profiled at
  * ~300 ms/doc on the fixture corpus vs ~10 µs here.
  *
  * Trim/split edge semantics match Spark's `trim` (strips 0x20 only)
  * and Java-regex `\s+` split with limit -1 (leading empty token kept
  * when the trimmed text starts with non-space whitespace) — the same
  * results as the DuckDB oracle's trim + regexp_split_to_array.
  */
case class WordBigrams(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_bigrams expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordBigrams.bigrams(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WordBigrams.bigrams($c)")

  override def prettyName: String = "word_bigrams"
  override protected def withNewChildInternal(newChild: Expression): WordBigrams =
    copy(child = newChild)
}

object WordBigrams {
  private val ws = java.util.regex.Pattern.compile("\\s+")

  def bigrams(s: UTF8String): ArrayData = {
    var str = s.toString
    // Spark `trim` semantics: strip 0x20 only (NOT Java String.trim,
    // which also strips control chars)
    var from = 0
    var to = str.length
    while (from < to && str.charAt(from) == ' ') from += 1
    while (to > from && str.charAt(to - 1) == ' ') to -= 1
    str = str.substring(from, to)
    val toks = ws.split(str, -1)
    if (toks.length < 2) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length - 1) {
      seen.add(toks(i) + " " + toks(i + 1))
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { out(j) = UTF8String.fromString(it.next()); j += 1 }
    new GenericArrayData(out)
  }
}
