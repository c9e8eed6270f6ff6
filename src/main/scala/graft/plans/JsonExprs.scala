package graft.plans

import com.fasterxml.jackson.core.JsonFactory
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native JSON-repair expressions (SURVEY §2.7 E3/E4 hot path).
  *
  * The composable form — regexp_extract_all + try_parse_json inside
  * array HOF lambdas — is correct but interpreted, and Catalyst's
  * projection collapse re-evaluates the candidate array for every
  * reference (valid/maxLen/filter), costing ~0.6 ms/row. These
  * expressions do one pass per row in native code with strict Jackson
  * validation (same verdicts as DuckDB's json_valid on this surface:
  * no single quotes, no unquoted names, no leading zeros, full-input
  * consumption). */
object JsonSupport {
  private val fence = java.util.regex.Pattern.compile("```(?:json)?")
  private val mapper = new ObjectMapper()
  private val factory = new JsonFactory(mapper)

  /** Streaming validity: drain the token stream without materializing a
    * JsonNode tree (readTree allocated one tree per candidate — the
    * round-1 json_repair hot spot). Same parser, same strictness
    * verdicts; full-input consumption still enforced. */
  def isValidJson(s: String): Boolean =
    try {
      val p = factory.createParser(s)
      try {
        if (p.nextToken() == null) false // empty input is not valid JSON
        else {
          p.skipChildren() // no-op on scalars; drains objects/arrays
          p.nextToken() == null
        }
      } finally p.close()
    } catch { case _: Exception => false }

  def isValid(s: UTF8String): Boolean = isValidJson(s.toString)

  /** Fence-strip, scan leftmost-shortest `{...}` candidates (the
    * non-overlapping matches of `\{[\s\S]*?\}`), return the largest that
    * parses — first-wins on length ties, mirroring the reference's
    * stable largest-first sort (src/utils.py:180-198). */
  def largestCandidate(s: UTF8String): UTF8String = {
    val str = fence.matcher(s.toString).replaceAll("")
    var best: String = null
    var i = 0
    while (i < str.length) {
      val open = str.indexOf('{', i)
      if (open < 0) i = str.length
      else {
        val close = str.indexOf('}', open + 1)
        if (close < 0) i = str.length
        else {
          val cand = str.substring(open, close + 1)
          if ((best == null || cand.length > best.length) && isValidJson(cand))
            best = cand
          i = close + 1
        }
      }
    }
    if (best == null) null else UTF8String.fromString(best)
  }
}

/** extract_json (E3) as a single native expression. */
case class LargestValidJsonCandidate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    JsonSupport.largestCandidate(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.unsafe.types.UTF8String r =
        graft.plans.JsonSupport.largestCandidate($c);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = r; }
    """)

  override def prettyName: String = "largest_valid_json_candidate"
  override protected def withNewChildInternal(newChild: Expression): LargestValidJsonCandidate =
    copy(child = newChild)
}

/** Strict JSON validity (full-input parse) as a native predicate. */
case class IsValidJson(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any =
    JsonSupport.isValid(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.JsonSupport.isValid($c)")

  override def prettyName: String = "is_valid_json"
  override protected def withNewChildInternal(newChild: Expression): IsValidJson =
    copy(child = newChild)
}
