package graft.plans

import com.fasterxml.jackson.databind.JsonNode
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Vector-record metadata sanitize (reference
  * /root/reference/src/pinecone_utils.py:70-80): a JSON object becomes a
  * FLAT string map — nested objects/arrays are re-encoded as compact
  * JSON text (the reference double-encodes dicts the same way, which is
  * exactly how the schema document rides in metadata, §1.3), scalars
  * keep their literal token. Invalid/non-object input -> null map.
  *
  * Deviation noted: the reference keeps list[str] as a list value; our
  * map<string,string> store encodes it as the list's JSON text — same
  * information, one value type. */
case class SanitizeMetadata(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"sanitize_metadata expects string, got ${child.dataType.simpleString}")

  override def dataType: DataType =
    MapType(StringType, StringType, valueContainsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SanitizeMetadata.sanitize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.MapData m =
        graft.plans.SanitizeMetadata.sanitize($c);
      if (m == null) { ${ev.isNull} = true; } else { ${ev.value} = m; }
    """)

  override def prettyName: String = "sanitize_metadata"
  override protected def withNewChildInternal(newChild: Expression): SanitizeMetadata =
    copy(child = newChild)
}

object SanitizeMetadata {
  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  def sanitize(s: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val root: JsonNode =
      try mapper.readTree(s.toString)
      catch { case _: Exception => return null }
    if (root == null || !root.isObject) return null
    val keys = new scala.collection.mutable.ArrayBuffer[Any]
    val vals = new scala.collection.mutable.ArrayBuffer[Any]
    val it = root.fields()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      // scalars keep their literal text; containers re-encode compact
      val text =
        if (v.isTextual) v.asText()
        else if (v.isValueNode) v.asText() // numbers, booleans, null->""
        else mapper.writeValueAsString(v)
      keys += UTF8String.fromString(e.getKey)
      vals += UTF8String.fromString(text)
    }
    ArrayBasedMapData(keys.toArray, vals.toArray)
  }
}
