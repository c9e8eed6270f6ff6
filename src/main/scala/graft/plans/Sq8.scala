package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType, LongType}

/** SQ8 scalar quantization (the FAISS `ScalarQuantizer` idea: one int8
  * code per dimension, ~4x smaller than float32) with a fixed
  * power-of-two scale so the math is bit-reproducible cross-engine:
  *
  *   code(x) = clamp(floor(x * 64.0) + 64, 0, 127)
  *
  * Multiplying a float by 64 is EXACT in double arithmetic and floor is
  * deterministic, so — unlike a min/max-trained affine scale, whose
  * reciprocal division and rounding mode are engine-specific — the same
  * codes fall out of Spark and the DuckDB oracle (the round-5
  * fixed-point lesson applied to vector codes). Codes land in [0,127]:
  * int8-representable, though stored as array<int> (Spark has no int8
  * array; at rest a parquet byte array would do).
  *
  * Reference semantics: `pinecone_utils.py:94-132` serves float cosine
  * top-k; SQ8 is the drop-in compressed variant of that contract
  * (pairs with [[CosineSimilarity]] as PQ pairs with ADC).
  */
case class Sq8Encode(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sq8_encode expects array<float>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val c = math.floor(x.getFloat(i).toDouble * 64.0).toInt + 64
      out(i) = if (c < 0) 0 else if (c > 127) 127 else c
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val c = ctx.freshName("c")
      s"""
        int $n = $a.numElements();
        int[] $out = new int[$n];
        for (int $i = 0; $i < $n; $i++) {
          int $c = (int) java.lang.Math.floor((double) $a.getFloat($i) * 64.0) + 64;
          $out[$i] = $c < 0 ? 0 : ($c > 127 ? 127 : $c);
        }
        ${ev.value} =
          org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """
    })

  override def prettyName: String = "sq8_encode"
  override protected def withNewChildInternal(newChild: Expression): Sq8Encode =
    copy(child = newChild)
}

/** Integer dot product of two code arrays (the SQ8 symmetric-distance
  * score): Σ aᵢ·bᵢ as a long — exact, order-free, hash-stable across
  * engines. NULL on length mismatch (malformed pair), mirroring
  * [[CosineSimilarity]]'s contract. */
case class CodesDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"codes_dot expects (array<int>, array<int>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) { s += x.getInt(i).toLong * y.getInt(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $s = 0L;
          for (int $i = 0; $i < $n; $i++) {
            $s += (long) $a.getInt($i) * (long) $b.getInt($i);
          }
          ${ev.value} = $s;
        }
      """
    })

  override def prettyName: String = "codes_dot"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodesDot =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity computed entirely from SQ8 codes, centered at
  * `center` (64 for [[Sq8Encode]]'s codes, which represent x ≈
  * (code−64)/64): dot and both squared norms are EXACT integer sums of
  * centered products, combined as dot / (√na·√nb) — sqrt is
  * IEEE-correctly-rounded on Spark and DuckDB (the round-6 z-score
  * lesson) and the operands are exact-integer-valued doubles, so the
  * result is bit-identical cross-engine. NULL on length mismatch or a
  * zero-norm side ([[CosineSimilarity]]'s contract).
  *
  * A RAW code dot would be wrong for ranking: Σ(qᵢ+64)(cᵢ+64) carries
  * +64·Σcᵢ per corpus vector — a brightness bias that swamps the
  * similarity ordering. Centering removes it. */
case class CodesCosine(left: Expression, right: Expression, center: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"codes_cosine expects (array<int>, array<int>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0L; var na = 0L; var nb = 0L
    var i = 0
    while (i < n) {
      val xi = (x.getInt(i) - center).toLong
      val yi = (y.getInt(i) - center).toLong
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    if (na == 0L || nb == 0L) null
    else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = $a.numElements();
        if ($n != $b.numElements()) {
          ${ev.isNull} = true;
        } else {
          long $dot = 0L; long $na = 0L; long $nb = 0L;
          for (int $i = 0; $i < $n; $i++) {
            long $xi = (long) ($a.getInt($i) - $center);
            long $yi = (long) ($b.getInt($i) - $center);
            $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
          }
          if ($na == 0L || $nb == 0L) {
            ${ev.isNull} = true;
          } else {
            ${ev.value} = (double) $dot /
              (java.lang.Math.sqrt((double) $na) * java.lang.Math.sqrt((double) $nb));
          }
        }
      """
    })

  override def prettyName: String = "codes_cosine"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CodesCosine =
    copy(left = newLeft, right = newRight)
}
