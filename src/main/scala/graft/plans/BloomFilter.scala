package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType}

/** Shared Bloom hashing: k probe positions for a 64-bit key via
  * Kirsch-Mitzenmacher double hashing (g_i = h1 + i·h2; "Less Hashing,
  * Same Performance", ESA 2006) — two derived hashes give the full
  * family's false-positive bound. h2 is forced odd so successive probes
  * never collapse onto one stride cycle. */
object BloomHash {
  @inline private def mix(v: Long): Long = {
    // splitmix64 finalizer: decorrelates h1/h2 from the raw key
    var z = v + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  def set(bits: Array[Long], v: Long, k: Int): Unit = {
    val m = bits.length.toLong * 64L
    val h1 = mix(v)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      bits((idx >>> 6).toInt) |= (1L << (idx & 63L))
      i += 1
    }
  }
  def contains(bytes: Array[Byte], v: Long, k: Int): Boolean = {
    val m = bytes.length.toLong * 8L
    val h1 = mix(v)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((bytes((idx >>> 3).toInt) & (1 << (idx & 7L).toInt)) == 0) return false
      i += 1
    }
    true
  }
  def toBytes(bits: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(bits.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(bits)
    bb.array()
  }
  def fromBytes(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .asLongBuffer().get(out)
    out
  }
}

/** Bloom-filter aggregate over a LongType key column: an m-bit set
  * membership sketch returned as binary.
  *
  * The 100 TB role: a SMALL side too large to broadcast as an exact set
  * (hundreds of millions of keys) still fits as a few hundred MB of
  * Bloom bits — the probe side then filters DURING ITS SCAN with zero
  * shuffle, and only candidate hits (true matches + the fp-rate's false
  * positives) continue to an exact verify join. This is the engine's
  * explicit form of the runtime bloom-filter join pruning Spark applies
  * under AQE, available as a first-class operator so a pipeline can
  * build the filter ONCE and reuse it across queries/batches.
  *
  * Merge is bitwise OR — associative/commutative, so the aggregate
  * partial-aggregates map-side like every sketch in this engine. No
  * false negatives by construction; fp rate ≈ (1 − e^{−kn/m})^k. */
case class BloomAgg(
    child: Expression,
    mBits: Int,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(mBits >= 64 && mBits % 64 == 0, "mBits must be a positive multiple of 64")
  require(k >= 1 && k <= 16, "k hash functions must be in [1, 16]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"bloom_agg expects a BIGINT key (hash the value first), got ${other.simpleString(10)}")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](mBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomHash.set(buf, v.asInstanceOf[Long], k)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = BloomHash.toBytes(buf)
  override def serialize(buf: Array[Long]): Array[Byte] = BloomHash.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Array[Long] = BloomHash.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "bloom_agg"
}

/** Membership probe against [[BloomAgg]] bits — codegen'd, so the probe
  * runs inside the scan's WholeStageCodegen span (the whole point: the
  * 100 TB side never leaves its scan to be filtered). k must match the
  * build side's k. */
case class BloomContains(left: Expression, right: Expression, k: Int)
  extends BinaryExpression {

  require(k >= 1 && k <= 16, "k hash functions must be in [1, 16]")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_contains expects (binary bits, bigint key), got (${l.simpleString(10)}, ${r.simpleString(10)})")
    }

  override def dataType: DataType = BooleanType

  override def nullSafeEval(bits: Any, v: Any): Any =
    BloomHash.contains(bits.asInstanceOf[Array[Byte]], v.asInstanceOf[Long], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (bits, v) => s"graft.plans.BloomHash.contains($bits, $v, $k)")

  override def prettyName: String = "bloom_contains"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
