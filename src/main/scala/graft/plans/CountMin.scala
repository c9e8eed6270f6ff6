package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Shared Count-Min hashing: row `d`'s bucket for key `v` is
  * `((a_d · (v mod P) + b_d) mod P) mod width` — a pairwise-independent
  * linear-congruential family over the prime P = 1e9+7 (Cormode &
  * Muthukrishnan, "An improved data stream summary: the count-min
  * sketch", J. Algorithms 2005). Every step is exact nonnegative
  * integer arithmetic below 2^63 (a_d < P, v mod P < P ⇒ product
  * < ~1e18), so the SAME formula runs verbatim in the DuckDB oracle —
  * the reason this family is used instead of an engine-private hash.
  */
object CmsHash {
  val P = 1000000007L
  /** Row-d multiplier / offset; a_d is never 0 mod P for d < ~9.5e3. */
  def a(d: Int): Long = (2654435761L + 104729L * d) % P
  def b(d: Int): Long = (12582917L * (d + 1)) % P
  def bucket(v: Long, d: Int, width: Int): Int = {
    val x = ((v % P) + P) % P // nonnegative residue, matches SQL's ((v % P) + P) % P
    (((a(d) * x + b(d)) % P) % width).toInt
  }
}

/** Count-Min sketch aggregate over a LongType key column: a
  * depth×width counter matrix, returned flattened row-major as
  * array<bigint> (slot d·width + bucket). Point frequency estimates
  * read `min_d matrix[d][h_d(key)]` — never an under-count, over-counts
  * only on all-rows collision (probability ≤ (n/width)^depth-ish).
  *
  * Fourth sketch leg after KMV (distinct), Misra-Gries (heavy-hitter
  * IDENTITIES) and KLL (quantiles): the CMS answers arbitrary
  * point-frequency queries — "how often did THIS key occur" — which
  * Misra-Gries only answers for keys that survived its cap.
  *
  * Scale posture: replaces a full (group, key) count shuffle with one
  * bounded depth·width matrix per group per partition, merged by
  * elementwise add (map-side combine via ObjectHashAggregate). At
  * 100 TB the matrix is the only thing that moves; the keys never
  * shuffle. Buffer is depth·width longs, sized by the CALLER — the
  * shipped events query (Sketches.eventsCmsCounts, depth=4 width=8192)
  * serializes 256 KiB per group per partition into the merge shuffle;
  * budget width against that payload, not against the error bound
  * alone.
  */
case class CmsAgg(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16, "cms_agg depth must be in [1, 16]")
  require(width >= 2, "cms_agg width must be >= 2")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_agg requires a BIGINT key, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      var d = 0
      while (d < depth) {
        buf(d * width + CmsHash.bucket(key, d, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "cms_agg"
}
