package graft.plans

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KLL-style mergeable quantile-sketch buffer over longs.
  *
  * Level i holds items of weight 2^i; level 0 takes raw inserts. When a
  * level exceeds k items it is sorted and every other item is promoted
  * to the next level at doubled weight (classic KLL compaction,
  * Karnin/Lang/Liberty 2016). Two determinism choices replace KLL's coin
  * flips: the kept parity alternates with a per-buffer compaction
  * counter, and an odd-length level leaves its maximum in place so every
  * compaction is exactly weight-preserving. The result is still
  * partition-ORDER-dependent once compaction fires (which items share a
  * level when it overflows depends on arrival order) — so, like TopFreq
  * and KmvMins, the oracle checks the EXACT regime (k above the group
  * size: no compaction ever fires and the buffer is the full multiset),
  * while the compacting regime's rank-error bound is property-tested in
  * the spec.
  *
  * This is the third leg of the engine's mergeable-summary surface
  * (KmvMins = distinct count, TopFreq = heavy hitters, this = quantiles):
  * at 100 TB a grouped percentile is one bounded buffer per group per
  * partition — O(k·log(n/k)) longs — map-side combined before the
  * shuffle, where an exact percentile would sort the whole column.
  */
final class QSketchBuffer(val k: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Long]] = ArrayBuffer(ArrayBuffer[Long]())
  var compactions: Long = 0L

  def insert(v: Long): Unit = {
    levels(0) += v
    if (levels(0).length > k) compact(0)
  }

  private def compact(i: Int): Unit = {
    val sorted = levels(i).sortInPlace()
    if (levels.length == i + 1) levels += ArrayBuffer[Long]()
    // odd length: the max stays at this level so promoted weight exactly
    // equals retired weight (2 * m items of w -> m items of 2w)
    val even = sorted.length - (sorted.length & 1)
    val keep = (compactions & 1L).toInt
    compactions += 1
    val next = levels(i + 1)
    var j = keep
    while (j < even) { next += sorted(j); j += 2 }
    val rest = ArrayBuffer[Long]()
    if (even < sorted.length) rest += sorted(even)
    levels(i) = rest
    if (next.length > k) compact(i + 1)
  }

  def mergeIn(other: QSketchBuffer): Unit = {
    while (levels.length < other.levels.length) levels += ArrayBuffer[Long]()
    var i = 0
    while (i < other.levels.length) { levels(i) ++= other.levels(i); i += 1 }
    i = 0
    while (i < levels.length) { if (levels(i).length > k) compact(i); i += 1 }
  }

  def totalWeight: Long = {
    var w = 0L
    var i = 0
    while (i < levels.length) { w += levels(i).length.toLong << i; i += 1 }
    w
  }

  /** Weighted lower quantiles: for each prob q, the item covering
    * weighted rank floor(q·(W−1)) of the sorted flattened multiset —
    * in the exact regime precisely sorted_values[floor(q·(n−1))]
    * (type-1 quantiles, reproducible in plain SQL). */
  def quantiles(probs: Array[Double]): Array[Long] = {
    val n = levels.map(_.length).sum
    val vs = new Array[Long](n)
    val wsArr = new Array[Long](n)
    var o = 0
    var i = 0
    while (i < levels.length) {
      val lvl = levels(i)
      var j = 0
      while (j < lvl.length) { vs(o) = lvl(j); wsArr(o) = 1L << i; o += 1; j += 1 }
      i += 1
    }
    val idx = Array.range(0, n).sortBy(vs(_))
    val total = totalWeight
    probs.map { q =>
      if (n == 0) 0L
      else {
        val t = math.floor(q * (total - 1).toDouble).toLong
        var cum = 0L
        var p = 0
        var res = vs(idx(n - 1))
        var found = false
        while (p < n && !found) {
          cum += wsArr(idx(p))
          if (cum > t) { res = vs(idx(p)); found = true }
          p += 1
        }
        res
      }
    }
  }
}

/** Grouped quantile aggregate over a LongType child: returns
  * array<bigint> of the sketch's lower-quantile values at `probs`
  * (dyadic probs like 0.25/0.5/0.75 keep floor(q·(W−1)) bit-exact on
  * every engine). Partial-aggregates like the other sketches: each
  * partition ships one bounded buffer per group, never the rows. */
case class QuantileSketch(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[QSketchBuffer] {

  require(k >= 8, "quantile sketch needs k >= 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // without this, a non-long child (quantile_sketch(int_col, ...) via the
  // SQL registry) passes analysis and ClassCastExceptions in update()
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"quantile_sketch requires BIGINT input, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): QSketchBuffer = new QSketchBuffer(k)

  override def update(buf: QSketchBuffer, input: InternalRow): QSketchBuffer = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: QSketchBuffer, other: QSketchBuffer): QSketchBuffer = {
    buf.mergeIn(other)
    buf
  }

  override def eval(buf: QSketchBuffer): Any =
    new GenericArrayData(buf.quantiles(probs.toArray))

  override def serialize(buf: QSketchBuffer): Array[Byte] = {
    val n = buf.levels.map(_.length).sum
    val bb = ByteBuffer.allocate(8 + 4 + buf.levels.length * 4 + n * 8)
    bb.putLong(buf.compactions)
    bb.putInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      bb.putInt(lvl.length)
      lvl.foreach(bb.putLong)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): QSketchBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new QSketchBuffer(k)
    buf.compactions = bb.getLong
    val nLevels = bb.getInt
    buf.levels.clear()
    var i = 0
    while (i < nLevels) {
      val len = bb.getInt
      val lvl = new ArrayBuffer[Long](len)
      var j = 0
      while (j < len) { lvl += bb.getLong; j += 1 }
      buf.levels += lvl
      i += 1
    }
    if (buf.levels.isEmpty) buf.levels += ArrayBuffer[Long]()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QuantileSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "quantile_sketch"
}
