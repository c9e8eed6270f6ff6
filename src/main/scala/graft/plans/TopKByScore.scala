package graft.plans

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded heap top-k aggregate: the k best (score, id) pairs per group,
  * best-first, ordered by (score DESC, id ASC) — exactly the engine's
  * top-k window contract (`row_number OVER (ORDER BY score DESC, id)`).
  *
  * NULL contract: rows with a NULL score (or NULL id) are SKIPPED by
  * `update`, matching the engine-wide `score IS NOT NULL` filter every
  * top-k query shape (window and aggregate) and its SQL oracle apply —
  * the two shapes agree by construction even on zero-norm vectors
  * (where cosine yields NULL).
  *
  * SURVEY §4's custom-aggregate criterion, motivated by scale: the window
  * form shuffles EVERY scored (group, id, score) triple to the group's
  * reducer before ranking; this aggregate partial-aggregates
  * (ObjectHashAggregate map-side combine), so each partition contributes
  * at most k rows per group to the shuffle. At fixture scale both are
  * sub-second (the window form stays the oracle-checked query shape); at
  * 100 TB corpus × q queries the shuffle shrinks from |corpus|·q rows to
  * k·partitions·q. Buffer is a bounded binary heap (worst pair at the
  * root); serialization is k (double, long) pairs. */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByScore.Heap] {

  require(k >= 1, "top-k needs k >= 1")

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): TopKByScore.Heap =
    new TopKByScore.Heap(k)

  override def update(buf: TopKByScore.Heap, input: InternalRow): TopKByScore.Heap = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.offer(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKByScore.Heap, other: TopKByScore.Heap): TopKByScore.Heap = {
    var i = 0
    while (i < other.size) { buf.offer(other.scores(i), other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKByScore.Heap): Any = {
    val (ss, is) = buf.sortedBestFirst()
    val rows = new Array[Any](ss.length)
    var i = 0
    while (i < ss.length) {
      rows(i) = InternalRow(ss(i), is(i))
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKByScore.Heap): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByScore.Heap = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKByScore.Heap(k)
    var i = 0
    while (i < n) { buf.offer(bb.getDouble, bb.getLong); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))

  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  /** Bounded binary min-heap on the retention order: the WORST retained
    * pair — lowest score; among equal scores, the largest id — sits at
    * the root, so a better candidate replaces it in O(log k). */
  final class Heap(val k: Int) {
    val scores = new Array[Double](k)
    val ids = new Array[Long](k)
    var size = 0

    /** true when (s1, i1) is worse than (s2, i2) under (score DESC, id ASC). */
    private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
      s1 < s2 || (s1 == s2 && i1 > i2)

    def offer(s: Double, i: Long): Unit = {
      if (size < k) {
        scores(size) = s; ids(size) = i; size += 1
        siftUp(size - 1)
      } else if (worse(scores(0), ids(0), s, i)) {
        scores(0) = s; ids(0) = i
        siftDown(0)
      }
    }

    private def siftUp(start: Int): Unit = {
      var c = start
      while (c > 0) {
        val p = (c - 1) >> 1
        if (worse(scores(c), ids(c), scores(p), ids(p))) { swap(c, p); c = p }
        else return
      }
    }

    private def siftDown(start: Int): Unit = {
      var p = start
      while (true) {
        val l = 2 * p + 1
        val r = l + 1
        var w = p // worst of parent and children
        if (l < size && worse(scores(l), ids(l), scores(w), ids(w))) w = l
        if (r < size && worse(scores(r), ids(r), scores(w), ids(w))) w = r
        if (w == p) return
        swap(p, w); p = w
      }
    }

    private def swap(a: Int, b: Int): Unit = {
      val ts = scores(a); scores(a) = scores(b); scores(b) = ts
      val ti = ids(a); ids(a) = ids(b); ids(b) = ti
    }

    /** Retained pairs ordered best-first: (score DESC, id ASC). */
    def sortedBestFirst(): (Array[Double], Array[Long]) = {
      val idx = (0 until size).sortBy(i => (-scores(i), ids(i)))
      (idx.map(scores).toArray, idx.map(ids).toArray)
    }
  }
}
