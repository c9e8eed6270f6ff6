package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-Saving frequent-items sketch (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams"): at most
  * `cap` counters per group; returned as `array<struct<item:string,
  * cnt:bigint>>` ordered (cnt DESC, item ASC).
  *
  * Counter maintenance is the classic algorithm: a tracked item
  * increments its counter; an untracked item takes over the minimum
  * counter at `min + 1` (over-estimating by at most that evicted
  * minimum). Merges sum matching counters and keep the `cap` largest —
  * the mergeable-summaries variant, so partial aggregation
  * (ObjectHashAggregate map-side combine) ships at most `cap` counters
  * per group per partition instead of one row per (group, item).
  *
  * EXACTNESS contract (what the DuckDB oracle checks): while a buffer
  * never overflows `cap` — i.e. every partition and every merge sees at
  * most `cap` distinct items per group — no eviction or trim ever
  * happens and all counts are exact, equal to GROUP BY item counts.
  * Beyond `cap` distinct items the result is an over-estimate bounded by
  * n/cap per counter (heavy hitters above that threshold are never
  * lost). Eviction is deterministic: (lowest count, lexicographically
  * LARGEST item) goes first, mirroring the output order's (cnt DESC,
  * item ASC) preference.
  *
  * Scale posture: frequent-token / heavy-hitter profiles over a 100 TB
  * corpus with count(*) GROUP BY item shuffle every distinct (group,
  * item) pair; this sketch bounds the shuffle to cap·n_groups counters.
  *
  * NULL items are skipped (like count(col)). Item ordering is Java
  * String order — identical to DuckDB's binary collation for ASCII.
  */
case class TopFreq(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]] {

  require(cap >= 1, "top_freq needs cap >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  /** (lowest count, lexicographically largest item) — the deterministic
    * eviction victim. Linear scan; runs only when the buffer is full AND
    * the incoming item is untracked. */
  private def minEntry(buf: java.util.HashMap[String, Long]): (String, Long) = {
    var mk: String = null
    var mv = Long.MaxValue
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val v = e.getValue
      if (v < mv || (v == mv && e.getKey.compareTo(mk) > 0)) {
        mk = e.getKey; mv = v
      }
    }
    (mk, mv)
  }

  private def offer(buf: java.util.HashMap[String, Long], item: String, by: Long): Unit = {
    val cur = buf.get(item)
    if (buf.containsKey(item)) buf.put(item, cur + by)
    else if (buf.size < cap) buf.put(item, by)
    else {
      val (mk, mv) = minEntry(buf)
      buf.remove(mk)
      buf.put(item, mv + by)
    }
  }

  override def update(buf: java.util.HashMap[String, Long],
                      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[UTF8String].toString, 1L)
    buf
  }

  /** Sum matching counters, then trim to the `cap` largest by (cnt DESC,
    * item ASC). Trimming (vs per-item eviction) preserves the sketch's
    * over-estimate-only error direction and is a no-op while the union
    * fits in `cap` — the exactness regime. */
  override def merge(buf: java.util.HashMap[String, Long],
                     other: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      if (buf.containsKey(e.getKey)) buf.put(e.getKey, cur + e.getValue)
      else buf.put(e.getKey, e.getValue)
    }
    if (buf.size > cap) {
      val kept = sorted(buf).take(cap)
      buf.clear()
      kept.foreach { case (k, v) => buf.put(k, v) }
    }
    buf
  }

  private def sorted(buf: java.util.HashMap[String, Long]): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    buf.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue))
      .sortBy { case (k, v) => (-v, k) }
  }

  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val s = sorted(buf)
    val rows = new Array[Any](s.length)
    var i = 0
    while (i < s.length) {
      rows(i) = InternalRow(UTF8String.fromString(s(i)._1), s(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    val entries = buf.entrySet().asScala.toSeq
      .map(e => (e.getKey.getBytes(StandardCharsets.UTF_8), e.getValue))
    val bb = ByteBuffer.allocate(4 + entries.map(12 + _._1.length).sum)
    bb.putInt(entries.size)
    entries.foreach { case (k, v) =>
      bb.putInt(k.length); bb.put(k); bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new java.util.HashMap[String, Long]()
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val k = new Array[Byte](len)
      bb.get(k)
      buf.put(new String(k, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopFreq =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopFreq =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)

  override def prettyName: String = "top_freq"
}
