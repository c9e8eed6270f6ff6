package graft.plans

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary (Misra & Gries, "Finding repeated
  * elements"; mergeability per Agarwal et al., "Mergeable summaries"): at
  * most `cap` counters per group; returned as `array<struct<item:string,
  * cnt:bigint>>` ordered (cnt DESC, item ASC).
  *
  * Counter maintenance is the classic algorithm: a tracked item
  * increments its counter; an untracked item inserts at 1 when a slot is
  * free, otherwise ALL counters decrement by one (dropping zeros) — the
  * overflow charge is spread across every tracked item. Merges sum
  * matching counters, then restore the bound by subtracting the
  * (cap+1)-th largest count from every counter and dropping the
  * non-positive — the Agarwal et al. merge, which preserves the error
  * bound under arbitrary merge trees. As a TypedImperativeAggregate it
  * partial-aggregates (ObjectHashAggregate map-side combine), so a
  * heavy-hitter profile ships at most `cap` counters per group per
  * partition instead of one row per (group, item).
  *
  * Error contract (UNDER-estimate only, the MG direction):
  * `cnt <= true count <= cnt + n/(cap+1)` where n is the group's total
  * item count — so any item with true frequency above n/(cap+1) is
  * guaranteed retained. While no buffer ever overflows `cap` distinct
  * items — the EXACTNESS regime the DuckDB oracle checks — no decrement
  * or merge-subtraction fires and every count is exact, equal to the
  * GROUP BY truth. All maintenance is deterministic (decrement-all has
  * no victim choice; the merge subtraction is order-free), so results
  * are partitioning-independent in the exact regime.
  *
  * Scale posture: frequent-token profiles over a 100 TB corpus with
  * count(*) GROUP BY item shuffle every distinct (group, item) pair;
  * this summary bounds the shuffle to cap·n_groups counters.
  *
  * NULL items are skipped (like count(col)). Equal-count ties order by
  * UTF-8 byte comparison — DuckDB's binary collation — for ALL inputs,
  * including supplementary-plane characters where UTF-16 code-unit
  * order would diverge.
  */
case class TopFreq(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, java.lang.Long]] {

  require(cap >= 1, "top_freq needs cap >= 1")

  private type Buf = java.util.HashMap[String, java.lang.Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): Buf = new Buf()

  /** Subtract `by` from every counter, dropping the non-positive — the
    * MG overflow/merge-restore step. O(cap). */
  private def decrementAll(buf: Buf, by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      val cur = buf.get(item)
      if (cur != null) buf.put(item, cur + 1L)
      else if (buf.size < cap) buf.put(item, 1L)
      else decrementAll(buf, 1L) // the new item's single count is charged too
    }
    buf
  }

  /** Sum matching counters; if over cap, subtract the (cap+1)-th largest
    * count from all and drop the non-positive. At most `cap` survive:
    * only counters STRICTLY greater than the subtracted value stay
    * positive, and by definition at most cap counters exceed the
    * (cap+1)-th largest. No-op while the union fits in `cap` — the
    * exactness regime. */
  override def merge(buf: Buf, other: Buf): Buf = {
    val it = other.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = buf.get(e.getKey)
      buf.put(e.getKey, if (cur != null) cur + e.getValue else e.getValue)
    }
    if (buf.size > cap) {
      import scala.jdk.CollectionConverters._
      val counts = buf.values().asScala.map(_.longValue).toArray
      java.util.Arrays.sort(counts)
      decrementAll(buf, counts(counts.length - cap - 1)) // (cap+1)-th largest
    }
    buf
  }

  private def sorted(buf: Buf): Seq[(String, Long)] = {
    import scala.jdk.CollectionConverters._
    // tie-break in UTF-8 byte (binary) order, not UTF-16 code-unit order:
    // the two diverge for supplementary-plane characters, and the oracle's
    // row_number ranks by binary collation
    buf.entrySet().asScala.toSeq
      .map(e => (e.getKey, e.getValue.longValue))
      .sortWith { case ((k1, v1), (k2, v2)) =>
        if (v1 != v2) v1 > v2
        else java.util.Arrays.compareUnsigned(
          k1.getBytes(StandardCharsets.UTF_8),
          k2.getBytes(StandardCharsets.UTF_8)) < 0
      }
  }

  override def eval(buf: Buf): Any = {
    val s = sorted(buf)
    val rows = new Array[Any](s.length)
    var i = 0
    while (i < s.length) {
      rows(i) = InternalRow(UTF8String.fromString(s(i)._1), s(i)._2)
      i += 1
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    import scala.jdk.CollectionConverters._
    val entries = buf.entrySet().asScala.toSeq
      .map(e => (e.getKey.getBytes(StandardCharsets.UTF_8), e.getValue.longValue))
    val bb = ByteBuffer.allocate(4 + entries.map(12 + _._1.length).sum)
    bb.putInt(entries.size)
    entries.foreach { case (k, v) =>
      bb.putInt(k.length); bb.put(k); bb.putLong(v)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new Buf()
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
