package graft.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a mergeable
  * `TypedImperativeAggregate`: at most `k` counters; an unseen item
  * past capacity decrements ALL counters (dropping zeros) instead of
  * being stored. Guarantee: every item with true frequency > n/(k+1)
  * survives in the summary — so the summary is a SUPERSET of the
  * items above any threshold ≥ n/k, with at most k candidates, in one
  * pass, in O(k) state per group.
  *
  * Merge follows Agarwal et al., "Mergeable Summaries" (PODS'12):
  * add counters pairwise, then if more than k remain, subtract the
  * (k+1)-th largest count from all and drop the non-positive — the
  * error bound n/(k+1) is preserved under arbitrary merge trees,
  * which is what makes the sketch shuffle-safe (map-side partials
  * merge in any order).
  *
  * The COUNTS in a merged summary depend on partition boundaries, so
  * they are deliberately not exposed: [[Frequent.mg_candidates]]
  * returns only the candidate item set (sorted), and callers verify
  * with one exact counting pass over the candidates — the same
  * candidates-then-verify shape as the LSH dedup family. The exact
  * pass costs one scan but the candidate set is ≤ k items, so the
  * verify aggregation state is bounded; the end-to-end result is
  * exact and deterministic while the corpus-wide vocabulary is never
  * held in memory.
  */
case class MisraGriesAgg(child: Expression, k: Int,
                         mutableAggBufferOffset: Int = 0,
                         inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MgBuffer]
    with ImplicitCastInputTypes {
  require(k >= 1, s"mg_candidates needs k >= 1, got $k")
  override def children: Seq[Expression] = Seq(child)
  // Declared input type: non-string children implicit-cast to STRING
  // at analysis instead of ClassCastException-ing in update().
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "mg_candidates"
  override def createAggregationBuffer(): MgBuffer = new MgBuffer(k)
  override def update(buf: MgBuffer, in: InternalRow): MgBuffer = {
    val v = child.eval(in)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].toString)
    buf
  }
  override def merge(a: MgBuffer, b: MgBuffer): MgBuffer = {
    a.mergeWith(b); a
  }
  override def eval(buf: MgBuffer): Any = {
    val items = buf.items.sorted
    new GenericArrayData(items.map(UTF8String.fromString(_)))
  }
  override def serialize(buf: MgBuffer): Array[Byte] = buf.toBytes
  override def deserialize(b: Array[Byte]): MgBuffer = MgBuffer.fromBytes(b)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): MisraGriesAgg = copy(child = c(0))
}

/** At most k (item, count) counters. Decrement-all is implemented as
  * a shared offset subtraction at eviction time (O(k) only when the
  * map is full AND the item is new — amortized O(1) per row on skewed
  * streams, which is the workload the sketch exists for).
  */
final class MgBuffer(val k: Int) {
  // java.lang.Long explicitly: with scala.Long the erased get() would
  // unbox a missing key's null to 0L and the null check never fires
  private val counts = new java.util.HashMap[String, java.lang.Long]

  def size: Int = counts.size
  def items: Array[String] = {
    val out = new Array[String](counts.size)
    val it = counts.keySet().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }
  def countOf(item: String): Long = {
    val c = counts.get(item)
    if (c == null) 0L else c.longValue()
  }

  def add(item: String, by: Long = 1L): Unit = {
    val cur = counts.get(item)
    if (cur != null) {
      counts.put(item, java.lang.Long.valueOf(cur.longValue() + by))
      ()
    } else if (counts.size < k) {
      counts.put(item, java.lang.Long.valueOf(by))
      ()
    } else decrementAll(by, thenPut = item)
  }

  /** Subtract `by` from every counter; a new item with residual > 0
    * takes a freed slot. Classic MG generalized to weighted adds.
    */
  private def decrementAll(by: Long, thenPut: String): Unit = {
    // smallest existing counter bounds how much actually cancels
    var minC = Long.MaxValue
    val it0 = counts.values().iterator()
    while (it0.hasNext) minC = math.min(minC, it0.next().longValue())
    val dec = math.min(by, minC)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue.longValue() - dec
      if (nv <= 0L) it.remove() else e.setValue(java.lang.Long.valueOf(nv))
    }
    val residual = by - dec
    if (residual > 0L && counts.size < k) {
      counts.put(thenPut, java.lang.Long.valueOf(residual))
      ()
    }
  }

  /** PODS'12 merge: pairwise add, then reduce back to ≤ k counters by
    * subtracting the (k+1)-th largest count from all.
    */
  def mergeWith(other: MgBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      val base = if (cur == null) 0L else cur.longValue()
      counts.put(e.getKey,
        java.lang.Long.valueOf(base + e.getValue.longValue()))
      ()
    }
    if (counts.size > k) {
      val vals = new Array[Long](counts.size)
      val vi = counts.values().iterator()
      var i = 0
      while (vi.hasNext) { vals(i) = vi.next().longValue(); i += 1 }
      java.util.Arrays.sort(vals)
      // (k+1)-th largest = vals[size - k - 1] in ascending order
      val cut = vals(counts.size - k - 1)
      val ei = counts.entrySet().iterator()
      while (ei.hasNext) {
        val e = ei.next()
        val nv = e.getValue.longValue() - cut
        if (nv <= 0L) ei.remove()
        else e.setValue(java.lang.Long.valueOf(nv))
      }
    }
  }

  def toBytes: Array[Byte] = {
    var sz = 8
    val it0 = counts.keySet().iterator()
    while (it0.hasNext)
      sz += 12 + it0.next().getBytes(StandardCharsets.UTF_8).length
    val bb = ByteBuffer.allocate(sz)
    bb.putInt(k).putInt(counts.size)
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(StandardCharsets.UTF_8)
      bb.putInt(b.length).put(b).putLong(e.getValue)
    }
    bb.array()
  }
}

object MgBuffer {
  def fromBytes(bytes: Array[Byte]): MgBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new MgBuffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      buf.add(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }
}

object Frequent {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** `mg_candidates(item, k)` → ARRAY<STRING>: sorted candidate set
    * guaranteed to contain every item with frequency > n/(k+1). Verify
    * with one exact counting pass over the (≤ k) candidates.
    */
  def mg_candidates(item: Column, k: Int): Column =
    column(MisraGriesAgg(expression(item), k).toAggregateExpression())
}
