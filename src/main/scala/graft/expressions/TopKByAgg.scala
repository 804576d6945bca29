package graft.expressions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k aggregate: keeps the `k` payloads with the largest
  * ordering keys, as a `TypedImperativeAggregate` — so Spark's agg
  * framework gives MAP-SIDE PARTIAL aggregation: each input partition
  * reduces to ≤k entries per group before the shuffle.
  *
  * Contrast with the window formulation
  * (`row_number().over(partitionBy(g).orderBy(o)) <= k`), which must
  * shuffle and sort EVERY row of every group. At 100 TB with bounded k,
  * this aggregate moves `groups × k × partitions` rows instead of all of
  * them — the difference between a re-sort of the fact table and a
  * near-map-only pass.
  *
  * v1 signature: ordering key and payload are both LONG (compose richer
  * orderings by packing, cf. the `min_max_by` query). Returns the
  * payloads ordered by descending key.
  */
case class TopKByAgg(ordKey: Expression, payload: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(ordKey, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "top_k_by"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val kv = ordKey.eval(input)
    val pv = payload.eval(input)
    if (kv != null && pv != null)
      buf.add(kv.asInstanceOf[Long], pv.asInstanceOf[Long])
    buf
  }

  override def merge(a: TopKBuffer, b: TopKBuffer): TopKBuffer = {
    a.mergeWith(b); a
  }

  override def eval(buf: TopKBuffer): Any =
    new GenericArrayData(buf.topPayloadsDesc)

  override def serialize(buf: TopKBuffer): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): TopKBuffer =
    TopKBuffer.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(o: Int): TopKByAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): TopKByAgg =
    copy(ordKey = c(0), payload = c(1))
}

/** Bounded min-heap of (ordKey, payload) keeping the k LARGEST
  * entries under the TOTAL order (key DESC, payload ASC) — the same
  * tie rule `topPayloadsDesc` uses to order its output. Breaking key
  * ties on the payload in the heap itself (ADVICE r11) makes the
  * RETAINED SET deterministic under duplicate ordering keys: without
  * it, which of two equal-key entries survives at the heap boundary
  * would depend on partition arrival order. Heap root = the worst
  * retained entry (smallest key; among equal keys, largest payload),
  * evicted on overflow.
  */
final class TopKBuffer(val k: Int) {
  // parallel arrays as a binary heap rooted at the WORST entry under
  // (key DESC, payload ASC)
  private var keys = new Array[Long](math.max(k, 1))
  private var vals = new Array[Long](math.max(k, 1))
  private var n = 0

  def size: Int = n

  /** true iff entry i ranks strictly worse than entry j under
    * (key DESC, payload ASC) — worse = smaller key, or equal key with
    * larger payload.
    */
  private def worse(i: Int, j: Int): Boolean =
    keys(i) < keys(j) || (keys(i) == keys(j) && vals(i) > vals(j))

  def add(key: Long, value: Long): Unit = {
    if (n < k) {
      keys(n) = key; vals(n) = value; n += 1
      siftUp(n - 1)
    } else if (k > 0 &&
        (key > keys(0) || (key == keys(0) && value < vals(0)))) {
      keys(0) = key; vals(0) = value
      siftDown(0)
    }
  }

  def mergeWith(other: TopKBuffer): Unit = {
    var i = 0
    while (i < other.n) { add(other.keys(i), other.vals(i)); i += 1 }
  }

  /** Payloads ordered by key DESC (ties: smaller payload first, for
    * deterministic output).
    */
  def topPayloadsDesc: Array[Long] = {
    // explicit comparator (no arithmetic negation: -Long.MinValue
    // overflows back to Long.MinValue and would rank it largest)
    val idx = (0 until n).sortWith { (i, j) =>
      if (keys(i) != keys(j)) keys(i) > keys(j) else vals(i) < vals(j)
    }
    idx.map(vals(_)).toArray
  }

  def toBytes: Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + n * 16)
    bb.putInt(k).putInt(n)
    var i = 0
    while (i < n) { bb.putLong(keys(i)); bb.putLong(vals(i)); i += 1 }
    bb.array()
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0 && worse(i, (i - 1) / 2)) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    var done = false
    while (!done) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < n && worse(l, m)) m = l
      if (r < n && worse(r, m)) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  private def swap(i: Int, j: Int): Unit = {
    val tk = keys(i); keys(i) = keys(j); keys(j) = tk
    val tv = vals(i); vals(i) = vals(j); vals(j) = tv
  }
}

object TopKBuffer {
  def fromBytes(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var i = 0
    while (i < n) { buf.add(bb.getLong, bb.getLong); i += 1 }
    buf
  }
}

object TopKBy {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  /** Column API: `top_k_by(ordKey, payload, k)` → array<long> of the k
    * payloads with the largest keys, key-descending.
    */
  def top_k_by(ordKey: Column, payload: Column, k: Int): Column =
    column(TopKByAgg(expression(ordKey), expression(payload), k)
      .toAggregateExpression())
}
