package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded min-heap buffer for [[TopKPairs]]: the k largest (ord, id) pairs
  * under lexicographic order, kept as primitive parallel arrays (no boxing
  * on the update path; serialization is a flat ByteBuffer).
  */
final class TopKBuffer(val k: Int) {
  val ords = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // heap root (index 0) = the SMALLEST kept pair: replace-root when a new
  // pair beats it, sift to restore. Double.compare, not primitive <: a
  // primitive comparison is always false for NaN, so an early NaN pair
  // would squat in the heap un-evictable and un-sifted; Double.compare
  // gives NaN the same "greater than everything" total order Spark's own
  // window sort uses, keeping the window-equivalence exact even on NaN
  // scores (a zero vector's cosine is 0/0).
  private def less(o1: Double, i1: Long, o2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(o1, o2)
    c < 0 || (c == 0 && i1 < i2)
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0) {
      val p = (i - 1) / 2
      if (less(ords(i), ids(i), ords(p), ids(p))) {
        val to = ords(i); val ti = ids(i)
        ords(i) = ords(p); ids(i) = ids(p)
        ords(p) = to; ids(p) = ti
        i = p
      } else return
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    while (true) {
      val l = 2 * i + 1
      val r = 2 * i + 2
      var m = i
      if (l < size && less(ords(l), ids(l), ords(m), ids(m))) m = l
      if (r < size && less(ords(r), ids(r), ords(m), ids(m))) m = r
      if (m == i) return
      val to = ords(i); val ti = ids(i)
      ords(i) = ords(m); ids(i) = ids(m)
      ords(m) = to; ids(m) = ti
      i = m
    }
  }

  def add(ord: Double, id: Long): Unit = {
    if (size < k) {
      ords(size) = ord; ids(size) = id
      size += 1
      siftUp(size - 1)
    } else if (less(ords(0), ids(0), ord, id)) {
      ords(0) = ord; ids(0) = id
      siftDown()
    }
  }
}

/** Exact top-k per group WITHOUT sorting the group: a
  * `TypedImperativeAggregate` keeping a bounded min-heap of the k largest
  * (ord, id) pairs — ties broken by id, so the result is a total order and
  * exactly equals `row_number() OVER (ORDER BY ord DESC, id DESC) <= k`.
  *
  * The scale story is the shuffle volume: the window form exchanges EVERY
  * row of every group to sort it; this aggregate partially aggregates —
  * each input partition sends at most k pairs per group across the
  * exchange, and merges are heap-unions. At 100 TB, per-group top-k via
  * window is |rows| shuffled; via this aggregate it is ≤ k·partitions.
  * This is also the library's custom-AGGREGATE extension-point exemplar
  * (the scalar natives live in HashExpressions/VectorExpressions).
  *
  * Returns array<struct<ord double, id long>> sorted (ord, id) descending.
  */
case class TopKPairs(ordExpr: Expression, idExpr: Expression, k: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBuffer] {
  require(k >= 1, "k must be >= 1")

  override def children: Seq[Expression] = Seq(ordExpr, idExpr)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("ord", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (ordExpr.dataType, idExpr.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (o, i) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (double, bigint), got (${o.catalogString}, ${i.catalogString})")
    }
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val o = ordExpr.eval(input)
    val i = idExpr.eval(input)
    if (o != null && i != null)
      buf.add(o.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    var j = 0
    while (j < other.size) { buf.add(other.ords(j), other.ids(j)); j += 1 }
    buf
  }

  override def eval(buf: TopKBuffer): Any = {
    // descending under the heap's own total order (Double.compare) — a
    // tuple sortBy on negated doubles would misplace NaN
    val idx = (0 until buf.size).sortWith { (a, b) =>
      val c = java.lang.Double.compare(buf.ords(b), buf.ords(a))
      c < 0 || (c == 0 && buf.ids(b) < buf.ids(a))
    }
    new GenericArrayData(idx.map { j =>
      InternalRow(buf.ords(j), buf.ids(j))
    }.toArray[Any])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    var j = 0
    while (j < buf.size) { bb.putDouble(buf.ords(j)); bb.putLong(buf.ids(j)); j += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new TopKBuffer(k)
    var j = 0
    while (j < n) { buf.add(bb.getDouble, bb.getLong); j += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(ordExpr = newChildren(0), idExpr = newChildren(1))
}

/** Misra-Gries summary buffer for [[HeavyHitters]]: at most `capacity`
  * (token, count) counters. Keys are JVM Strings (copied out of Spark's
  * reusable UTF8String row buffers — holding the raw reference would alias
  * every key to the last row read).
  */
final class MGBuffer(val capacity: Int) {
  val counts = new java.util.HashMap[String, Long](capacity * 2)

  def add(token: String, by: Long): Unit = {
    val cur = counts.get(token)
    if (cur != 0L || counts.containsKey(token)) counts.put(token, cur + by)
    else if (counts.size < capacity) counts.put(token, by)
    else {
      // no room: decrement every counter by 1 (the arriving item's count
      // is absorbed by the decrement), dropping zeros — classic MG step;
      // `by` > 1 only arrives via merge, which handles overflow itself
      var dec = by
      while (dec > 0) { decrementAll(1L); dec -= 1 }
    }
  }

  private def decrementAll(by: Long): Unit = {
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val nv = e.getValue - by
      if (nv <= 0L) it.remove() else e.setValue(nv)
    }
  }

  /** Agarwal et al. merge: sum counters pairwise, then if over capacity
    * subtract the (capacity+1)-th largest count from all and drop ≤ 0 —
    * the summary stays a valid MG sketch of the union stream.
    */
  def mergeFrom(other: MGBuffer): Unit = {
    val it = other.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = counts.get(e.getKey)
      if (cur != 0L || counts.containsKey(e.getKey)) counts.put(e.getKey, cur + e.getValue)
      else counts.put(e.getKey, e.getValue)
    }
    if (counts.size > capacity) {
      val vals = new Array[Long](counts.size)
      var i = 0
      val vit = counts.values().iterator()
      while (vit.hasNext) { vals(i) = vit.next(); i += 1 }
      java.util.Arrays.sort(vals)
      val cut = vals(vals.length - capacity - 1) // (capacity+1)-th largest
      decrementAll(cut)
      // ties at the cut can leave > capacity survivors only if all survivors
      // share the cut value; MG tolerates a transient size > capacity —
      // subsequent adds re-apply pressure — but keep the bound tight:
      while (counts.size > capacity) decrementAll(1L)
    }
  }
}

/** Per-group heavy hitters via a Misra-Gries summary — frequent-items in
  * ONE pass with a hard memory bound, the third member of the mergeable-
  * sketch family (HLL distinct, GK quantiles, MG frequencies). Each input
  * partition keeps ≤ `capacity` counters per group and the exchange
  * carries summaries, not the (group, token) universe — at 100 TB with a
  * web-scale vocabulary, the full groupBy(token) aggregate shuffles
  * |vocab|·|groups| rows to answer a top-10 question; this carries
  * ≤ capacity·partitions per group, independent of vocabulary size.
  *
  * Guarantee: any token with true frequency > n/(capacity+1) survives, and
  * kept counts undercount by at most the total decrement. When `capacity`
  * ≥ the group's distinct-token count, no decrement ever fires and every
  * count is EXACT (the regime the driver oracle pins on gate data, whose
  * vocabulary is 31 tokens; the sketch regime is spec-asserted on an
  * adversarial stream).
  *
  * Input is the per-row token ARRAY (elements fold into the summary one by
  * one) — no explode, so the only exchange in a heavy-hitters query is the
  * group-by itself. Returns array<struct<token string, cnt long>> sorted
  * (cnt desc, token asc) — a total order.
  */
case class HeavyHitters(child: Expression, capacity: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MGBuffer] {
  require(capacity >= 1, "capacity must be >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_heavy_hitters"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("cnt", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${other.catalogString}")
    }
  }

  override def createAggregationBuffer(): MGBuffer = new MGBuffer(capacity)

  override def update(buf: MGBuffer, input: InternalRow): MGBuffer = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = a.numElements()
      var i = 0
      while (i < n) {
        if (!a.isNullAt(i)) buf.add(a.getUTF8String(i).toString, 1L)
        i += 1
      }
    }
    buf
  }

  override def merge(buf: MGBuffer, other: MGBuffer): MGBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: MGBuffer): Any = {
    val entries = new Array[(String, Long)](buf.counts.size)
    var i = 0
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); entries(i) = (e.getKey, e.getValue); i += 1 }
    val sorted = entries.sortWith { (a, b) =>
      a._2 > b._2 || (a._2 == b._2 && a._1 < b._1)
    }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(org.apache.spark.unsafe.types.UTF8String.fromString(t), c)
    }.toArray[Any])
  }

  override def serialize(buf: MGBuffer): Array[Byte] = {
    val entries = new scala.collection.mutable.ArrayBuffer[(Array[Byte], Long)](buf.counts.size)
    var total = 4
    val it = buf.counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val b = e.getKey.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      entries += ((b, e.getValue))
      total += 4 + b.length + 8
    }
    val bb = java.nio.ByteBuffer.allocate(total)
    bb.putInt(entries.size)
    entries.foreach { case (b, c) => bb.putInt(b.length); bb.put(b); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): MGBuffer = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new MGBuffer(capacity)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.counts.put(new String(b, java.nio.charset.StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HeavyHitters =
    copy(child = newChildren(0))
}
