package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Bounded top-k buffer: a size-k min-heap ordered by "badness" — the root
  * is the WORST kept entry, so a candidate only displaces it when strictly
  * better. Better = higher value, ties to the smaller id (deterministic,
  * matching `ORDER BY value DESC, id` in the oracle). */
final class TopKBuffer(val k: Int) {
  // parallel arrays, heap-shaped; n ≤ k entries
  val values = new Array[Double](k)
  val ids = new Array[Long](k)
  var n = 0

  /** a is WORSE than b (lower value, or same value with larger id). */
  @inline private def worse(va: Double, ia: Long, vb: Double, ib: Long) =
    va < vb || (va == vb && ia > ib)

  private def siftDown(i0: Int): Unit = {
    var i = i0
    while (true) {
      val l = 2 * i + 1; val r = l + 1
      var w = i // index of worst among i and its children
      if (l < n && worse(values(l), ids(l), values(w), ids(w))) w = l
      if (r < n && worse(values(r), ids(r), values(w), ids(w))) w = r
      if (w == i) return
      val tv = values(i); values(i) = values(w); values(w) = tv
      val ti = ids(i); ids(i) = ids(w); ids(w) = ti
      i = w
    }
  }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    while (i > 0) {
      val p = (i - 1) / 2
      if (!worse(values(i), ids(i), values(p), ids(p))) return
      val tv = values(i); values(i) = values(p); values(p) = tv
      val ti = ids(i); ids(i) = ids(p); ids(p) = ti
      i = p
    }
  }

  def insert(v: Double, id: Long): Unit =
    if (n < k) {
      values(n) = v; ids(n) = id; n += 1; siftUp(n - 1)
    } else if (worse(values(0), ids(0), v, id)) {
      values(0) = v; ids(0) = id; siftDown(0)
    }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.values(i), o.ids(i)); i += 1 }
  }

  /** (value, id) pairs best-first. */
  def sortedDesc: Array[(Double, Long)] =
    (0 until n).map(i => (values(i), ids(i))).toArray
      .sortWith((a, b) => worse(b._1, b._2, a._1, a._2))
}

/** Top-k-per-group as an AGGREGATE, not a window: the map side keeps a
  * size-k heap per group and the shuffle carries ≤ k (value, id) pairs per
  * (map partition, group) — versus the window formulation (q23's
  * `row_number ≤ k`), which shuffles EVERY row of every group and sorts
  * them before discarding all but k. At 100 TB with k = 5 that is the
  * difference between a kilobyte and a terabyte per group on the wire;
  * this is the same partial/final contract Spark's own collect_top_k
  * planned rewrite exploits for global ORDER BY + LIMIT, generalized to
  * grouped aggregation.
  *
  * Ordering is total and deterministic: higher value wins, ties to the
  * smaller id — bitwise the same `ORDER BY value DESC, id` the SQL oracle
  * uses. Null value or id is ignored (SQL aggregate convention). Returns
  * `array<struct<id, value>>` best-first; `posexplode` it for ranked rows.
  *
  * Runs under `ObjectHashAggregateExec` (TypedImperativeAggregate), which
  * keeps one live heap object per group — no per-row allocation; the
  * serialized form between stages is a flat (n, pairs…) byte image.
  */
case class TopKByValue(valueExpr: Expression, idExpr: Expression, k: Int,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {
  require(k >= 1 && k <= (1 << 20), s"k must be in [1, 2^20], got $k")

  override def children: Seq[Expression] = Seq(valueExpr, idExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("value", DoubleType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val v = valueExpr.eval(input)
    val id = idExpr.eval(input)
    if (v != null && id != null)
      b.insert(v.asInstanceOf[Double], id.asInstanceOf[Long])
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKBuffer): Any =
    new GenericArrayData(b.sortedDesc.map { case (v, id) =>
      InternalRow(id, v)
    }.asInstanceOf[Array[Any]])

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 16 * b.n)
    buf.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putDouble(b.values(i)).putLong(b.ids(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val b = new TopKBuffer(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) {
      val v = buf.getDouble(); val id = buf.getLong()
      b.insert(v, id); i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByValue =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByValue =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(valueExpr = newChildren(0), idExpr = newChildren(1))
  override def prettyName: String = "top_k_by_value"
}

object TopKAgg {
  /** `top_k_by_value(value, id, k)` aggregate Column: the k (id, value)
    * pairs with the highest values per group, best-first, ties to the
    * smaller id. */
  def topKByValue(value: Column, id: Column, k: Int): Column =
    ColumnBridge.column(
      TopKByValue(ColumnBridge.expression(value.cast("double")),
        ColumnBridge.expression(id.cast("long")), k)
        .toAggregateExpression())
}
