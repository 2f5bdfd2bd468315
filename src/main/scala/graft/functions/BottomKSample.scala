package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Deterministic per-group bottom-k sample: keeps the `k` values with the
  * smallest (hash(value), value) rank — the classic mergeable bottom-k
  * sketch, so a group's sample is IDENTICAL regardless of partitioning,
  * merge order, or cluster size. This is the distributed-sampling primitive
  * a training-data pipeline uses to draw stable per-group subsets at 100 TB
  * (per-partition partial sketches merge associatively; the shuffle carries
  * k values per group, not the group).
  *
  * The rank hash is deliberately simple multiplicative hashing
  * (`(v * 2654435761) mod 1000000007`, Knuth's constant) so an external
  * oracle can reproduce the exact sample in SQL.
  *
  * This is the engine's UDAF surface (`TypedImperativeAggregate`): the
  * mechanism a user extends for custom aggregates, complementing the
  * `FunctionRegistry` scalar surface (SURVEY.md §2.8 — the reference has no
  * UDAF at all).
  */
case class BottomKSample(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.ArrayBuffer[Long]] {

  private type Buf = scala.collection.mutable.ArrayBuffer[Long]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k_sample"

  @inline private def rank(v: Long): Long =
    java.lang.Math.floorMod(v * 2654435761L, 1000000007L)

  override def createAggregationBuffer(): Buf =
    scala.collection.mutable.ArrayBuffer.empty[Long]

  private def trim(buf: Buf): Buf = {
    if (buf.length > k) {
      val sorted = buf.sortBy(v => (rank(v), v)).take(k)
      buf.clear()
      buf ++= sorted
    }
    buf
  }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      buf += v.asInstanceOf[Long]
      // amortized trim: keep the buffer bounded at 2k between sorts
      if (buf.length >= 2 * k) trim(buf)
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    buf ++= other
    trim(buf)
  }

  override def eval(buf: Buf): Any =
    new GenericArrayData(trim(buf).sortBy(v => (rank(v), v)).toArray)

  override def serialize(buf: Buf): Array[Byte] = {
    val trimmed = trim(buf)
    val bb = ByteBuffer.allocate(4 + trimmed.length * 8)
    bb.putInt(trimmed.length)
    trimmed.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf += bb.getLong; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BottomKSample =
    copy(child = newChildren.head)
}

object BottomKSample {
  /** Column API: `bottomKSample(col, k)` → array<long> of the stable
    * k-sample of the group. */
  def bottomKSample(c: Column, k: Int): Column =
    ColumnBridge.column(
      BottomKSample(ColumnBridge.expression(c), k).toAggregateExpression())
}
