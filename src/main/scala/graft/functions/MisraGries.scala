package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items buffer: at most `m` counters. The classic
  * stream update (Misra & Gries'82): a tracked item increments; an
  * untracked item claims a free counter, or — when all `m` are taken —
  * decrements EVERY counter by one (dropping zeros), which is what
  * bounds the undercount: each decrement destroys m+1 occurrences
  * (the arriving one included), so any item's deficit is at most
  * N/(m+1). Merge (Agarwal et al.'12, "Mergeable Summaries"): add
  * counters pointwise, then subtract the (m+1)-th largest count from
  * all and drop the non-positive — the same εN = N/(m+1) bound holds
  * over the COMBINED stream, which is exactly what makes the summary a
  * valid map-side-combined Spark aggregate. */
final class MgBuffer(val m: Int) {
  val counts = scala.collection.mutable.HashMap.empty[String, Long]

  def add(item: String): Unit = counts.get(item) match {
    case Some(c) => counts.update(item, c + 1L)
    case None if counts.size < m => counts.update(item, 1L)
    case None =>
      // decrement-all: O(m) here, amortized O(1) — every decrement
      // cancels one earlier increment
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      counts.mapValuesInPlace { (_, v) => v - 1L }
      counts.foreach { case (k, v) => if (v <= 0L) dead += k }
      dead.foreach(counts.remove)
  }

  def mergeFrom(o: MgBuffer): Unit = {
    o.counts.foreach { case (k, v) =>
      counts.update(k, counts.getOrElse(k, 0L) + v)
    }
    if (counts.size > m) {
      val arr = counts.values.toArray
      java.util.Arrays.sort(arr)
      val cut = arr(arr.length - (m + 1)) // the (m+1)-th largest count
      val keep = counts.iterator
        .collect { case (k, v) if v > cut => (k, v - cut) }.toArray
      counts.clear()
      keep.foreach { case (k, v) => counts.update(k, v) }
    }
  }
}

private[functions] object MgCodec {
  def serialize(b: MgBuffer): Array[Byte] = {
    val entries = b.counts.toArray
      .map { case (k, v) => (UTF8String.fromString(k).getBytes, v) }
    val size = 8 + entries.map(e => 4 + e._1.length + 8).sum
    val buf = java.nio.ByteBuffer.allocate(size)
    buf.putInt(b.m).putInt(entries.length)
    entries.foreach { case (bytes, v) =>
      buf.putInt(bytes.length).put(bytes).putLong(v)
    }
    buf.array()
  }

  def deserialize(bytes: Array[Byte]): MgBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val b = new MgBuffer(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) {
      val len = buf.getInt()
      val arr = new Array[Byte](len)
      buf.get(arr)
      b.counts.update(UTF8String.fromBytes(arr).toString, buf.getLong())
      i += 1
    }
    b
  }

  /** Deterministic output array: (est desc, item asc) rows. */
  def evalRows(b: MgBuffer): GenericArrayData = {
    val rows: Array[Any] = b.counts.toArray
      .sortBy { case (k, v) => (-v, k) }
      .map { case (k, v) =>
        InternalRow(UTF8String.fromString(k), v): Any
      }
    new GenericArrayData(rows)
  }
}

/** `mg_summary(item, m)` — Misra–Gries heavy-hitter candidates as a
  * Spark aggregate. State is O(m) per group however many rows stream
  * through, and the shuffle carries ≤ m (string, count) pairs per
  * (partition, group) instead of the full item vocabulary — the
  * frequent-items analog of [[KmvMinHashes]]' wire contract.
  *
  * GUARANTEE (the only one the summary makes): every item whose true
  * frequency exceeds N/(m+1) is present in the output; estimated counts
  * are true counts minus at most N/(m+1). The candidate SET — not the
  * estimates, and not the set beyond the guarantee — is merge-order
  * dependent, so pipelines needing deterministic output must finish
  * with an exact count of the candidates
  * ([[graft.operators.HeavyHitters.frequentItems]] — output provably
  * independent of partitioning). Returns array<struct<item, est>>
  * sorted (est desc, item asc). */
case class MisraGriesSummary(child: Expression, m: Int,
                             override val mutableAggBufferOffset: Int = 0,
                             override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {
  require(m >= 1 && m <= (1 << 20), s"m must be in [1, 2^20], got $m")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(m)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    // copy out of the (possibly reused) row buffer before keying a map
    if (v != null) b.add(v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: MgBuffer): Any = MgCodec.evalRows(b)

  override def serialize(b: MgBuffer): Array[Byte] = MgCodec.serialize(b)
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesSummary =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesSummary =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "mg_summary"
}

/** `mg_merge(summary, m)` — fold PRE-BUILT Misra–Gries summaries (the
  * array<struct<item, est>> shape [[MisraGriesSummary]] emits) into one:
  * each input array reconstitutes as a buffer and merges by the
  * Agarwal'12 rule, so the combined deficit bound is Σ N_i/(m+1) =
  * N/(m+1) over everything the inputs ever saw — slices summarized
  * independently (different jobs, different days) compose exactly as if
  * one pass had seen the union. This is the LOAD path of the persisted
  * summary store ([[graft.operators.Sketches]] mg family). */
case class MisraGriesMerge(child: Expression, m: Int,
                           override val mutableAggBufferOffset: Int = 0,
                           override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[MgBuffer] {
  require(m >= 1 && m <= (1 << 20), s"m must be in [1, 2^20], got $m")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): MgBuffer = new MgBuffer(m)

  override def update(b: MgBuffer, input: InternalRow): MgBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val tmp = new MgBuffer(m)
      var i = 0
      while (i < arr.numElements()) {
        val row = arr.getStruct(i, 2)
        tmp.counts.update(row.getUTF8String(0).toString, row.getLong(1))
        i += 1
      }
      b.mergeFrom(tmp)
    }
    b
  }

  override def merge(b: MgBuffer, o: MgBuffer): MgBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: MgBuffer): Any = MgCodec.evalRows(b)

  override def serialize(b: MgBuffer): Array[Byte] = MgCodec.serialize(b)
  override def deserialize(bytes: Array[Byte]): MgBuffer =
    MgCodec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(o: Int): MisraGriesMerge =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesMerge =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "mg_merge"
}

object MisraGries {

  /** Misra–Gries candidate summary Column over a string item column. */
  def mgSummary(item: Column, m: Int): Column =
    ColumnBridge.column(
      MisraGriesSummary(ColumnBridge.expression(item.cast("string")), m)
        .toAggregateExpression())

  /** Fold pre-built summaries (array<struct<item, est>>) into one. */
  def mgMerge(summary: Column, m: Int): Column =
    ColumnBridge.column(
      MisraGriesMerge(ColumnBridge.expression(summary), m)
        .toAggregateExpression())
}
