package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** K-minimum-values buffer: the `k` smallest DISTINCT hash values seen so
  * far, kept as a sorted array. Insert is a binary search + shift (k is
  * small — the sketch's whole point); duplicates are dropped, which is
  * what makes the sketch estimate DISTINCT counts. */
final class KmvBuffer(val k: Int) {
  val values = new Array[Long](k)
  var n = 0

  def insert(h: Long): Unit = {
    if (n == k && h >= values(n - 1)) return
    var lo = 0; var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (values(mid) < h) lo = mid + 1 else hi = mid
    }
    if (lo < n && values(lo) == h) return // duplicate
    val last = if (n < k) n else k - 1
    var i = last
    while (i > lo) { values(i) = values(i - 1); i -= 1 }
    values(lo) = h
    if (n < k) n += 1
  }

  def mergeFrom(o: KmvBuffer): Unit = {
    var i = 0
    while (i < o.n) { insert(o.values(i)); i += 1 }
  }
}

/** K-minimum-values (KMV) distinct-count sketch (Bar-Yossef et al.'02;
  * the "bottom-k" estimator) — the engine's REPRODUCIBLE stand-in for
  * HyperLogLog: `approx_count_distinct` is neither cross-engine nor
  * cross-version stable, so it can never be oracle-checked; KMV over a
  * deterministic portable hash is exact-by-construction on BOTH engines
  * (the estimate is one multiply + one divide off the k-th smallest
  * hash), while keeping the properties that matter at 100 TB:
  *
  *   - O(k) state per group however many rows stream through it;
  *   - map-side combined: the shuffle carries ≤ k longs per
  *     (partition, group), never the (group, term) pairs an exact
  *     distinct shuffles (the sketch IS mergeable — union = merge);
  *   - one scan pass, no distinct stage anywhere.
  *
  * Estimator: with hashes uniform on [0, 2⁶⁰) and v_k the k-th smallest
  * distinct value, distinct-count ≈ (k−1) · 2⁶⁰ / v_k; when fewer than k
  * distinct values exist the sketch holds ALL of them and the count is
  * exact. Relative error ~ 1/√(k−2) — k=1024 gives ~3%.
  *
  * Runs under `ObjectHashAggregateExec` (TypedImperativeAggregate, the
  * [[TopKByValue]] machinery); returns the sketch as `array<bigint>`
  * ascending so callers can persist it, merge it later, or feed
  * [[KmvSketch.estimate]].
  */
case class KmvMinHashes(child: Expression, k: Int,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {
  require(k >= 2 && k <= (1 << 20), s"k must be in [2, 2^20], got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(b: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = child.eval(input)
    if (h != null) b.insert(h.asInstanceOf[Long])
    b
  }

  override def merge(b: KmvBuffer, o: KmvBuffer): KmvBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: KmvBuffer): Any =
    new GenericArrayData(b.values.take(b.n))

  override def serialize(b: KmvBuffer): Array[Byte] = {
    val buf = java.nio.ByteBuffer.allocate(8 + 8 * b.n)
    buf.putInt(b.k).putInt(b.n)
    var i = 0
    while (i < b.n) { buf.putLong(b.values(i)); i += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val b = new KmvBuffer(buf.getInt())
    val n = buf.getInt()
    var i = 0
    while (i < n) { b.insert(buf.getLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvMinHashes =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvMinHashes =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "kmv_min_hashes"
}

object KmvSketch {

  /** The d3/m5 portable 60-bit hash — top 60 bits of md5, via built-ins
    * only, so any engine with md5 reproduces the exact values (the whole
    * reason the sketch is oracle-able; xxhash64 exists only in Spark). */
  def portableHash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** `kmv_min_hashes(hash, k)` aggregate Column: the k smallest distinct
    * hash values per group, ascending. */
  def kmvSketch(hash: Column, k: Int): Column =
    ColumnBridge.column(
      KmvMinHashes(ColumnBridge.expression(hash.cast("long")), k)
        .toAggregateExpression())

  /** Distinct-count estimate off a [[kmvSketch]] array: exact when the
    * sketch is under-full (it then holds every distinct value), else
    * (k−1)·2⁶⁰/v_k. `(k−1)·2⁶⁰` is one exactly-representable double
    * literal and v_k casts long→double with IEEE round-to-nearest — the
    * identical two operations in any engine, hence oracle-exact. */
  def estimate(sketch: Column, k: Int): Column =
    when(size(sketch) < k, size(sketch).cast("double"))
      .otherwise(lit((k - 1).toDouble * math.pow(2.0, 60)) /
        element_at(sketch, k).cast("double"))

  /** The k smallest values of the UNION of two sketches — itself a valid
    * KMV sketch of the merged sets (closure under union is THE property
    * that makes bottom-k composable: sketch corpus slices independently,
    * merge driver-side or in a reduce, never rescan). Pure array ops —
    * deterministic, and spelled identically in the oracle. */
  def union(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_union(a, b)), 1, k)

  /** Estimated Jaccard similarity |A∩B| / |A∪B| of the ORIGINAL sets
    * from their sketches (Bar-Yossef'02 §4 / the theta-sketch rule):
    * among the k smallest union hashes, the fraction also present in
    * BOTH sketches is an unbiased Jaccard estimate — every arithmetic
    * step is integer counting + one double division, so the oracle
    * reproduces it bit-exactly. Combine with [[estimate]] over
    * [[union]] for an |A∩B| count: J · |A∪B|. */
  def estimateJaccard(a: Column, b: Column, k: Int): Column = {
    val u = union(a, b, k)
    size(array_intersect(array_intersect(u, a), b)).cast("double") /
      size(u).cast("double")
  }
}
