package graft.sources

import java.io.ByteArrayInputStream
import java.nio.channels.Channels

import scala.reflect.ClassTag

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.ReadChannel
import org.apache.arrow.vector.ipc.message.{ArrowRecordBatch, MessageSerializer}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.graft.ArrowBridge
import org.apache.spark.sql.types._

/** Same-host zero-copy Arrow handoff — the distributed analog of the
  * reference's in-process capsule export (`export_to_arrow`,
  * `/root/reference/src/arrow_utils.cpp:37-94`: result buffers are exposed
  * to the consumer as ArrowArray/ArrowSchema structs over POSIX shm — moved,
  * never copied through the host app).
  *
  * In a distributed engine "the consumer shares the address space" means the
  * consumer runs INSIDE the task: [[handoff]] serializes each partition with
  * Spark's own internal Arrow writer (operating directly on `InternalRow`s —
  * rows never box into JVM objects on the way out) and invokes the consumer
  * on a `VectorSchemaRoot` whose buffers ARE the deserialized Arrow buffers
  * (`VectorLoader` wraps `ArrowBuf` slices; it does not copy — the move
  * semantics are pinned by the TransferPair test in PipelineSpec). Contrast
  * with [[ArrowInterchange]], which targets cross-process consumers via IPC
  * files on shared storage.
  *
  * Scale: no driver participation at all — batches flow task-local from
  * Spark's serializer to the consumer, so the pattern holds unchanged on a
  * 1000-executor cluster.
  */
object ArrowHandoff {

  /** Run an Arrow-native consumer against each partition's record batches in
    * the task JVM. `consume` is called once per batch with a loaded root;
    * its results are materialized eagerly (the root's buffers are recycled
    * for the next batch, so a lazy iterator over them would read torn data —
    * output is bounded by one batch's worth per call).
    */
  def handoff[T: ClassTag](df: DataFrame)
                          (consume: VectorSchemaRoot => Iterator[T]): RDD[T] = {
    val schemaJson = df.schema.json
    val tz = df.sparkSession.conf.get("spark.sql.session.timeZone", "UTC")
    ArrowBridge.toBatchRdd(df).mapPartitions { batches =>
      if (batches.isEmpty) Iterator.empty
      else {
        val schema = DataType.fromJson(schemaJson).asInstanceOf[StructType]
        val allocator = new RootAllocator(Long.MaxValue)
        val root = VectorSchemaRoot.create(
          ArrowBridge.toArrowSchema(schema, tz), allocator)
        val loader = new VectorLoader(root)
        var closed = false
        def close(): Unit = if (!closed) { closed = true; root.close(); allocator.close() }
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => close()))
        new Iterator[Iterator[T]] {
          override def hasNext: Boolean = { val h = batches.hasNext; if (!h) close(); h }
          override def next(): Iterator[T] = {
            val bytes = batches.next()
            val batch: ArrowRecordBatch = MessageSerializer.deserializeRecordBatch(
              new ReadChannel(Channels.newChannel(new ByteArrayInputStream(bytes))),
              allocator)
            try loader.load(batch) finally batch.close()
            consume(root).toVector.iterator
          }
        }.flatten
      }
    }
  }

  /** Full capsule round-trip: DataFrame → Spark-internal Arrow batches →
    * rows read back off the Arrow buffers → DataFrame. Exercised by the
    * `src_arrow_handoff` gate query and PipelineSpec. */
  def roundTrip(spark: SparkSession, df: DataFrame): DataFrame = {
    val schema = df.schema
    val rows = handoff(df) { root =>
      (0 until root.getRowCount).iterator.map(i => rowAt(root, schema, i))
    }
    spark.createDataFrame(rows, schema)
  }

  /** Read row `i` of a loaded root into a Spark Row (primitive result
    * palette, as ArrowInterchange). */
  private def rowAt(root: VectorSchemaRoot, schema: StructType, i: Int): Row = {
    val vals = schema.fields.indices.map { c =>
      val v = root.getVector(c)
      if (v.isNull(i)) null
      else schema.fields(c).dataType match {
        case LongType    => v.asInstanceOf[BigIntVector].get(i)
        case IntegerType => v.asInstanceOf[IntVector].get(i)
        case DoubleType  => v.asInstanceOf[Float8Vector].get(i)
        case FloatType   => v.asInstanceOf[Float4Vector].get(i)
        case StringType  => new String(v.asInstanceOf[VarCharVector].get(i), "UTF-8")
        case BooleanType => v.asInstanceOf[BitVector].get(i) == 1
        case other => throw new IllegalArgumentException(
          s"Arrow handoff: unsupported type $other")
      }
    }
    Row(vals: _*)
  }
}
