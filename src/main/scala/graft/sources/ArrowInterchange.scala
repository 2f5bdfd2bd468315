package graft.sources

import java.io.File
import java.nio.channels.FileChannel
import java.nio.file.{Files, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowFileReader, ArrowFileWriter}
import org.apache.arrow.vector.types.FloatingPointPrecision
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Arrow IPC interchange — the Spark-native analog of the reference's Arrow
  * C-Data export with POSIX shared memory (`export_to_arrow`,
  * `/root/reference/src/arrow_utils.cpp:37-94`; entry point `query_arrow`,
  * `src/warpdb.cpp:500-506`). Cross-process sharing in a distributed engine
  * means files on shared storage: each task writes one Arrow IPC file per
  * partition (no driver collect — O(1) driver memory at any scale), and any
  * Arrow-capable consumer (pyarrow, DuckDB, another Spark job) maps them.
  *
  * Types cover the engine's result surface (the reference exports exactly
  * ONE float32 column — `src/arrow_utils.cpp:73` declares format "f"); we
  * support the primitive palette results actually use.
  */
object ArrowInterchange {

  private def toArrowField(f: StructField): Field = {
    val t = f.dataType match {
      case LongType    => new ArrowType.Int(64, true)
      case IntegerType => new ArrowType.Int(32, true)
      case DoubleType  => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
      case FloatType   => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
      case StringType  => new ArrowType.Utf8()
      case BooleanType => new ArrowType.Bool()
      case other => throw new IllegalArgumentException(
        s"Arrow export: unsupported type $other for column ${f.name}")
    }
    new Field(f.name, FieldType.nullable(t), null)
  }

  /** Write one Arrow IPC file per partition into `dir`, replacing any
    * previous contents (Spark overwrite semantics). Returns row count.
    *
    * The overwrite is staged: tasks write into a hidden `_staging-*` subdir
    * of `dir` (shared storage in a cluster), and only after the job succeeds
    * does the driver move the staged parts into place (replacing same-named
    * old parts) and then delete stale extras a prior wider run left behind —
    * so readArrow never globs them back in. A failed job leaves the prior
    * export intact, and a failure mid-swap leaves a directory where every
    * part is either a new file or a complete old one (the swap is not one
    * atomic rename, but no destructive step precedes the data it replaces).
    */
  def writeArrow(df: DataFrame, dir: String, batchSize: Int = 4096): Long = {
    val schema = df.schema
    Files.createDirectories(Paths.get(dir))
    val stagingName = s"_staging-${java.util.UUID.randomUUID().toString.take(8)}"
    val staging = Paths.get(dir, stagingName)
    Files.createDirectories(staging)
    val counts = df.rdd.mapPartitionsWithIndex { (pid, rows) =>
      val arrowSchema = new ArrowSchema(schema.fields.map(toArrowField).toSeq.asJava)
      val allocator = new RootAllocator(Long.MaxValue)
      val root = VectorSchemaRoot.create(arrowSchema, allocator)
      val ch = FileChannel.open(Paths.get(dir, stagingName, f"part-$pid%05d.arrow"),
        StandardOpenOption.CREATE, StandardOpenOption.WRITE,
        StandardOpenOption.TRUNCATE_EXISTING)
      val writer = new ArrowFileWriter(root, null, ch)
      var total = 0L
      try {
        writer.start()
        rows.grouped(batchSize).foreach { batch =>
          root.allocateNew()
          batch.zipWithIndex.foreach { case (row, i) =>
            schema.fields.zipWithIndex.foreach { case (f, c) =>
              val v = root.getVector(c)
              if (row.isNullAt(c)) v.asInstanceOf[FieldVector].setNull(i)
              else f.dataType match {
                case LongType    => v.asInstanceOf[BigIntVector].setSafe(i, row.getLong(c))
                case IntegerType => v.asInstanceOf[IntVector].setSafe(i, row.getInt(c))
                case DoubleType  => v.asInstanceOf[Float8Vector].setSafe(i, row.getDouble(c))
                case FloatType   => v.asInstanceOf[Float4Vector].setSafe(i, row.getFloat(c))
                case StringType  => v.asInstanceOf[VarCharVector]
                  .setSafe(i, row.getString(c).getBytes("UTF-8"))
                case BooleanType => v.asInstanceOf[BitVector]
                  .setSafe(i, if (row.getBoolean(c)) 1 else 0)
                case _ => ()
              }
            }
          }
          root.setRowCount(batch.size)
          writer.writeBatch()
          total += batch.size
        }
        writer.end()
      } finally {
        writer.close(); ch.close(); root.close(); allocator.close()
      }
      Iterator.single(total)
    }.collect().sum
    // Job succeeded — swap staged files into place. Order matters for crash
    // safety: move the new parts in FIRST (replacing same-named old parts),
    // THEN remove only the stale extras a prior wider run left behind — a
    // mid-swap failure leaves a directory that is still fully readable
    // (every part is either the new file or a complete old one). Cleanup of
    // the staging dir is best-effort and swallowed, so it can never mask
    // the real failure.
    try {
      val stagedNames = Option(staging.toFile.listFiles())
        .getOrElse(Array.empty[File]).map { f =>
          Files.move(f.toPath, Paths.get(dir, f.getName),
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          f.getName
        }.toSet
      Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
        .filter(f => f.isFile && f.getName.endsWith(".arrow") &&
          !stagedNames.contains(f.getName))
        .foreach(f => Files.delete(f.toPath))
    } finally {
      try {
        Option(staging.toFile.listFiles()).getOrElse(Array.empty[File])
          .foreach(f => Files.deleteIfExists(f.toPath))
        Files.deleteIfExists(staging)
      } catch { case _: java.io.IOException => () } // never mask the cause
    }
    counts
  }

  /** Read a directory of Arrow IPC files back as a DataFrame (one input file
    * per task — the scan parallelizes across files, like any file source).
    *
    * Batches are streamed LAZILY: each task holds exactly one Arrow record
    * batch in memory and advances `loadNextBatch()` only when the consuming
    * iterator drains it — peak task memory is one batch, so a multi-GB part
    * file cannot OOM the executor. Resources close when the file is
    * exhausted, and a task-completion listener covers early termination
    * (e.g. a LIMIT killing the task mid-file).
    */
  def readArrow(spark: SparkSession, dir: String, schema: StructType): DataFrame = {
    val files = Option(new File(dir).listFiles())
      .getOrElse(throw new IllegalArgumentException(s"No such directory: $dir"))
      .filter(f => f.isFile && f.getName.endsWith(".arrow"))
      .map(_.getAbsolutePath).sorted
    val rdd = spark.sparkContext.parallelize(files.toSeq, math.max(files.length, 1))
      .flatMap { path =>
        new Iterator[Row] {
          private val allocator = new RootAllocator(Long.MaxValue)
          private val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
          private val reader = new ArrowFileReader(ch, allocator)
          private val root = reader.getVectorSchemaRoot
          private var rowIdx = 0
          private var rowCount = 0
          private var closed = false

          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => close()))

          private def close(): Unit = if (!closed) {
            closed = true
            reader.close(); ch.close(); allocator.close()
          }

          override def hasNext: Boolean = {
            while (!closed && rowIdx >= rowCount) {
              if (reader.loadNextBatch()) { rowCount = root.getRowCount; rowIdx = 0 }
              else close()
            }
            !closed
          }

          override def next(): Row = {
            if (!hasNext) throw new NoSuchElementException
            val i = rowIdx
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
                case _           => null
              }
            }
            rowIdx += 1
            Row(vals: _*)
          }
        }
      }
    spark.createDataFrame(rdd, schema)
  }
}
