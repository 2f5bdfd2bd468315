package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video as opaque `binary` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators.
  *
  * The Spark-side shape is real and tested — binary payload column, metadata
  * struct, batched per-partition processing, explode-based frame sampling —
  * while the actual media decode is a STUB (this container has no image/
  * audio codecs): `fakeDecode` derives deterministic pseudo-metadata from the
  * byte content. Swapping in a real decoder changes ONE function, not the
  * pipeline.
  *
  * Scale design: payloads stay distributed end-to-end (no collect); decode
  * runs per-partition in batches of `batchSize` (the mapInPandas/mapInArrow
  * batch shape — bounded memory per task regardless of corpus size); derived
  * metadata is columnar so downstream filters/aggregations prune the binary
  * column away at the parquet scan.
  */
object Multimodal {

  /** Attach a binary payload + metadata struct to a text corpus (test-data
    * surrogate for real image/audio bytes). */
  def attachPayload(docs: DataFrame, textCol: String, mime: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8").cast(BinaryType))
      .withColumn("meta", struct(
        length(col("payload")).as("n_bytes"),
        lit(mime).as("mime")))

  /** The decode seam as an interface: a real deployment implements this
    * with an actual codec (ImageIO/ffmpeg/...) and passes it to
    * [[decodeFeatures]]/[[decodeFeaturesArrow]] — the pipeline (schema,
    * batching, Arrow plumbing) does not change. Must be Serializable: it
    * ships to executors. */
  trait PayloadDecoder extends Serializable {
    /** payload bytes → (width, height, nFrames) */
    def decode(bytes: Array[Byte]): (Int, Int, Int)
  }

  /** Default stub decoder (this container has no codecs). */
  object FakeDecoder extends PayloadDecoder {
    def decode(bytes: Array[Byte]): (Int, Int, Int) = fakeDecode(bytes)
  }

  /** Deterministic stand-in for a real decoder: width/height/duration are
    * pure functions of the payload bytes. Replace with a codec call in a
    * real deployment (`???` marks the seam). */
  def fakeDecode(bytes: Array[Byte]): (Int, Int, Int) = {
    // val img = ImageIO.read(new ByteArrayInputStream(bytes))  // real seam: ???
    val n = bytes.length
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < math.min(n, 64)) { h ^= bytes(i); h *= 0x100000001b3L; i += 1 }
    val width = 16 + (n % 64)
    val height = 16 + (math.abs(h) % 48).toInt
    val nFrames = 1 + (n / 32)
    (width, height, nFrames)
  }

  private val decodedSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Batched per-partition decode: the Scala analog of a Pandas-UDF
    * `mapInPandas` — rows are processed in bounded batches so a real decoder
    * could amortize model/codec setup per batch, and peak memory per task is
    * `batchSize` payloads, not the partition. */
  def decodeFeatures(withPayload: DataFrame, idCol: String,
                     batchSize: Int = 64,
                     decoder: PayloadDecoder = FakeDecoder): DataFrame = {
    val spark = withPayload.sparkSession
    val input = spread(withPayload.select(col(idCol).cast("long"), col("payload")))
    val rows = input.rdd.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // per-batch setup would go here (codec init, model load)
        batch.iterator.map { row =>
          val id = row.getLong(0)
          val bytes = row.getAs[Array[Byte]](1)
          val (w, h, f) = decoder.decode(bytes)
          Row(id, w, h, f)
        }
      }
    }
    spark.createDataFrame(rows, decodedSchema)
      .withColumnRenamed("doc_id", idCol)
  }

  /** Arrow-native batched decode: same bounded-batch shape as
    * [[decodeFeatures]], but the decoder consumes Arrow column buffers via
    * [[graft.sources.ArrowHandoff]] — Spark serializes each partition with
    * its internal ArrowWriter (rows never box into JVM objects on the way
    * out) and ids/payloads are read straight off the vectors. One record
    * batch = one decode batch (`spark.sql.execution.arrow.
    * maxRecordsPerBatch`), where a real codec/model setup would amortize.
    * This is the mapInArrow shape realized in Scala; prefer it over
    * [[decodeFeatures]] when the decoder is the bottleneck and Row
    * serialization overhead matters. */
  def decodeFeaturesArrow(withPayload: DataFrame, idCol: String,
                          decoder: PayloadDecoder = FakeDecoder): DataFrame = {
    import org.apache.arrow.vector.{BigIntVector, VarBinaryVector}
    val spark = withPayload.sparkSession
    val input = spread(
      withPayload.select(col(idCol).cast("long").as("doc_id"), col("payload")))
    val rows = graft.sources.ArrowHandoff.handoff(input) { root =>
      // per-batch setup would go here (codec init, model load)
      val ids = root.getVector(0).asInstanceOf[BigIntVector]
      val payloads = root.getVector(1).asInstanceOf[VarBinaryVector]
      (0 until root.getRowCount).iterator.map { i =>
        val (w, h, f) = decoder.decode(payloads.get(i))
        Row(ids.get(i), w, h, f)
      }
    }
    spark.createDataFrame(rows, decodedSchema)
      .withColumnRenamed("doc_id", idCol)
  }

  /** Columnar variant of the decode for metadata that IS expressible as
    * native expressions (here: everything, since the stub is arithmetic on
    * byte length) — stays inside whole-stage codegen, used by the oracle-
    * checked query. */
  def decodeFeaturesColumnar(withPayload: DataFrame, idCol: String): DataFrame =
    withPayload.select(col(idCol),
      (lit(16) + length(col("payload")) % 64).cast("int").as("width"),
      (lit(1) + floor(length(col("payload")) / 32)).cast("int").as("n_frames"))

  /** Frame sampling: one row per kept frame index (every `stride`-th of
    * `n_frames`) — stride-native `sequence` + `explode`, no UDF; only kept
    * frames are ever generated (no post-explode filter), and at scale the
    * explode multiplies rows *within* partitions, no shuffle. */
  def sampleFrames(decoded: DataFrame, idCol: String, stride: Int): DataFrame =
    decoded.select(col(idCol), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))

  /** "Resize" stub over the payload: truncate bytes to `maxBytes` and record
    * old/new sizes — the plumbing shape of a thumbnailing pass (binary in,
    * binary out, metadata delta). */
  def resizePayload(withPayload: DataFrame, idCol: String, maxBytes: Int): DataFrame =
    withPayload.select(col(idCol),
      length(col("payload")).as("orig_bytes"),
      substring(col("payload"), 1, maxBytes).as("payload"))
      .withColumn("new_bytes", length(col("payload")))
}
