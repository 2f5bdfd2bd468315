package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
import org.scalatest.funsuite.AnyFunSuite

/** Pins `Tables.tsNanos` / `Tables.tsTimestamp` under BOTH physical
  * encodings the driver has generated for `events.ts` — ns-longs (the
  * nanosAsLong reading of TIMESTAMP(NANOS)) and µs TIMESTAMP_NTZ — so the
  * next testdata regeneration can't silently break ts arithmetic again.
  */
class TsNormalizerSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  import spark.implicits._

  // three instants, µs-aligned (both encodings can represent them exactly)
  private val micros = Seq(0L, 1735689600000000L, 1735689600123456L)

  private def nsLongDf = micros.map(_ * 1000L).toDF("ts") // epoch-nanos long
  private def ntzDf = micros.toDF("us")
    .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))

  test("tsNanos agrees across ns-long and µs-ntz encodings") {
    assert(nsLongDf.schema("ts").dataType == LongType)
    assert(ntzDf.schema("ts").dataType == TimestampNTZType)
    val fromLong = nsLongDf.select(Tables.tsNanos(nsLongDf).as("n"))
      .as[Long].collect().toSeq.sorted
    val fromNtz = ntzDf.select(Tables.tsNanos(ntzDf).as("n"))
      .as[Long].collect().toSeq.sorted
    assert(fromLong == micros.map(_ * 1000L).sorted)
    assert(fromNtz == fromLong)
  }

  test("tsTimestamp agrees across encodings and is µs TIMESTAMP") {
    val a = nsLongDf.select(Tables.tsTimestamp(nsLongDf).as("t"))
    val b = ntzDf.select(Tables.tsTimestamp(ntzDf).as("t"))
    assert(a.schema("t").dataType == TimestampType)
    assert(b.schema("t").dataType == TimestampType)
    val ua = a.select(unix_micros(col("t"))).as[Long].collect().toSeq.sorted
    val ub = b.select(unix_micros(col("t"))).as[Long].collect().toSeq.sorted
    assert(ua == micros.sorted)
    assert(ub == ua)
  }

  test("tsTimestamp passes TimestampType through unchanged") {
    val tdf = micros.toDF("us").select(timestamp_micros(col("us")).as("ts"))
    val out = tdf.select(Tables.tsTimestamp(tdf).as("t"), col("ts"))
      .filter(col("t") =!= col("ts"))
    assert(out.count() == 0)
  }

  test("joinWithin fails fast on a timestamp-typed ts") {
    val l = ntzDf.withColumn("k", lit(1L)).withColumn("ev", lit("e"))
    val r = ntzDf.withColumn("k", lit(1L)).withColumn("v", lit(1.0))
    val e = intercept[IllegalArgumentException] {
      operators.AsOf.joinWithin(l, r, Seq("k"), "ts", Seq("v"), maxAge = 1L)
    }
    assert(e.getMessage.contains("normalize ts first"))
  }
}
