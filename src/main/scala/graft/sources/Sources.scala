package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Ingestion parity with the reference's loaders (SURVEY.md §2.1).
  *
  * WarpDB semantics reproduced:
  *  - CSV: header-driven column names; positional explicit schema OR
  *    all-Float32 default (`/root/reference/src/csv_loader.cpp:49-124`:
  *    "if no schema given, every column defaults to Float32"); malformed
  *    numerics error (FAILFAST ≈ `std::stof` throw).
  *  - NDJSON: line-delimited JSON with an explicit schema
  *    (`/root/reference/src/json_loader.cpp:16-48` hardcodes
  *    {price f32, quantity i32}; here the schema is a parameter).
  *  - Parquet / ORC: native readers
  *    (`/root/reference/src/arrow_loader.cpp:100-126`).
  *  - Extension dispatch (`/root/reference/src/warpdb.cpp:159-190`).
  *
  * All readers return distributed DataFrames — file splitting, column
  * pruning and predicate pushdown come from the Spark source; the
  * reference's chunked streaming loader maps to ordinary input partitioning.
  */
object Sources {

  /** Column names from the CSV header, via Spark's own (filesystem-aware)
    * CSV reader — works for local, HDFS, or object-store paths alike; only
    * the file head is touched to produce the string schema. */
  private def headerColumns(spark: SparkSession, path: String): Array[String] =
    spark.read.option("header", "true").csv(path).columns

  /** CSV with WarpDB schema semantics: `schema = None` → every column
    * Float32 (the reference default); `Some(types)` → positional match
    * against the header, size mismatch throws. */
  def csv(spark: SparkSession, path: String,
          schema: Option[Seq[DataType]] = None): DataFrame = {
    val names = headerColumns(spark, path)
    val types = schema match {
      case Some(ts) =>
        require(ts.size == names.length,
          s"Schema size mismatch: ${ts.size} types for ${names.length} columns")
        ts
      case None => Seq.fill(names.length)(FloatType)
    }
    val st = StructType(names.zip(types).map { case (n, t) =>
      StructField(n, t, nullable = true)
    })
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST") // malformed numerics throw, like std::stof
      .schema(st)
      .csv(path)
  }

  /** Line-delimited JSON with explicit schema (no inference — the reference
    * never infers, SURVEY.md §1.3). */
  def ndjson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** XML with explicit schema (Spark 4's built-in XML source — the former
    * spark-xml package, donated upstream). `rowTag` selects the repeated
    * element that maps to one row. No inference, matching the house rule
    * for semi-structured ingest. */
  def xml(spark: SparkSession, path: String, rowTag: String,
          schema: StructType): DataFrame =
    spark.read.option("rowTag", rowTag).schema(schema)
      .format("xml").load(path)

  /** Whole-file binary ingest (`binaryFile` source): one row per file with
    * (path, modificationTime, length, content) — how a multimodal corpus
    * actually arrives (image/audio files on object storage) before
    * [[graft.operators.Multimodal]] decodes payloads. Spark parallelizes
    * over files; `pathGlobFilter` narrows the listing without reading
    * rejected files. */
  def binaryFiles(spark: SparkSession, dir: String,
                  glob: Option[String] = None): DataFrame = {
    val r = spark.read.format("binaryFile")
    glob.fold(r)(g => r.option("pathGlobFilter", g)).load(dir)
  }

  /** Extension-based dispatch (`csv json ndjson parquet orc xml`; arrow/
    * feather
    * have no built-in Spark file source — stored columnar data belongs in
    * parquet/orc; Arrow remains the in-flight interchange format). Unknown
    * extensions throw, as in the reference. */
  def open(spark: SparkSession, path: String,
           csvSchema: Option[Seq[DataType]] = None,
           jsonSchema: Option[StructType] = None,
           xmlRowTag: String = "row"): DataFrame = {
    val ext = path.substring(path.lastIndexOf('.') + 1).toLowerCase
    ext match {
      case "csv"             => csv(spark, path, csvSchema)
      case "json" | "ndjson" => ndjson(spark, path, jsonSchema.getOrElse(
        throw new IllegalArgumentException("NDJSON requires an explicit schema")))
      case "parquet"         => parquet(spark, path)
      case "orc"             => orc(spark, path)
      case "xml"             => xml(spark, path, xmlRowTag, jsonSchema.getOrElse(
        throw new IllegalArgumentException("XML requires an explicit schema")))
      case other =>
        throw new IllegalArgumentException(s"Unsupported file format: $other")
    }
  }
}
