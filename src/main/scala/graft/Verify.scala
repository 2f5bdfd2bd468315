package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // optional 3rd arg: comma-separated gate names, for single-gate
    // iteration (the driver always calls with 2 args = all gates)
    val (sfDir, outDir, only) = args match {
      case Array(s, o)    => (s, o, Option.empty[Set[String]])
      case Array(s, o, f) => (s, o, Some(f.split(",").toSet))
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // events.parquet carries TIMESTAMP(NANOS) which Spark rejects by
      // default; read as long nanos (converted in graft.streaming).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    val gates = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    gates.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      finally graft.operators.CacheScope.global.release()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // Coverage tripwire, part 1: the full defined-gate list, so the oracle
    // compare can fail loudly when a gate produced no output instead of
    // silently checking fewer gates (r6 shipped 111/118 with zero alarms).
    // Only written on FULL runs — a filtered run must not masquerade as
    // full coverage.
    val allGates = gates.keys.toSeq.sorted
    if (only.isEmpty)
      Files.writeString(Paths.get(s"$outDir/queries.json"),
        allGates.map(q).mkString("[", ",", "]"))
    spark.stop()
    // Coverage tripwire, part 2: a failed gate fails the RUN, not just a
    // stderr line someone has to notice.
    if (failed.nonEmpty) {
      System.err.println(
        s"[verify] ${failed.size}/${allGates.size} gates FAILED: " +
          failed.sorted.mkString(", "))
      sys.exit(1)
    }
    println(s"[verify] all ${allGates.size} gates dumped OK")
  }
}
