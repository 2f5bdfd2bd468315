package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-query profiling main (not part of the driver contract).
  *
  * Runs each named gate once against the noop sink (the Bench timing
  * methodology) and prints wall-clock plus the distributed-shape numbers
  * the optimization guide says to look at FIRST: job count, stage count,
  * shuffle bytes read/written, peak single-stage shuffle. A second
  * `rep2` run of the same gate separates one-time costs (index builds
  * via sessionIndexDir, codegen) from steady-state serving cost.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *   sbt "runMain graft.Profile d17_best_of_cluster t22_decontaminate_serve"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shufWrite = new AtomicLong(0)
    val shufRead = new AtomicLong(0)
    val stages = new AtomicLong(0)
    val jobs = new AtomicLong(0)
    val maxStageShuffle = new AtomicLong(0)
    val detail = sys.env.get("SPARK_GRAFT_PROFILE_DETAIL").contains("1")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null) {
          stages.incrementAndGet()
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          maxStageShuffle.getAndUpdate(v =>
            math.max(v, m.shuffleReadMetrics.totalBytesRead))
          if (detail) {
            val i = sc.stageInfo
            println(f"[stage] id=${i.stageId}%4d tasks=${i.numTasks}%3d " +
              f"run=${m.executorRunTime / 1000.0}%7.1fs " +
              f"cpu=${m.executorCpuTime / 1e9}%7.1fs " +
              f"shufR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1fMB " +
              f"shufW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1fMB  " +
              i.name.takeWhile(_ != '\n').take(100))
          }
        }
      }
    })

    val names = if (args.nonEmpty) args.toSeq else Bench.headline
    names.foreach { name =>
      (1 to reps).foreach { rep =>
        // settle async listener events from the previous run
        Thread.sleep(300)
        val (w0, r0, s0, j0) =
          (shufWrite.get(), shufRead.get(), stages.get(), jobs.get())
        val t0 = System.nanoTime()
        try {
          spark.sparkContext.setJobDescription(s"$name rep$rep")
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          graft.operators.CacheScope.global.release(blocking = true)
          Thread.sleep(300)
          println(f"[profile] $name rep$rep: $sec%.2f s  " +
            f"jobs=${jobs.get() - j0} stages=${stages.get() - s0}  " +
            f"shufW=${(shufWrite.get() - w0) / 1e6}%.1f MB " +
            f"shufR=${(shufRead.get() - r0) / 1e6}%.1f MB")
        } catch { case e: Throwable =>
          println(s"[profile] $name rep$rep FAILED: ${e.getMessage}")
          graft.operators.CacheScope.global.release(blocking = true)
        }
      }
    }
    spark.stop()
  }
}
