ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "warpdbspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
// Heap default stays 8g: round-16 MEASURED the VERDICT-item-2 hypothesis
// (GC pressure from 32 tasks in one default-heap JVM) and a bigger heap
// made it WORSE, not better — the suspect query cluster at local[32],
// sf0.1, quiet box: 16.9 s at -Xmx8g (G1 GC total 1.8 s) vs 21.2 s at
// -Xmx32g (G1 GC total 5.4 s — larger young gen, longer pauses stalling
// all 32 task threads); -XX:+UseParallelGC at 8g was a wash (16.4 s).
// The real fixes were allocation-side (TextKernels, ImageIO cache).
// SPARK_GRAFT_JAVA_OPTS passes extra measurement flags (e.g. -Xlog:gc)
// through to the forked run/test JVMs without editing this file.
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("SPARK_GRAFT_JAVA_OPTS")
  .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
