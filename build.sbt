ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lottery_end_to_end_etl_data_pipelinespark"
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
// Forward the forked JVM's stdout/stderr verbatim instead of routing them
// through sbt's logger: the logger's "[info] " prefix corrupts Bench's
// one-line JSON contract (the driver parses stdout for a bare `{...}`
// line — every prior round's BENCH_r*.json shows `"parsed": null`).
run / outputStrategy := Some(StdoutOutput)
// ...and the OTHER half of that contract: sbt prints "[success] Total
// time: ..." AFTER the forked JVM exits, so the JSON was never the final
// stdout line and every round's BENCH_r*.json shows "parsed": null.
// Suppressing the success banner makes Bench's JSON the last line.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the bench runs ~170 jobs in one JVM; an 8g heap let GC
  // from the allocation-heavy shingle joins bleed into later timings
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
