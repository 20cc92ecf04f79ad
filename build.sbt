ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "transcript_analysisspark"
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
// Pass the forked run's stdout through VERBATIM instead of through
// sbt's logger (which prefixes every line with "[info] "): the bench
// driver parses graft.Bench's final stdout line as JSON, and a
// decorated line does not parse.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 24g default (was 8g): the host has 128 GiB, and the 186-query
  // bench suite holds per-corpus fixture lakes and broadcast state
  // across all passes — at 8g its old gen filled until mixed
  // collections landed 1-2 s pauses inside the long lifecycle rows
  // (BENCH_r15 recorded 53.9 s GC over the driver run; q173-q175
  // each carried 2.5-3.9 s). Isolated A/B at 8g vs 32g showed flat
  // medians for one query either way (ProbeR16) — the extra heap
  // buys suite-scale headroom, not single-query speed.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
