ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "wmsdatapipelinespark"
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
// The driver parses Bench/Verify stdout (BENCH_r*.json captures a tail and
// takes the LAST line as JSON). Two sbt behaviors corrupt that: the default
// LoggedOutput strategy prefixes every forked-process line with `[info] `,
// and sbt appends its own `[success] Total time: …` epilogue AFTER the
// program's final JSON line. StdoutOutput passes program stdout through
// verbatim; showSuccess drops the epilogue.
Compile / run / outputStrategy := Some(StdoutOutput)
Compile / runMain / outputStrategy := Some(StdoutOutput)
outputStrategy := Some(StdoutOutput)
showSuccess := false
Global / excludeLintKeys ++= Set(outputStrategy, showSuccess)
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
  // timestamp literals must parse as UTC wall-clock, matching the DuckDB
  // oracle's naive TIMESTAMP literals, regardless of the host timezone
  "-Duser.timezone=UTC",
  // local[32] with checkpointed intermediates needs headroom; the box has
  // 128 GiB and the driver is the only executor in local mode
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // fixed, pre-touched heap: G1 otherwise starts at a small committed heap
  // and expands + zeroes tens of GB DURING the first heavy stage — measured
  // as 36–51 s first q82 samples at sf1 (two 15.9 s AQE stages that later
  // run in 2–4 s), restored to 18.9–20.6 s by pre-touch (BASELINE.md
  // §Round 12). The zeroing moves to JVM startup, which no timed section
  // includes.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
)
