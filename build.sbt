ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "xmltoparquetspark"
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
// The bench/verify driver captures combined sbt output and json-parses the
// final ~2000-char tail. Two pieces of sbt framing have broken that parse
// for three rounds (BENCH_r0{1,2,3}.json "parsed": null):
//  1. LoggedOutput prefixes every forked-process line with "[info] ", and
//  2. sbt appends a "[success] Total time: ..." trailer after the run.
// StdoutOutput inherits the parent stdout (no prefix) and showSuccess=false
// drops the trailer, so Bench's compact JSON really is the last line.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 290 generated query classes in one JVM pressure the C2 code cache
  // (default 240m); measured ABAB at r12: the profiled contention
  // victims (q_bradley_terry, q_calibration) improve 21-36% with 512m
  // while the full-surface total is unchanged — see SCALE.md round 12.
  "-XX:ReservedCodeCacheSize=512m",
)
