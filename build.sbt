ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "big_data_programmingspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
// Warn on deprecated API use — the whole build is deprecation-clean
// (round 13 fixed the last stragglers)
ThisBuild / scalacOptions += "-deprecation"
Test / fork := true
run / fork := true
// Forked run output goes straight to stdout WITHOUT sbt's "[info] "
// line decoration — the bench driver tails stdout for a bare JSON
// line, and the logger prefix broke its parse in rounds 1-2.
run / outputStrategy := Some(StdoutOutput)
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
  // 24g default: the 339-query bench/iso fleet accumulates memoized
  // frames and per-round localCheckpoint blocks in one JVM — at 8g the
  // tail of the run GC-thrashes (measured 5-10x inflation on warm
  // queries); the harness host has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
