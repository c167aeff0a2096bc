ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ai_dataingestionspark"
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
// The driver parses the LAST stdout line of `sbt runMain graft.Bench` as
// JSON. Two rounds of BENCH parsed:null came from sbt's decoration:
// forked output was logged with an `[info] ` prefix and followed by a
// `[success] Total time: ...` trailer. StdoutOutput passes the forked
// process's stdout through verbatim; showSuccess drops the trailer.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// showSuccess is consumed by the command engine, not another setting —
// exclude it from lintUnused so every sbt invocation isn't prefixed with
// a 6-line warning block.
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
  // keep catalog state (saveAsTable data defaults, derby metastore) out
  // of the repo tree — sink_bucketed otherwise drops spark-warehouse/
  // into the project root
  "-Dspark.sql.warehouse.dir=/tmp/graft_warehouse",
  "-Dderby.system.home=/tmp/graft_derby",
  // 24g default: the bench evaluates ~115 queries × 2 in one JVM; at 8g
  // the accumulated session state (persisted dedup caches, codegen
  // classes, broadcast blocks) left GC headroom so thin that individual
  // queries absorbed multi-second pauses under host load (driver r3
  // recorded fn_json=15.8 s vs 1.2 s steady-state)
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
