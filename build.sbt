ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bearsspark"
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
// Bench handoff contract (judge r9/r10): the driver keeps the TAIL of
// stdout and parses its final line as JSON. The default forked-run output
// strategy logs through sbt (an `[info] ` prefix on every line) and sbt
// then prints `[success] Total time: ...` after the app exits — both
// decorate/displace the bare summaryLine graft.Bench prints last. Send the
// forked process's stdout straight through, and drop the success banner.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command loop (not a task), which the
// unused-key lint can't see
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
// Tests fork, so the replay property must be forwarded into the test JVM
// for `sbt -Dgraft.prop.seed=<seed> test` to actually pin the draws.
Test / javaOptions ++=
  sys.props.get("graft.prop.seed").map(s => s"-Dgraft.prop.seed=$s").toSeq
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
