ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "cognee_graphdbspark"
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
// The driver parses Bench's one-JSON-line-on-stdout contract. By default
// sbt routes a forked run's stdout through its logger (`[info] ` prefix)
// and appends a `[success] Total time: ...` epilogue — both of which made
// the line unparseable in rounds 1-4. StdoutOutput bypasses the logger so
// the forked process writes to stdout verbatim; showSuccess kills the
// epilogue so the JSON line is the last thing printed.
outputStrategy := Some(StdoutOutput)
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
  // 24g default: GraftSession.local now sizes local[n] to the machine
  // (32 threads here), and 32 concurrent array-heavy tasks + session
  // artifacts need more unified memory than the old 8g/local[4] posture
  // (the box grants 128 GiB; override via SPARK_DRIVER_MEM).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
