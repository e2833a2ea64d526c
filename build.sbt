ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
// No "[success] Total time ..." epilogue: the per-round bench driver
// parses the LAST stdout line of `sbt runMain graft.Bench` as JSON —
// the banner after Bench's trailing compact line is why BENCH_r15.json
// has parsed:null. Errors still print ([error] lines are unaffected).
Global / showSuccess := false
name := "angelone_clickhousespark"
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
// r16 verdict "What's missing" #3: dropping the [success] banner was
// necessary but not sufficient — the forked run's stdout still went
// through sbt's logger, so Bench's trailing compact JSON line reached
// the driver wrapped in "[info] " and the last-line parse failed.
// StdoutOutput makes the forked JVM inherit the real stdout:
// unprefixed, unbuffered, and genuinely the last line.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
) ++ sys.env.get("GRAFT_GC_LOG").map(f => s"-Xlog:gc*:file=$f:time,uptime").toSeq ++ Seq(
)
