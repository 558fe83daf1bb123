ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "distcpplusspark"
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
// Forked run output defaults to sbt's logger, which prefixes every program
// stdout line with "[info] " — the driver's bench parser rejects a line that
// does not start with '{', so 14 rounds of per-query JSON never parsed.
// StdoutOutput pipes the forked JVM's stdout through raw.
run / outputStrategy := Some(sbt.OutputStrategy.StdoutOutput)
// ...and sbt's closing "[success] Total time ..." line (~75 chars) would
// otherwise sit between the bench's final JSON line and the end of the
// driver's ~2000-char tail capture, stealing budget a 180-query map needs.
Global / showSuccess := false
// JDK 17 derives sun.jnu.encoding from the process locale; without a UTF-8
// locale, java.nio cannot address unicode file names (copy-layer fixtures).
Test / envVars += "LANG" -> "C.UTF-8"
run / envVars += "LANG" -> "C.UTF-8"
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
  "-Dfile.encoding=UTF-8",
  "-Dsun.jnu.encoding=UTF-8",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // 45 queries × several whole-stage-codegen units × repeated bench runs
  // overflow the JDK-default 240 MB code cache; once it fills, the JIT
  // compiler shuts off and every later query runs interpreted (~4× slower —
  // this was the silent tail-of-bench slowdown, e.g. q04's 25-row broadcast
  // join at 1.6 s).
  "-XX:ReservedCodeCacheSize=1g",
) ++ sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq.flatMap(_.split(' ').filter(_.nonEmpty))
