ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "proteofavspark"
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
// The driver parses Bench's ONE JSON stdout line. sbt's default
// LoggedOutput prefixes every forked-process line with "[info] ",
// which broke the driver's JSON parse in round 2 (BENCH_r02.json
// "parsed": null). StdoutOutput makes the forked JVM inherit stdout
// so the JSON line is emitted raw at column 0.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...but round 3 STILL recorded "parsed": null: sbt prints
// "[success] Total time: ..." AFTER the forked JVM exits, so the JSON
// line was not the last stdout line. Suppress the banner so Bench's
// JSON line is the final line the driver reads.
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
  // 8g GC-thrashes the sf0.1 pair-generation queries at local[32]
  // (149 s vs 56 s total bench); the box has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // 58 queries x whole-stage codegen overflow the default 240 MB JIT
  // code cache — once full, late queries run interpreted (a rotating
  // 3-10x slowdown on whichever heavy query compiled last)
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
)
