ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "icebergbenchmarkjavaspark"
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
// Forked `run` output goes STRAIGHT to stdout instead of through
// sbt's logger: the bench contract is "print ONE JSON line", and the
// logger's `[info] ` prefix breaks any line-oriented JSON parse of
// the captured stdout tail (BENCH_r06.json `parsed: null` — the
// compact totals line was present but prefixed).
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
  // 32g, not 16g: across 217 queries x 3 bench reps the accumulated
  // AQE/listener state left a 16g heap GC-thrashing exactly on the
  // first full-lineitem scan each pass (corpus_tpch_q01 18.6s -> 2.0s
  // at 32g; the box has 128g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // 60+ queries of generated whole-stage-codegen classes in one JVM
  // overflow the default ~240m JIT code cache; once full the JVM
  // stops compiling and later queries run interpreted (2-3x slower).
  "-XX:ReservedCodeCacheSize=1g",
)
