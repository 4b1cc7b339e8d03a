ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "safeascentspark"
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
// The bench/verify harness parses the forked JVM's stdout. By default sbt
// routes forked output through its logger, prefixing every line with
// "[info] " and appending a "[success] Total time" epilogue — which is
// exactly why every per-round BENCH_r{N}.json so far failed to parse: the
// JSON results line was never bare and never last. StdoutOutput passes the
// forked process's streams through untouched, and showSuccess drops the
// epilogue, so the bench's final JSON line is the last bare line emitted.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
Global / excludeLintKeys += showSuccess
// suites share one local SparkSession — run them sequentially
Test / parallelExecution := false
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
  // local[32] shares one JVM across driver + 32 task threads; an 8g heap
  // left the full 59-query bench GC-bound (broadcasts from earlier queries
  // pile up until ContextCleaner GC cycles) — the host has 128 GiB, so
  // give the suite real headroom.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Whole-stage codegen for the influence kernel emits generated methods
  // beyond HotSpot's 8000-bytecode JIT threshold; by default those run in
  // the interpreter (~9× slower on the 1.16B-pair batch, A/B-measured).
  // Forcing compilation of huge methods is the standard setting for wide
  // Spark codegen workloads.
  "-XX:-DontCompileHugeMethods",
  // ...and keep most generated methods small in the first place so JIT
  // compiles them promptly (bounds the worst case: without splitting, the
  // fused kernel method's compile/deopt lottery swung 25 s ↔ 400 s).
  "-Dspark.sql.codegen.methodSplitThreshold=256",
  // 62 queries × whole-stage codegen ≈ hundreds of generated classes; a
  // filled code cache silently disables the JIT for everything after it
  // (the end-of-suite kernel batch ran 2-8× slower than the same plan in
  // a fresh JVM). Size it so the suite never hits the ceiling, and let
  // the sweeper reclaim cold generated methods if it ever does.
  "-XX:ReservedCodeCacheSize=1g",
  "-XX:+UseCodeCacheFlushing",
) ++ sys.env.get("GRAFT_JVM_EXTRA").toSeq.flatMap(_.split(" "))
