ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "speech_data_pipelinespark"
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
  // A Verify/Bench session runs 90+ queries in one JVM: at -Xmx8g the
  // late queries pay progressive GC pressure (measured: the same query
  // 2-10x slower at position ~170 of a two-pass bench than at ~25).
  // local[32] on a 128 GiB box gets a heap sized like the real driver's;
  // SPARK_DRIVER_MEM still overrides for constrained environments.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // 90 queries x 2 runs x whole-stage codegen = thousands of Janino
  // classes; the JDK17 default 240 MB code cache fills and disables the
  // JIT mid-bench. 1 GiB keeps compiled code compiled.
  "-XX:ReservedCodeCacheSize=1g",
  // Tungsten page size scales with heap (maxExecMemory/(2*cores*16)):
  // at 48g that is ~16 MB pages, and every operator in every task zeroes
  // one before touching a row — a many-small-stages query (dedup_cascade)
  // measured 12.6 s with 4 MB pages vs 59.6 s with the heap-derived
  // default AT THE SAME HEAP. Pin it so heap sizing stays a capacity
  // knob, not a hidden latency knob.
  "-Dspark.buffer.pageSize=4m",
) ++ sys.env.get("SPARK_GC_LOG").map(f => s"-Xlog:gc*:file=$f").toSeq
