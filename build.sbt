ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "erdespark"
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
// Forked `run` output must hit stdout verbatim (no sbt "[info]" prefix):
// the driver json-parses Bench's single output line.
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
  // arrow-memory-netty needs reflective direct-buffer access on JDK 17
  // (same flag spark-submit's JavaModuleOptions injects)
  "-Dio.netty.tryReflectionSetAccessible=true",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // batch-throughput GC: the bench JVM runs 32 concurrent tasks in one
  // heap; ParallelGC trades pause latency (irrelevant here) for
  // throughput and avoids G1's concurrent-mark CPU tax
  "-XX:+UseParallelGC",
) ++ {
  // Streaming state stores fsync every delta into the TEMP checkpoint dir
  // (memory-sink queries checkpoint under java.io.tmpdir): measured ~0.7 s
  // of non-CPU wait per state task on this sandbox's overlay /tmp. Point
  // the JVM tmpdir at tmpfs when one is mounted — same environment fact as
  // spark.local.dir (production: checkpoints live on real fast storage).
  // Explicit /tmp/graft_* paths (manifest roots, index dirs) are absolute
  // and unaffected.
  val shm = java.nio.file.Paths.get("/dev/shm")
  if (java.nio.file.Files.isDirectory(shm) && java.nio.file.Files.isWritable(shm)) {
    val t = shm.resolve("graft_jvm_tmp")
    java.nio.file.Files.createDirectories(t)
    Seq(s"-Djava.io.tmpdir=$t")
  } else Seq.empty
}
