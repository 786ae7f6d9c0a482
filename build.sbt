ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "bigdatabowlspark"
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
// Forked run output must reach stdout raw (no sbt "[info]" prefix):
// the driver parses Bench's single JSON line from stdout.
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
// 8g, deliberately NOT larger: in local mode ContextCleaner reclaims
// dead broadcast/shuffle/checkpoint blocks only after a driver GC, so
// a bigger heap means rarer GCs, accumulating block-manager state and
// 10-40x pathological swings on the heavy queries (measured at sf0.1:
// the LSH subset ran 47 s at 8g, 534 s at 48g, with one query at
// 415 s at 16g). Bench/Verify also System.gc() between queries to
// trigger that cleanup deterministically. On a real cluster this is
// per-executor sizing + distributed cleanup, not a code concern.
// Ephemeral I/O (streaming checkpoint/offset logs, staged source
// copies, spark.local.dir shuffle+block spills) all root at
// java.io.tmpdir; /tmp here is ext4. Point tmpdir at tmpfs (/dev/shm)
// when available. Measured effect is small (~4% on the streaming
// subset — the micro-batch floor is scheduling + state-store commits,
// not fsync; see SCALING.md "Streaming micro-batch floor"), but it
// removes disk-fsync variance from bench readings and costs nothing:
// total footprint is MBs (staged parquet copies, tiny state stores)
// against a 64 GiB tmpfs. Override with SPARK_GRAFT_TMPDIR. On a real
// cluster this is executor local-SSD sizing, not a code concern.
val graftTmpDir: String = sys.env.get("SPARK_GRAFT_TMPDIR").orElse {
  val shm = new java.io.File("/dev/shm/graft-tmp")
  if (shm.isDirectory || shm.mkdirs()) Some(shm.getAbsolutePath) else None
}.getOrElse(sys.props("java.io.tmpdir"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Djava.io.tmpdir=$graftTmpDir",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
