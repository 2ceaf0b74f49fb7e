ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "sparkmlhelperspark"
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
// Keep stdout clean after a runMain finishes: Bench's contract is ONE
// JSON line, and sbt's trailing "[success] Total time: ..." banner
// otherwise lands after it (the round-1 bench artifact recorded
// parsed:null with that banner as the final stdout line).
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Forked runMain output goes straight to stdout, no "[info] " logger
// prefix — Bench's JSON line must arrive verbatim.
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
// Dense MLlib paths (GEMM/GEMV in ALS scoring, GMM, MLP): pin any
// native BLAS to one thread per task. On THIS host no native BLAS is
// loadable (verified r14: only numpy's bundled libopenblas exists,
// which JVM netlib cannot load, so MLlib runs the pure-JVM fallback);
// the cap is the prophylactic for hosts that do have one — 32 Spark
// task threads × N BLAS threads each is the classic oversubscription
// storm (VERDICT r13 #9).
run / envVars ++= Map("OPENBLAS_NUM_THREADS" -> "1", "OMP_NUM_THREADS" -> "1")
Test / envVars ++= Map("OPENBLAS_NUM_THREADS" -> "1", "OMP_NUM_THREADS" -> "1")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // saveAsTable (bucketed-join demo) must never write inside the repo
  "-Dspark.sql.warehouse.dir=/tmp/graft-warehouse",
  "-Dderby.stream.error.file=/tmp/graft-derby.log",
  // local[32] shares driver+executor in one JVM; 8g caused multi-second
  // GC stalls with 12x run-to-run bench variance on the 128 GiB box.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+UseG1GC",
)
