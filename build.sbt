ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "spotifytagsetlspark"
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
// Forked run output goes STRAIGHT to stdout/stderr, not through sbt's
// logger: the driver json.loads the Bench line and the default
// LoggedOutput's "[info] " prefix made that parse fail every round
// (BENCH_r*.json "parsed": null).
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
  // 24g default: the 138-query bench sweep at sf0.1 churns enough
  // between clearCache() calls that an 8g heap spends late-run time in
  // GC (measured: scattered 2-30x inflation on cheap queries in the
  // q6x-q8x alphabetical band); the box has 128 GiB
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Xms = Xmx: G1 UNCOMMITS the heap after every System.gc() (down to
  // ~1.1 GB committed for a ~300 MB live set, per -Xlog:gc), so each
  // bench query's timed region was paying multi-second page-fault
  // stalls re-growing the heap through an OS page cache full of the
  // session's shuffle files — measured q139 runs of 13/64/31 s whose
  // GC log shows a 55 s stretch with ONE young GC. Pinning the
  // committed size removes heap regrowth from the timed path; the
  // per-query System.gc() still runs (cleaner queue drain) but can no
  // longer shrink what the next run allocates into.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
