ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "kafispark"
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
// keep sbt's "[success] Total time" epilogue off stdout so the LAST line
// of an `sbt runMain` invocation is the program's own output (the bench
// harness parses that line as JSON)
ThisBuild / showSuccess := false
// forked run output goes straight to stdout, not through the "[info]"
// logger prefix — same reason: the JSON line must arrive verbatim
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
  // r15 optimization round: FIX the heap at 24g and pre-touch it once at
  // JVM start. On this sandbox every FIRST touch of a heap page is a
  // host-level allocation fault costing ~90 µs (about 100× bare metal),
  // so with a growable heap G1's commit/uncommit cycles across a
  // 300+-query suite re-expose heap regions to first-touch faults and
  // the bursts develop into multi-second KERNEL-time storms on whichever
  // queries run while the heap is re-growing (measured on a quiet box:
  // q_lags 8.1 s → 0.5 s, q_latex_text 7.5 s → 0.6 s, suite kernel-mode
  // CPU 1113 s → 861 s, full bench 283 s → 246 s with nothing else
  // changed). AlwaysPreTouch pays the whole fault cost at startup,
  // before any timed query; -Xms = -Xmx stops the uncommit cycle that
  // would re-create it; 24g (down from 48g) keeps the one-time pre-touch
  // to ~2 min and is empirically ample — the full 319-query suite runs
  // with 0.53 s TOTAL stop-the-world GC at 24g. Same posture a
  // production cluster uses for long-lived executors.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  "-XX:+AlwaysPreTouch",
)
