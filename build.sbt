ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dagsspark"
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
// The driver parses the ONE bench/verify JSON line out of the run's stdout
// tail. sbt's default LoggedOutput prefixes every forked-process line with
// "[info] " / "[error] ", which made the line unparseable every round since
// r02 — StdoutOutput inherits the parent's raw stdout/stderr instead.
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
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // 16g default: the 182-query bench suite in one JVM at sf0.1 was
  // GC-bound at 8g (trivial queries inflated ~2x in-suite while their
  // isolated times were unchanged); the host has 128g
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
) ++ {
  // fixed nursery: G1's ADAPTIVE young-gen resizing is a measured noise
  // source in the one-JVM bench — a heavy query grows the nursery, the
  // next query's allocations then hit longer young pauses until G1
  // re-shrinks it, and plan-identical iterative queries swung 2x run to
  // run (r5/r6 verdicts). Pinning young gen trades a little adaptivity
  // for repeatable per-query GC cost. Only pinned for the DEFAULT heap:
  // a custom SPARK_DRIVER_MEM below 2g would make -Xmn2g an unstartable
  // JVM, so explicit heap choices keep G1's adaptive sizing unless
  // SPARK_GRAFT_XMN is also set.
  val xmn = sys.env.get("SPARK_GRAFT_XMN")
    .orElse(if (sys.env.contains("SPARK_DRIVER_MEM")) None else Some("2g"))
  xmn.map(v => s"-Xmn$v").toSeq
}
