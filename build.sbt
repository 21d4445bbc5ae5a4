ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "loursspark"
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
// No "[success] Total time: ..." trailer after a runMain's stdout: the
// bench/driver contract is that graft.Bench's one-line JSON is the LAST
// line of stdout, and sbt's success banner printed after the forked
// program's output defeated the driver's tail parse two rounds running
// (BENCH_r13/BENCH_r14 parsed:null).
Global / showSuccess := false
// Inherit the forked program's stdout/stderr directly instead of routing
// them through sbt's logger: the logger prefixes every forked-stdout line
// with "[info] ", so the bench's one-line JSON was never parseable as a
// bare JSON line no matter what printed after it.
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
  // 16g default: at sf0.1 × 32 threads the heavy gates GC-churn an 8g heap
  // (intermittent 2× single-rep inflation on q23/q99 in otherwise-quiet
  // runs); the box has 128 GiB, so trade headroom for stable rep times
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
)
