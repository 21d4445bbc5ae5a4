package graft

import org.apache.spark.sql.SparkSession

/** Measurement tooling (optimization rounds): dump `.explain("formatted")`
  * for gate queries to files so plan shapes can be diffed before/after a
  * change without re-running the full bench.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> [queryName...]
  * No query names = all of SparkEntry.queries. One file per query:
  * <outDir>/<name>.txt. Uses the same session config as Bench so the
  * plans match what the bench actually executes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <sfDir> <outDir> [query...]")
    val sfDir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = {
      val all = SparkEntry.queries.keys.toSeq.sorted
      // a typo'd query name must fail loudly, not silently produce no file
      // (a before/after plan comparison would quietly skip that gate)
      val unknown = args.drop(2).filterNot(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"unknown queries: ${unknown.mkString(", ")}")
      if (args.length > 2) all.filter(args.drop(2).contains) else all
    }
    names.foreach { n =>
      val txt =
        try SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: $e" }
      java.nio.file.Files.write(
        outDir.resolve(s"$n.txt"),
        txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
    println(s"[plandump] wrote ${names.size} plans to $outDir")
  }
}
