package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query-name substrings (dev filter)
    val only: Option[Seq[String]] =
      if (args.length > 2) Some(args(2).split(',').toSeq) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val attempted = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
    // a reused outDir must not let THIS run's failures pass on a PREVIOUS
    // run's parquet: drop each attempted query's stale result up front (a
    // query that throws now leaves no dir → the checker flags it), and
    // record the attempt set so the checker ignores anything else
    attempted.keys.foreach { name =>
      if (new java.io.File(s"$outDir/$name").isDirectory)
        IoUtil.rmTree(s"$outDir/$name")
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // manifest BEFORE the query loop: if this run crashes mid-way, the
    // checker must see THIS run's attempt set (whose stale dirs were just
    // deleted → flagged missing), not a previous run's manifest that would
    // validate leftover dirs as current
    Files.writeString(Paths.get(s"$outDir/manifest.json"),
      attempted.keys.toSeq.sorted.map(q).mkString("[", ",", "]"))
    attempted.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // gates that persist intermediates (near-dup pipelines) document
      // cleanup as caller-owned; across ~90 gates the leftovers would
      // accumulate in executor storage, so drop them per query like Bench
      finally spark.catalog.clearCache()
    }
    val json = SparkEntry.oracleSql
      // dev-filtered runs dump only the matching oracles so the checker's
      // missing-result detection doesn't false-flag unrun queries; the
      // driver's unfiltered run still writes the full map
      .filter { case (name, _) => only.forall(_.exists(name.contains)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
