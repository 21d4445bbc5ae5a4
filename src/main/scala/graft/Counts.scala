package graft

/** Prints the engine's gate/oracle counts as one JSON line — the single
  * source of truth `tools/update_counts.py` injects into COVERAGE.md and
  * README.md, so the scoreboard can never drift from the code again
  * (three rounds of hand-maintained counts disagreed with the artifacts).
  * No SparkSession: the maps are data, their values never run here. */
object Counts {
  def main(args: Array[String]): Unit = {
    val qs = SparkEntry.queries.keys.toSeq.sorted
    val os = SparkEntry.oracleSql.keys.toSet
    val missing = qs.filterNot(os)
    println(s"""{"gates":${qs.size},"oracles":${os.size},""" +
      s""""gates_without_oracle":[${missing.map("\"" + _ + "\"").mkString(",")}]}""")
  }
}
