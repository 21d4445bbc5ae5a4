package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator (SURVEY §2) to a
  * DataFrame plan over the parquet tables in `sfDir`; `oracleSql` carries the
  * equivalent ANSI SQL the driver runs in DuckDB over the same tables.
  * Query modules live in [[graft.queries]].
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q3-shaped: customer ⋈ orders ⋈ lineitem, broadcast dims,
    * grouped revenue. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val c = Tables.customer(spark, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, d)
    val l = Tables.lineitem(spark, d)
    l.join(o, l("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  private val modules: Seq[QueryModule] = Seq(
    _root_.graft.queries.CoreQueries,
    _root_.graft.queries.ReshapeQueries,
    _root_.graft.queries.EvalQueries,
    _root_.graft.queries.SplitQueries,
    _root_.graft.queries.LlmQueries,
    _root_.graft.queries.StreamQueries,
    _root_.graft.queries.IoQueries,
    _root_.graft.queries.ExtraQueries,
    _root_.graft.queries.SketchQueries,
    _root_.graft.queries.CurationQueries,
    _root_.graft.queries.CorpusRetrievalQueries,
    _root_.graft.queries.PipelineQueries,
    _root_.graft.queries.DetectionPipelineQueries,
    _root_.graft.queries.RetrievalPipelineQueries
  )

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.defs).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracles).toMap
}

/** A named batch of gate queries + their DuckDB oracles. */
trait QueryModule {
  def defs: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
