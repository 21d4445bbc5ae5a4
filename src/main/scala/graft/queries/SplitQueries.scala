package graft.queries

import graft.Tables
import graft.split.Splitter
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the constrained splitter (SURVEY §2.12). */
object SplitQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // §2.12 connected-component atomizer; with a single key column the
    // component id is provably min(id) per key → SQL oracle
    "q25_atomize" -> ((s, d) => {
      val df = Tables.orders(s, d).select(
        col("o_orderkey").as("id"), col("o_custkey"))
      Splitter.makeAtomicChunks(df, Seq("o_custkey"))
        .select(col("id"), col("__atom").as("atom"))
    }),

    // §2.12 seeded random split (xxhash64-derived → rows-only; share/
    // determinism invariants locked in SplitterSpec)
    "q26_simple_split" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val cleared = ds.copy(images = ds.images.withColumn("split",
        lit(null).cast("string")))
      Splitter.simpleSplit(cleared, seed = 42, Seq("train", "valid", "test"),
        Seq(0.7, 0.2, 0.1))
        .images.groupBy("split").count()
    }),

    // §2.12 balanced split: separation invariant output as a checkable
    // aggregate — every atom key maps to exactly one split (rows-only for
    // the assignment itself; the 1-split-per-key property is in the output)
    "q27_balanced_split" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val withGroup = ds.copy(images = ds.images.withColumn("customer_group",
        (col("id") % 100).cast("string")))
      val cleared = withGroup.copy(images = withGroup.images
        .withColumn("split", lit(null).cast("string")))
      val out = Splitter.split(cleared, seed = 42, Seq("train", "valid"), Seq(0.8, 0.2),
        keepSeparate = Seq("customer_group"))
      out.images.groupBy("customer_group")
        .agg(countDistinct("split").as("n_splits"), count(lit(1)).as("n_images"))
    })
  )

  val oracles: Map[String, String] = Map(
    "q25_atomize" ->
      """SELECT o_orderkey AS id,
        |       min(o_orderkey) OVER (PARTITION BY o_custkey) AS atom
        |FROM orders""".stripMargin
  )
}
