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

    // §2.12 seeded random split — FULL oracle via forced residual clamping
    // (the q58-style construction for the share machinery): pre-assignments
    // push train (0.5 ≥ 0.4) and valid (0.25 ≥ 0.2) OVER their targets, so
    // their residual shares clamp to 0, the renormalized cumulative
    // thresholds become [0, 0, 1], and every unassigned row lands in test
    // regardless of its hash draw. Exercises residual computation,
    // clamping, renormalization, threshold lookup, and pre-assignment
    // honoring; the hash DISTRIBUTION itself (the one non-SQL part) stays
    // locked by SplitterSpec's share/determinism/partition-invariance
    // properties.
    "q26_simple_split" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val pre = when(col("id") % 2 === 0, "train")
        .when(col("id") % 4 === 1, "valid")
        .otherwise(lit(null).cast("string"))
      val seeded = ds.copy(images = ds.images.withColumn("split", pre))
      Splitter.simpleSplit(seeded, seed = 42, Seq("train", "valid", "test"),
        Seq(0.4, 0.2, 0.4))
        .images.groupBy("split").count()
    }),

    // §2.12 balanced split — FULL oracle via a forced greedy winner: groups
    // 0-9 pre-assign train (~10% of images), 10-89 valid (~80%); targets
    // (0.8, 0.2) leave train so far under target that the share-distance
    // argmin picks train for EVERY free atom, at every point of the
    // (seeded) processing order — train only reaches ~20% ≪ 80%. The gate
    // output is the complete per-group assignment plus the separation
    // invariant (n_splits = 1 per group).
    "q27_balanced_split" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val pre = when(col("id") % 100 < 10, "train")
        .when(col("id") % 100 < 90, "valid")
        .otherwise(lit(null).cast("string"))
      val withGroup = ds.copy(images = ds.images
        .withColumn("customer_group", (col("id") % 100).cast("string"))
        .withColumn("split", pre))
      val out = Splitter.split(withGroup, seed = 42, Seq("train", "valid"),
        Seq(0.8, 0.2), keepSeparate = Seq("customer_group"))
      out.images.groupBy("customer_group")
        .agg(max(col("split")).as("split"),
          countDistinct("split").as("n_splits"),
          count(lit(1)).as("n_images"))
    })
  )

  import Tables.viewCte

  val oracles: Map[String, String] = Map(
    "q25_atomize" ->
      """SELECT o_orderkey AS id,
        |       min(o_orderkey) OVER (PARTITION BY o_custkey) AS atom
        |FROM orders""".stripMargin,

    // forced clamping: train/valid pre-assignments exceed their targets →
    // all unassigned rows deterministically become 'test'
    "q26_simple_split" ->
      s"""$viewCte
         |SELECT CASE WHEN id % 2 = 0 THEN 'train'
         |            WHEN id % 4 = 1 THEN 'valid'
         |            ELSE 'test' END AS split,
         |       count(*) AS count
         |FROM images GROUP BY 1""".stripMargin,

    // forced greedy: free groups (90-99) all win 'train'
    "q27_balanced_split" ->
      s"""$viewCte
         |SELECT CAST(id % 100 AS VARCHAR) AS customer_group,
         |       CASE WHEN id % 100 >= 10 AND id % 100 < 90
         |            THEN 'valid' ELSE 'train' END AS split,
         |       CAST(1 AS BIGINT) AS n_splits,
         |       count(*) AS n_images
         |FROM images GROUP BY 1, 2""".stripMargin
  )
}
