package graft.queries

import graft.Tables
import graft.io.Coco
import graft.operators.Locators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate query for the format hub (SURVEY §2.1/§2.2): a full
  * write→read COCO round-trip of the dataset view, oracled by computing the
  * same aggregate directly from the source tables in DuckDB — if any stage
  * of the serializer/parser drops or mangles rows, the hash differs. */
object IoQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    "q41_coco_roundtrip" -> ((s, d) => {
      // 'P' split ∩ id%10=0 — small enough that the (inherently single-task)
      // multiLine JSON re-read doesn't dominate the bench
      val ds = Locators.filterImages(
        Locators.getSplit(Tables.datasetView(s, d), Some("P")),
        org.apache.spark.sql.functions.col("id") % 10 === 0)
        .copy(datasetName = Some("rt"))
      val dir = java.nio.file.Files.createTempDirectory("graft_coco_rt").toString
      val written = Coco.toCoco(ds, dir, overwrite = true)
      val back = Coco.fromCoco(s, written.head)
      back.annotations
        .groupBy(col("category_id"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("box_width")), 2).as("w_sum"),
          round(sum(col("box_x_min")), 2).as("x_sum"))
    })
  )

  import Tables.viewCte

  val oracles: Map[String, String] = Map(
    "q41_coco_roundtrip" -> (
      s"""$viewCte
         |SELECT a.category_id, count(*) AS n,
         |       round(sum(a.box_width), 2) AS w_sum,
         |       round(sum(a.box_x_min), 2) AS x_sum
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |WHERE i.split = 'P' AND i.id % 10 = 0
         |GROUP BY a.category_id""".stripMargin)
  )
}
