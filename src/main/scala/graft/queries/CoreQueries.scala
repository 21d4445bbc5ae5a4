package graft.queries

import graft.Tables
import graft.operators.{Locators, Ids, Remap}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Correctness-gate queries for the core relational operator surface
  * (SURVEY §2.3–2.7, §2.10). Each query exercises a real engine operator
  * against the deterministic dataset view ([[graft.Tables]]); each oracle is
  * the equivalent ANSI SQL over the same parquet tables, evaluated by the
  * driver in DuckDB.
  *
  * Float discipline: any order-dependent double aggregate is rounded (2–4
  * decimals, far above double-summation error at these scales) so the
  * hash-compare is stable across engines.
  */
object CoreQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  private val annCols =
    Seq("id", "image_id", "category_id", "category_str", "split",
      "box_x_min", "box_y_min", "box_width", "box_height")

  val defs: Map[String, Q] = Map(
    // §2.5 aggregation — TPC-H Q1-shaped pricing summary
    "q01_agg_pricing" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // §2.3 loc cascade: filter images, semi-join-cascade annotations
    "q02_filter_images_cascade" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Locators.filterImages(ds, col("split") === "F" && col("width") > 900)
        .annotations.select(annCols.map(col): _*)
    }),

    // §2.3 remove_empty_images after an annotation filter
    "q03_remove_empty_images" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val filtered = Locators.filterAnnotations(ds, col("category_id") <= 2)
      Locators.removeEmptyImages(filtered).images
    }),

    // §2.3 filter_annotations with emptied-image cascade
    "q04_filter_annotations_empties" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Locators.filterAnnotations(ds, col("box_width") > 25, removeEmptiedImages = true).images
    }),

    // §1.2 derived-column maintenance: split propagation via broadcast FK join
    "q05_split_counts" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      ds.annotations.groupBy(col("split")).count()
    }),

    // §2.6 reset_index: dense sequential ids + FK rewrite
    "q06_reset_index" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Ids.resetIndex(ds, sortImagesBy = Seq("relative_path"))
        .annotations.select(col("id"), col("image_id"), col("category_id"))
    }),

    // §2.10 class remapping (keep subset, coarsen to 3 classes)
    "q09_remap_classes" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Remap.remapClasses(ds,
        Map(0 -> 0, 1 -> 0, 2 -> 1, 3 -> 1, 4 -> 2),
        newNames = Map(0 -> "small", 1 -> "mid", 2 -> "big"),
        removeNotMapped = true)
        .annotations.select(col("id"), col("category_id"), col("category_str"))
    }),

    // §2.3 iloc positional slice (row_number over total order)
    "q10_iloc_images" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Locators.ilocImages(ds, 10, 500, 10).images.select(col("id"))
    }),

    // §2.3 null-safe get_split
    "q11_get_split" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Locators.getSplit(ds, Some("P")).annotations
        .groupBy(col("category_str")).count()
    }),

    // §2.3 invalid-annotation removal (box bounds vs joined image dims)
    "q12_remove_invalid" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Locators.removeInvalidAnnotations(ds).annotations
        .groupBy(col("category_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("box_width")), 2).as("total_w"))
    })
  )

  import Tables.viewCte

  val oracles: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q02_filter_images_cascade" ->
      s"""$viewCte
         |SELECT a.id, a.image_id, a.category_id, a.category_str, i.split,
         |       a.box_x_min, a.box_y_min, a.box_width, a.box_height
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |WHERE i.split = 'F' AND i.width > 900""".stripMargin,

    "q03_remove_empty_images" ->
      s"""$viewCte
         |SELECT i.* FROM images i
         |WHERE EXISTS (SELECT 1 FROM annotations a
         |              WHERE a.image_id = i.id AND a.category_id <= 2)""".stripMargin,

    "q04_filter_annotations_empties" ->
      s"""$viewCte
         |SELECT i.* FROM images i
         |WHERE EXISTS (SELECT 1 FROM annotations a
         |              WHERE a.image_id = i.id AND a.box_width > 25)
         |   OR NOT EXISTS (SELECT 1 FROM annotations a WHERE a.image_id = i.id)""".stripMargin,

    "q05_split_counts" ->
      s"""$viewCte
         |SELECT i.split AS split, count(*) AS count
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |GROUP BY i.split""".stripMargin,

    "q06_reset_index" ->
      s"""$viewCte,
         |imap AS (SELECT id AS old_id,
         |                row_number() OVER (ORDER BY relative_path) - 1 AS new_id
         |         FROM images)
         |SELECT row_number() OVER (ORDER BY a.id) - 1 AS id,
         |       imap.new_id AS image_id, a.category_id
         |FROM annotations a JOIN imap ON a.image_id = imap.old_id""".stripMargin,

    "q09_remap_classes" ->
      s"""$viewCte
         |SELECT a.id,
         |  CAST(CASE a.category_id WHEN 0 THEN 0 WHEN 1 THEN 0 WHEN 2 THEN 1
         |                          WHEN 3 THEN 1 WHEN 4 THEN 2 END AS INT) AS category_id,
         |  CASE WHEN a.category_id IN (0,1) THEN 'small'
         |       WHEN a.category_id IN (2,3) THEN 'mid'
         |       ELSE 'big' END AS category_str
         |FROM annotations a
         |WHERE a.category_id <= 4""".stripMargin,

    "q10_iloc_images" ->
      s"""$viewCte,
         |pos AS (SELECT id, row_number() OVER (ORDER BY id) - 1 AS p FROM images)
         |SELECT id FROM pos WHERE p >= 10 AND p < 500 AND (p - 10) % 10 = 0""".stripMargin,

    "q11_get_split" ->
      s"""$viewCte
         |SELECT a.category_str, count(*) AS count
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |WHERE i.split = 'P'
         |GROUP BY a.category_str""".stripMargin,

    "q12_remove_invalid" ->
      s"""$viewCte
         |SELECT a.category_id, count(*) AS n, round(sum(a.box_width), 2) AS total_w
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |WHERE a.box_x_min >= 0 AND a.box_y_min >= 0
         |  AND a.box_width > 0 AND a.box_height > 0
         |  AND a.box_x_min + a.box_width <= i.width
         |  AND a.box_y_min + a.box_height <= i.height
         |GROUP BY a.category_id""".stripMargin
  )
}
