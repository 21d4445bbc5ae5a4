package graft.queries

import graft.Tables
import graft.operators.{Locators, Merge, Diff, Booleanize, Grouper, Appender}
import graft.functions.Bbox
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for merge/diff/booleanize/bbox/grouper/appender
  * (SURVEY §2.4, §2.7, §2.8, §2.9). */
object ReshapeQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  val defs: Map[String, Q] = Map(
    // §2.7 union of two id-disjoint halves (Merge.union incl. collision probe)
    "q13_merge_union" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val a = Locators.filterImages(ds, col("id") % 2 === 0)
      val b = Locators.filterImages(ds, col("id") % 2 === 1)
      Merge.union(a, b).annotations
        .groupBy(col("split"), col("category_id")).count()
    }),

    // §2.4 horizontal merge: overlapping ids contribute only new columns
    "q14_merge_horizontal" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val extra = ds.copy(
        images = Tables.imagesView(s, d).join(
          Tables.orders(s, d).select(col("o_orderkey").as("id"),
            col("o_totalprice").as("totalprice")), Seq("id")),
        annotations = ds.annotations.limit(0))
      Merge.merge(ds, extra).images
        .select(col("id"), col("width"), col("split"), col("totalprice"))
    }),

    // §2.7 cell-wise diff classification. The base annotations view is
    // materialized ONCE (localCheckpoint) — the left side and the mutation
    // derive from the same blocks instead of re-running the lineitem scan +
    // view construction per join input (r7 bench's top line was exactly
    // that duplicated construction under the full-outer join)
    "q15_diff_status" -> ((s, d) => {
      val ann = Tables.datasetView(s, d).annotations.localCheckpoint()
      val mutated = ann
        .filter(col("category_id") =!= 6)
        .withColumn("box_width",
          when(col("category_id") === 3, col("box_width") * 2).otherwise(col("box_width")))
      Diff.frameDiff(ann, mutated)
        .groupBy(col("status")).count()
    }),

    // §2.8 booleanize: array column → boolean family
    "q16_booleanize" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val tagged = li.select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        array_compact(array(
          when(col("l_returnflag") === "R", "returned"),
          when(col("l_discount") > 0.05, "discounted"),
          when(col("l_quantity") > 25, "bulk"))).as("tags"))
      val (out, _) = Booleanize.booleanizeColumn(tagged, "tags",
        Some(Seq("bulk", "discounted", "returned")))
      out.select(col("id"), col("`tags.bulk`"), col("`tags.discounted`"), col("`tags.returned`"))
    }),

    // §2.9 bbox export to relative center format (pure column algebra + FK dims)
    "q17_bbox_relative" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Bbox.exportBoxes(ds, Bbox.BoxFormat(Bbox.CenterSize, relative = true))
        .select(col("id"), col("cx"), col("cy"), col("width"), col("height"))
    }),

    // §2.9 cap boxes to image bounds then aggregate
    "q18_cap_boxes" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Bbox.capBoxes(ds).annotations
        .groupBy(col("category_id"))
        .agg(round(sum(col("box_width")), 2).as("capped_w"),
          round(sum(col("box_height")), 2).as("capped_h"))
    }),

    // §2.9 continuous binning (equal-width cut) + group counts
    "q19_binning" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val edges = Grouper.binEdges(o.select(col("o_totalprice")),
        Grouper.ContinuousGroup("o_totalprice", 10))
      o.select(Grouper.binIndex(col("o_totalprice"), edges).as("bin"))
        .groupBy(col("bin")).count()
    }),

    // §2.11-adjacent: annotation append with id allocation + label-map merge
    "q20_append" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val batch = Tables.lineitem(s, d).filter(col("l_linenumber") === 1)
        .select(
          col("l_orderkey").as("image_id"),
          lit(7).cast("int").as("category_id"),
          lit(5.0).as("box_x_min"), lit(5.0).as("box_y_min"),
          col("l_quantity").as("box_width"), lit(10.0).as("box_height"))
      Appender.appendAnnotations(ds, batch, Map(7 -> "pred"))
        .annotations.groupBy(col("category_id"), col("category_str")).count()
    }),

    // §2.5 dense N-d histogram (cross-product densify + 0-fill)
    "q21_histogram" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      Grouper.histogram(ds.annotations, Seq("split", "category_id"))
    }),

    // §2.10 packaged preset remap: coco→supercategory fuses categories
    // 2..6 into 'vehicle' (id 2), keeps 1 as 'person', drops unmapped 0
    // (reference remap_presets/__init__.py:14-53 + dataset.py:3581-3631)
    "q57_remap_preset" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      graft.operators.Remap.remapFromPreset(ds, "coco", "supercategory")
        .annotations
        .groupBy(col("category_id").cast("int").as("category_id"),
          col("category_str"))
        .agg(count(lit(1)).as("n"), countDistinct(col("image_id")).as("n_images"))
    })
  )

  import Tables.viewCte

  val oracles: Map[String, String] = Map(
    "q13_merge_union" ->
      s"""$viewCte
         |SELECT i.split AS split, a.category_id, count(*) AS count
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |GROUP BY i.split, a.category_id""".stripMargin,

    "q14_merge_horizontal" ->
      s"""$viewCte
         |SELECT i.id, i.width, i.split, o.o_totalprice AS totalprice
         |FROM images i JOIN orders o ON i.id = o.o_orderkey""".stripMargin,

    "q15_diff_status" ->
      s"""$viewCte
         |SELECT status, count(*) AS count FROM (
         |  SELECT CASE WHEN category_id = 6 THEN 'left_only'
         |              WHEN category_id = 3 AND box_width <> 0 THEN 'changed'
         |              ELSE 'equal' END AS status
         |  FROM annotations) GROUP BY status""".stripMargin,

    // the oracle hard-codes the preset's semantics on the view's id range
    // (coco ids 1='person'; 2..6 all map to supercategory 2='vehicle';
    // category 0 is not a coco id → dropped by remove_not_mapped)
    "q57_remap_preset" ->
      s"""$viewCte
         |SELECT CAST(CASE WHEN category_id = 1 THEN 1 ELSE 2 END AS INT) AS category_id,
         |       CASE WHEN category_id = 1 THEN 'person' ELSE 'vehicle' END AS category_str,
         |       count(*) AS n, count(DISTINCT image_id) AS n_images
         |FROM annotations
         |WHERE category_id BETWEEN 1 AND 6
         |GROUP BY 1, 2""".stripMargin,

    "q16_booleanize" ->
      """SELECT l_orderkey * 8 + l_linenumber AS id,
        |  l_quantity > 25 AS "tags.bulk",
        |  l_discount > 0.05 AS "tags.discounted",
        |  l_returnflag = 'R' AS "tags.returned"
        |FROM lineitem""".stripMargin,

    "q17_bbox_relative" ->
      s"""$viewCte
         |SELECT a.id,
         |  -- the reference's float order (export_bbox: scale by the image
         |  -- dim FIRST, then derive the center) — bit-for-bit replay
         |  a.box_x_min / i.width + (a.box_width / i.width) / 2 AS cx,
         |  a.box_y_min / i.height + (a.box_height / i.height) / 2 AS cy,
         |  a.box_width / i.width AS width,
         |  a.box_height / i.height AS height
         |FROM annotations a JOIN images i ON a.image_id = i.id""".stripMargin,

    "q18_cap_boxes" ->
      s"""$viewCte
         |SELECT a.category_id,
         |  round(sum(greatest(least(a.box_x_min + a.box_width, CAST(i.width AS DOUBLE))
         |        - greatest(a.box_x_min, 0.0), 0.0)), 2) AS capped_w,
         |  round(sum(greatest(least(a.box_y_min + a.box_height, CAST(i.height AS DOUBLE))
         |        - greatest(a.box_y_min, 0.0), 0.0)), 2) AS capped_h
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |GROUP BY a.category_id""".stripMargin,

    "q19_binning" ->
      """WITH stats AS (SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders)
        |SELECT CASE
        |  WHEN o_totalprice >= lo + (hi-lo)*0/10 AND o_totalprice <= lo + (hi-lo)*1/10 THEN 0
        |  WHEN o_totalprice >  lo + (hi-lo)*1/10 AND o_totalprice <= lo + (hi-lo)*2/10 THEN 1
        |  WHEN o_totalprice >  lo + (hi-lo)*2/10 AND o_totalprice <= lo + (hi-lo)*3/10 THEN 2
        |  WHEN o_totalprice >  lo + (hi-lo)*3/10 AND o_totalprice <= lo + (hi-lo)*4/10 THEN 3
        |  WHEN o_totalprice >  lo + (hi-lo)*4/10 AND o_totalprice <= lo + (hi-lo)*5/10 THEN 4
        |  WHEN o_totalprice >  lo + (hi-lo)*5/10 AND o_totalprice <= lo + (hi-lo)*6/10 THEN 5
        |  WHEN o_totalprice >  lo + (hi-lo)*6/10 AND o_totalprice <= lo + (hi-lo)*7/10 THEN 6
        |  WHEN o_totalprice >  lo + (hi-lo)*7/10 AND o_totalprice <= lo + (hi-lo)*8/10 THEN 7
        |  WHEN o_totalprice >  lo + (hi-lo)*8/10 AND o_totalprice <= lo + (hi-lo)*9/10 THEN 8
        |  WHEN o_totalprice >  lo + (hi-lo)*9/10 AND o_totalprice <= hi THEN 9
        |  END AS bin, count(*) AS count
        |FROM orders, stats GROUP BY bin""".stripMargin,

    "q20_append" ->
      s"""$viewCte
         |SELECT category_id, category_str, count(*) AS count FROM (
         |  SELECT category_id, category_str FROM annotations
         |  UNION ALL
         |  SELECT 7 AS category_id, 'pred' AS category_str
         |  FROM lineitem WHERE l_linenumber = 1)
         |GROUP BY category_id, category_str""".stripMargin,

    "q21_histogram" ->
      s"""$viewCte,
         |ann AS (SELECT i.split AS split, a.category_id
         |        FROM annotations a JOIN images i ON a.image_id = i.id)
         |SELECT s.split, c.category_id, coalesce(n.count, 0) AS count
         |FROM (SELECT DISTINCT split FROM ann) s
         |CROSS JOIN (SELECT DISTINCT category_id FROM ann) c
         |LEFT JOIN (SELECT split, category_id, count(*) AS count
         |           FROM ann GROUP BY split, category_id) n
         |  ON n.split IS NOT DISTINCT FROM s.split
         | AND n.category_id = c.category_id""".stripMargin
  )
}
