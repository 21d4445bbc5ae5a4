package graft.queries

import graft.Tables
import graft.eval.{DetectionEvaluator, Matching}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the evaluation engine (SURVEY §2.11).
  *
  * The greedy matcher and PR/AP kernels are not SQL-expressible → rows-only
  * driver checks (their exact semantics are locked by MatcherFidelitySpec /
  * PrCurveSpec against the reference kernels). The count-error metric IS
  * pure relational algebra → full DuckDB oracle.
  */
object EvalQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic synthetic predictions over the dataset view: boxes
    * jittered by category-dependent offsets, confidence from partkey. */
  private def predsView(s: SparkSession, d: String): DataFrame =
    Tables.annotationsView(s, d).select(
      (col("id") + 1000000000L).as("id"),
      col("image_id"), col("category_id"),
      (col("box_x_min") + col("category_id") * 2).as("box_x_min"),
      (col("box_y_min") + 3.0).as("box_y_min"),
      col("box_width"), col("box_height"),
      (col("id") % 97).cast("double") / 96.0 as "confidence")

  val defs: Map[String, Q] = Map(
    // §2.11 greedy bipartite matching (rows-only; fidelity locked in tests)
    "q22_matches" -> ((s, d) => {
      Matching.computeMatches(
        Tables.annotationsView(s, d), predsView(s, d), minIou = 0.3)
        .toDF()
        .groupBy(col("category_id"))
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("prediction_id").isNotNull && col("groundtruth_id").isNotNull, 1L)
            .otherwise(0L)).as("n_matched"),
          round(sum(col("iou")), 4).as("iou_sum"))
    }),

    // §2.11 PR/AP per category (rows-only; numerics locked in tests)
    "q23_pr_ap" -> ((s, d) => {
      val ev = new DetectionEvaluator(
        Tables.imagesView(s, d), Tables.annotationsView(s, d),
        Map("m" -> predsView(s, d)), Tables.viewLabelMap)
      val (_, ap) = ev.precisionRecall("m", minIou = 0.3)
      ap.select(col("category_id"), col("category_str"), round(col("AP"), 6).as("ap"))
    }),

    // §2.5 row-normalized confusion matrix — FULL DuckDB oracle via a
    // forced-matching construction: every box is disjoint within its image
    // (x = 100·row_number), predictions reuse their gt's box exactly, so
    // the greedy matcher's assignment is analytically determined (IoU is 1
    // on the diagonal, 0 elsewhere, minIou=0.5) and the matrix reduces to
    // relational algebra both engines can compute. gt ids ≡ 0 (mod 3) get
    // no prediction → (gt_label, 'None'); ids ≡ 0 (mod 5) also emit a
    // far-offset false prediction → ('None', pred_label).
    "q58_confusion_matrix" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("image_id").orderBy("id")
      val based = Tables.annotationsView(s, d)
        .select(col("id"), col("image_id"), col("category_id"))
        .withColumn("rn", row_number().over(w))
      def box(x: org.apache.spark.sql.Column) = Seq(
        x.cast("double").as("box_x_min"), lit(0.0).as("box_y_min"),
        lit(50.0).as("box_width"), lit(50.0).as("box_height"))
      val gt = based.select(
        (Seq(col("id"), col("image_id"), col("category_id")) ++
          box(col("rn") * 100)): _*)
      val matchedPreds = based.filter(col("id") % 3 =!= 0).select(
        (Seq((col("id") * 2).as("id"), col("image_id"),
          ((col("category_id") + col("id") % 2) % 7).cast("int").as("category_id")) ++
          box(col("rn") * 100) :+
          ((col("id") % 97).cast("double") / 96.0).as("confidence")): _*)
      val falsePreds = based.filter(col("id") % 5 === 0).select(
        (Seq((col("id") * 2 + 1).as("id"), col("image_id"), col("category_id")) ++
          box(col("rn") * 100 + 10000000) :+
          lit(0.4).as("confidence")): _*)
      val ev = new DetectionEvaluator(
        Tables.imagesView(s, d), gt,
        Map("m" -> matchedPreds.unionByName(falsePreds)), Tables.viewLabelMap)
      ev.confusionMatrix("m", minIou = 0.5)
        .select(col("groundtruth_label"), col("prediction_label"),
          round(col("share"), 6).as("share"))
    }),

    // §2.5/§2.11 count-error metrics — fully relational, DuckDB oracle
    "q24_count_error" -> ((s, d) => {
      val ev = new DetectionEvaluator(
        Tables.imagesView(s, d), Tables.annotationsView(s, d),
        Map("m" -> predsView(s, d)), Tables.viewLabelMap)
      ev.countError("m", Array(0.0, 0.25, 0.5, 0.75, 1.0))
        .select(col("category_id"), col("confidence_threshold"),
          round(col("MAE"), 4).as("mae"), round(col("RMSE"), 4).as("rmse"))
    })
  )

  import Tables.viewCte

  val oracles: Map[String, String] = Map(
    // replicates the forced-matching construction: the greedy matcher is
    // fully determined (diagonal IoU 1, off-diagonal 0), so the matrix is
    // pure counting + a row-normalizing window in both engines
    "q58_confusion_matrix" ->
      s"""$viewCte,
         |pairs AS (
         |  SELECT 'cat_' || CAST(category_id AS VARCHAR) AS g,
         |         'cat_' || CAST((category_id + id % 2) % 7 AS VARCHAR) AS p
         |  FROM annotations WHERE id % 3 <> 0
         |  UNION ALL
         |  SELECT 'cat_' || CAST(category_id AS VARCHAR) AS g, 'None' AS p
         |  FROM annotations WHERE id % 3 = 0
         |  UNION ALL
         |  SELECT 'None' AS g, 'cat_' || CAST(category_id AS VARCHAR) AS p
         |  FROM annotations WHERE id % 5 = 0)
         |SELECT g AS groundtruth_label, p AS prediction_label,
         |       round(count(*) / sum(count(*)) OVER (PARTITION BY g), 6) AS share
         |FROM pairs GROUP BY g, p""".stripMargin,

    "q24_count_error" ->
      s"""$viewCte,
         |preds AS (
         |  SELECT l_orderkey AS image_id, CAST(l_partkey % 7 AS INT) AS category_id,
         |         CAST(((((l_orderkey*8+l_linenumber)*100000+l_partkey)*10000
         |               +l_suppkey)*100 + CAST(l_quantity AS BIGINT)%100) % 97
         |              AS DOUBLE) / 96.0 AS confidence
         |  FROM lineitem),
         |bins(t) AS (VALUES (0.0),(0.25),(0.5),(0.75),(1.0)),
         |pc AS (SELECT category_id, image_id, t,
         |              sum(CASE WHEN confidence >= t THEN 1 ELSE 0 END) AS cnt
         |       FROM preds CROSS JOIN bins GROUP BY 1,2,3),
         |gc AS (SELECT category_id, image_id, count(*) AS gt_count
         |       FROM annotations GROUP BY 1,2),
         |j AS (SELECT pc.category_id, pc.t,
         |             pc.cnt - coalesce(gc.gt_count, 0) AS err
         |      FROM pc LEFT JOIN gc
         |        ON pc.category_id = gc.category_id AND pc.image_id = gc.image_id)
         |SELECT category_id, t AS confidence_threshold,
         |       round(avg(abs(err)), 4) AS mae,
         |       round(sqrt(avg(CAST(err*err AS DOUBLE))), 4) AS rmse
         |FROM j GROUP BY 1, 2""".stripMargin
  )
}
