package graft.queries

import graft.Tables
import graft.model.GraftDataset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The FULL-LENGTH detection-dataset pipeline (q193) — the reference's own
  * core workflow (dataset ingest → validation → class remap → box capping →
  * invalid-annotation filtering → constrained balanced split → greedy
  * matching → PR/AP → confusion matrix; reference flow `dataset.py:4384-4681`
  * + `detection_evaluator.py:382-682`), composed end-to-end from the
  * individually gated operators and verified by ONE DuckDB oracle statement —
  * the detection-side sibling of q192's corpus-build chain. Per-operator
  * gates (q56, q78, q09, q18, q12, q27, q22, q23, q58) cannot catch the bugs
  * that only appear at length: a stage reading a column an earlier stage
  * rewrote, cap/filter order inversions, split labels not propagating into
  * the evaluator's frames, label-map drift through a remap.
  *
  * Construction (the q58/q22 forced-matching technique, threaded through the
  * WHOLE chain so each stage's effect stays analytically derivable):
  *  - gt boxes are disjoint per image (x = rn·100000, 50×50), so the greedy
  *    matcher's assignment is determined regardless of confidence order;
  *  - every 13th annotation is planted with width −5: capping clamps it to
  *    width 0 and the invalid filter must then drop it (cap BEFORE filter —
  *    the order the reference flow uses, and an order bug flips the gate);
  *  - every 4th image gets height 30: capping clamps every one of its boxes'
  *    heights 50 → 30 UNIFORMLY, which provably leaves all IoUs unchanged
  *    ((50−dx)·h / ((50+dx)·h) is h-free) — the cap is exercised and its
  *    effect verified through the gt_area report rows, while the matching
  *    analytics stay exact;
  *  - class remap merges category 6 into 5 before any evaluation;
  *  - the balanced split reuses q27's forced-greedy construction (groups 0-9
  *    pre-train ≈10%, 10-89 pre-valid ≈80%, targets 0.8/0.2 → every free
  *    group wins train), and the evaluation runs on the VALID side only;
  *  - model "m" predicts shifted boxes (dx = (id%5)·5, same label) — the
  *    q22/q23 matching + PR/AP analytics; model "m2" predicts exact boxes
  *    with labels flipped by id%2 — the q58 confusion analytics. Both are
  *    built FROM the post-stage surviving gt, so every upstream drop
  *    propagates into the eval numbers.
  *
  * Output: one report frame (metric, k1, k2, v) with the per-group split
  * assignment, per-category match counts, per-category AP, the row-normalized
  * confusion matrix, and per-category capped-gt-area sums. All v are exact
  * ratios of small integers (round 6), so the hash compare is
  * engine-portable.
  *
  * Ingest is the parquet roundtrip (q56's native format — the distributed
  * ingest path; COCO's single-JSON ingest is q41-gated and not a 100-TB
  * format by definition). Scale: the same chain runs as the
  * `detection_eval_e2e` probe in [[graft.Scale]] at sf0.1→sf1 under the
  * straggler gate.
  */
object DetectionPipelineQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  /** The whole chain as a library composition — shared by the q193 gate and
    * the Scale probe. */
  def detectionEvalChain(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("image_id").orderBy("id")
    // fabricated gt over the view: disjoint 50×50 boxes; invalid plants
    val annFab = Tables.annotationsView(s, d)
      .select(col("id"), col("image_id"), col("category_id"))
      .withColumn("rn", row_number().over(w))
      .select(col("id"), col("image_id"), col("category_id"),
        (col("rn").cast("double") * 100000.0).as("box_x_min"),
        lit(0.0).as("box_y_min"),
        when(col("id") % 13 === 9, -5.0).otherwise(50.0).as("box_width"),
        lit(50.0).as("box_height"))
    // fabricated dims: height 30 on every 4th image (cap bites uniformly)
    val imgFab = Tables.imagesView(s, d).select(col("id"),
      lit(2000000000).cast("int").as("width"),
      when(col("id") % 4 === 0, 30).otherwise(1000000).cast("int").as("height"),
      col("relative_path"), col("type"),
      lit(null).cast("string").as("split"))
    // stage 1: INGEST — native parquet roundtrip (to_parquet → from_parquet)
    val tmp = java.nio.file.Files.createTempDirectory("graft_det_e2e").toString
    graft.io.ParquetIO.write(
      GraftDataset.create(imgFab, annFab, Tables.viewLabelMap,
        imagesRoot = d, datasetName = Some("det_e2e")),
      tmp, overwrite = true)
    val ingested = graft.io.ParquetIO.read(s, tmp)
    // stage 2: VALIDATE — duplicate ids, FK integrity, label-map coverage
    val checked = ingested.validated()
    // stage 3: REMAP — merge category 6 into 5 (label space becomes 0..5)
    val remapped = graft.operators.Remap.remapClasses(checked,
      (0 to 6).map(i => i -> math.min(i, 5)).toMap,
      newNames = Map(5 -> "cat_5"))
    // stage 4: CAP boxes to image bounds (zeroes the w = −5 plants, clamps
    // heights on the small images); stage 5: FILTER invalid annotations
    val capped = graft.functions.Bbox.capBoxes(remapped)
    val filtered = graft.operators.Locators.removeInvalidAnnotations(capped)
    // stage 6: BALANCED SPLIT (q27's forced-greedy construction)
    val pre = when(col("id") % 100 < 10, "train")
      .when(col("id") % 100 < 90, "valid")
      .otherwise(lit(null).cast("string"))
    val grouped = filtered.copy(images = filtered.images
      .withColumn("customer_group", (col("id") % 100).cast("string"))
      .withColumn("split", pre))
    val splitDs0 = graft.split.Splitter.split(grouped, seed = 42,
      Seq("train", "valid"), Seq(0.8, 0.2),
      keepSeparate = Seq("customer_group"))
    // FENCE the split images once: consumed by the split-count report AND
    // (through withSplitPropagated) the whole evaluation side
    val splitDs = splitDs0.copy(images = splitDs0.images.localCheckpoint())
    val splitCounts = splitDs.images
      .groupBy(col("customer_group"), col("split"))
      .agg(count(lit(1)).as("n"))
      .select(lit("split_count").as("metric"), col("customer_group").as("k1"),
        col("split").as("k2"), col("n").cast("double").as("v"))
    // evaluation runs on the VALID side (split propagated onto annotations).
    // FENCE (the q192 stage-fencing discipline, guide §1.2 "don't compute
    // things twice"): gt and the valid images fan out into SIX downstream
    // report branches (both models' predictions, the matcher, the
    // evaluator's PR/AP and confusion runs, the area report) that the
    // final union would otherwise each re-derive through ingest →
    // validate → remap → cap → filter → split — the checkpoint runs that
    // chain ONCE and hands every branch a materialized leaf (it also
    // keeps the final plan linear instead of six copies of the chain).
    val valid = graft.operators.Locators.getSplit(
      splitDs.withSplitPropagated, Some("valid"))
    val validImages = valid.images.localCheckpoint()
    val gt = valid.annotations.select(col("id"), col("image_id"),
      col("category_id"), col("box_x_min"), col("box_y_min"),
      col("box_width"), col("box_height")).localCheckpoint()
    // stage 7: MODEL PREDICTIONS from the surviving gt — model "m" (shifted
    // boxes, same label: matching/PR analytics), model "m2" (exact boxes,
    // flipped label: confusion analytics), shared far-offset false preds
    val conf = (col("id") % 97).cast("double") / 96.0
    val falsePreds = gt.filter(col("id") % 5 === 0).select(
      (col("id") * 2 + 1).as("id"), col("image_id"), col("category_id"),
      (col("box_x_min") + 50000000.0).as("box_x_min"), col("box_y_min"),
      col("box_width"), col("box_height"), lit(0.4).as("confidence"))
    val mPreds = gt.filter(col("id") % 3 =!= 0).select(
      (col("id") * 2).as("id"), col("image_id"), col("category_id"),
      (col("box_x_min") + (col("id") % 5).cast("double") * 5.0).as("box_x_min"),
      col("box_y_min"), col("box_width"), col("box_height"),
      conf.as("confidence")).unionByName(falsePreds)
    val m2Preds = gt.filter(col("id") % 3 =!= 0).select(
      (col("id") * 2).as("id"), col("image_id"),
      ((col("category_id") + col("id") % 2) % 6).cast("int").as("category_id"),
      col("box_x_min"), col("box_y_min"), col("box_width"), col("box_height"),
      conf.as("confidence")).unionByName(falsePreds)
    // stages 8-10: MATCH, PR/AP, CONFUSION through the real evaluator
    val matches = graft.eval.Matching.computeMatches(gt, mPreds, minIou = 0.5)
      .toDF()
    val nMatches = matches
      .filter(col("prediction_id").isNotNull && col("groundtruth_id").isNotNull)
      .groupBy(col("category_id")).agg(count(lit(1)).as("n"))
      .select(lit("n_matches").as("metric"),
        concat(lit("cat_"), col("category_id")).as("k1"), lit("").as("k2"),
        col("n").cast("double").as("v"))
    val ev = new graft.eval.DetectionEvaluator(validImages, gt,
      Map("m" -> mPreds, "m2" -> m2Preds), remapped.labelMap)
    val (_, ap) = ev.precisionRecall("m", minIou = 0.5)
    val apRows = ap.select(lit("ap").as("metric"), col("category_str").as("k1"),
      lit("").as("k2"), round(col("AP"), 6).as("v"))
    val confRows = ev.confusionMatrix("m2", minIou = 0.5)
      .select(lit("confusion").as("metric"), col("groundtruth_label").as("k1"),
        col("prediction_label").as("k2"), round(col("share"), 6).as("v"))
    // capped-area report: pins remap+cap+filter+split numerically
    val areaRows = gt
      .groupBy(col("category_id"))
      .agg(sum(col("box_width") * col("box_height")).as("a"))
      .select(lit("gt_area").as("metric"),
        concat(lit("cat_"), col("category_id")).as("k1"), lit("").as("k2"),
        round(col("a"), 6).as("v"))
    splitCounts.unionByName(nMatches).unionByName(apRows)
      .unionByName(confRows).unionByName(areaRows)
  }

  val defs: Map[String, Q] = Map(
    "q193_detection_eval_e2e" -> ((s, d) => detectionEvalChain(s, d))
  )

  // ---- the one-statement oracle ------------------------------------------

  import Tables.viewCte

  val oracles: Map[String, String] = Map(
    "q193_detection_eval_e2e" ->
      s"""$viewCte,
         |-- fabricated gt (rn = per-image row number) + fabricated dims
         |base AS MATERIALIZED (
         |  SELECT id, image_id, category_id,
         |         row_number() OVER (PARTITION BY image_id ORDER BY id) AS rn
         |  FROM annotations),
         |imgfab AS MATERIALIZED (
         |  SELECT id, CASE WHEN id % 4 = 0 THEN 30 ELSE 1000000 END AS height
         |  FROM images),
         |-- remap (6→5) + cap (h := min(50, height); w = −5 plants cap to 0)
         |-- + invalid filter (w > 0) + the valid split side (groups 10-89;
         |-- 0-9 pre-train, 90-99 forced-greedy train per the q27 analysis)
         |gt0 AS MATERIALIZED (
         |  SELECT b.id, b.image_id,
         |         CASE WHEN b.category_id = 6 THEN 5 ELSE b.category_id END AS c,
         |         CASE WHEN i.height < 50 THEN CAST(i.height AS DOUBLE)
         |              ELSE 50.0 END AS h,
         |         CASE WHEN b.id % 13 = 9 THEN 0.0 ELSE 50.0 END AS w
         |  FROM base b JOIN imgfab i ON i.id = b.image_id),
         |survive AS MATERIALIZED (
         |  SELECT * FROM gt0
         |  WHERE w > 0 AND image_id % 100 >= 10 AND image_id % 100 < 90),
         |-- per-group split assignment (forced greedy: free groups win train)
         |splitc AS MATERIALIZED (
         |  SELECT CAST(id % 100 AS VARCHAR) AS k1,
         |         CASE WHEN id % 100 >= 10 AND id % 100 < 90
         |              THEN 'valid' ELSE 'train' END AS k2,
         |         CAST(count(*) AS DOUBLE) AS v
         |  FROM images GROUP BY 1, 2),
         |-- greedy matches (model m): pred exists (id%3≠0) and IoU > 0.5 (id%5≠4)
         |nmatch AS MATERIALIZED (
         |  SELECT 'cat_' || CAST(c AS VARCHAR) AS k1, CAST(count(*) AS DOUBLE) AS v
         |  FROM survive WHERE id % 3 <> 0 AND id % 5 <> 4 GROUP BY 1),
         |-- capped gt area per category
         |area AS MATERIALIZED (
         |  SELECT 'cat_' || CAST(c AS VARCHAR) AS k1, round(sum(w * h), 6) AS v
         |  FROM survive GROUP BY 1),
         |-- PR/AP over the surviving gt (the q23 oracle pattern)
         |rows_ AS MATERIALIZED (
         |  SELECT c AS category_id,
         |         CASE WHEN id%3 <> 0 THEN CAST(id%97 AS DOUBLE)/96.0
         |              ELSE 0.0 END AS confidence,
         |         CASE WHEN id%3 <> 0
         |              THEN (50.0 - (id%5)*5) / (50.0 + (id%5)*5)
         |              ELSE 0.0 END AS iou,
         |         TRUE AS groundtruth
         |  FROM survive
         |  UNION ALL
         |  SELECT c, 0.4, 0.0, FALSE FROM survive WHERE id%5 = 0),
         |bins AS MATERIALIZED (
         |  SELECT category_id, confidence,
         |         sum(CASE WHEN groundtruth AND iou > 0.5 THEN 1 ELSE 0 END) AS tp,
         |         count(*) AS n,
         |         sum(CASE WHEN groundtruth THEN 1 ELSE 0 END) AS gt
         |  FROM rows_ GROUP BY 1, 2),
         |raw AS MATERIALIZED (
         |  SELECT category_id,
         |         sum(tp) OVER cw AS cum_tp, sum(n) OVER cw AS cum_n,
         |         sum(gt) OVER (PARTITION BY category_id) AS n_targets,
         |         row_number() OVER cw AS pos
         |  FROM bins
         |  WINDOW cw AS (PARTITION BY category_id ORDER BY confidence DESC)),
         |rawpts AS MATERIALIZED (
         |  SELECT category_id, pos,
         |         CAST(cum_tp AS DOUBLE)/cum_n AS prec,
         |         CAST(cum_tp AS DOUBLE)/n_targets AS rec
         |  FROM raw),
         |ext AS MATERIALIZED (SELECT category_id, max(pos) AS mx FROM rawpts GROUP BY 1),
         |curve AS MATERIALIZED (
         |  SELECT category_id, pos, prec, rec FROM rawpts
         |  UNION ALL SELECT category_id, -2, 1.0, 0.0 FROM ext
         |  UNION ALL SELECT category_id, -1, prec, 0.0 FROM rawpts WHERE pos = 1
         |  UNION ALL
         |  SELECT e.category_id, e.mx + 1, 0.0, r.rec
         |  FROM ext e JOIN rawpts r ON r.category_id = e.category_id AND r.pos = e.mx
         |  UNION ALL SELECT category_id, mx + 2, 0.0, 1.0 FROM ext),
         |runmax AS MATERIALIZED (
         |  SELECT category_id, rec,
         |         max(prec) OVER (PARTITION BY category_id ORDER BY pos
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS prec
         |  FROM curve),
         |recbins AS MATERIALIZED (SELECT CAST(k AS DOUBLE)/100.0 AS rb FROM range(0, 101) t(k)),
         |binpts AS MATERIALIZED (
         |  SELECT r.category_id, b.rb, min(r.prec) AS prec
         |  FROM runmax r JOIN recbins b ON r.rec <= b.rb
         |  GROUP BY 1, 2),
         |apc AS MATERIALIZED (
         |  SELECT category_id, sum(prec * dr) AS ap
         |  FROM (SELECT category_id, prec,
         |               rb - coalesce(lag(rb) OVER (PARTITION BY category_id
         |                 ORDER BY rb), rb) AS dr
         |        FROM binpts) GROUP BY 1),
         |-- confusion over model m2 (the q58 oracle pattern, label space 0..5)
         |pairs AS MATERIALIZED (
         |  SELECT 'cat_' || CAST(c AS VARCHAR) AS g,
         |         'cat_' || CAST((c + id % 2) % 6 AS VARCHAR) AS p
         |  FROM survive WHERE id % 3 <> 0
         |  UNION ALL
         |  SELECT 'cat_' || CAST(c AS VARCHAR) AS g, 'None' AS p
         |  FROM survive WHERE id % 3 = 0
         |  UNION ALL
         |  SELECT 'None' AS g, 'cat_' || CAST(c AS VARCHAR) AS p
         |  FROM survive WHERE id % 5 = 0),
         |confm AS MATERIALIZED (
         |  SELECT g AS k1, p AS k2,
         |         round(count(*) / sum(count(*)) OVER (PARTITION BY g), 6) AS v
         |  FROM pairs GROUP BY g, p)
         |SELECT 'split_count' AS metric, k1, k2, v FROM splitc
         |UNION ALL SELECT 'n_matches', k1, '', v FROM nmatch
         |UNION ALL SELECT 'gt_area', k1, '', v FROM area
         |UNION ALL SELECT 'ap', 'cat_' || CAST(category_id AS VARCHAR), '',
         |                 round(ap, 6) FROM apc
         |UNION ALL SELECT 'confusion', k1, k2, v FROM confm""".stripMargin
  )
}
