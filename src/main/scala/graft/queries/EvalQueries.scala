package graft.queries

import graft.Tables
import graft.eval.{DetectionEvaluator, Matching}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the evaluation engine (SURVEY §2.11).
  *
  * The greedy matcher and PR/AP kernels run here on a *forced-matching
  * construction* (the q58 technique): every gt box is disjoint within its
  * image (x = 100000·row_number), each prediction reuses exactly one gt's box
  * shifted right by dx = (id mod 5)·5, so every prediction overlaps exactly
  * one groundtruth and the greedy matcher's assignment is analytically
  * determined regardless of confidence order. The IoU of two 50×50 boxes
  * shifted by dx is (50−dx)·50 / (5000−(50−dx)·50) — a ratio of small exact
  * integers, so the kernel's double division is bit-identical to the SQL
  * oracle's. That turns the match table (q22) AND the whole PR/AP pipeline
  * over it (q23) into relational algebra DuckDB can replicate. The kernels'
  * behavior on *ambiguous* overlaps (the part the construction bypasses) is
  * locked by MatcherFidelitySpec / PrCurveSpec against the reference
  * semantics (util.py:98-321).
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

  /** Forced-matching fixture: disjoint gt boxes; one shifted prediction per
    * gt with id%3≠0 (dx = (id%5)·5 ∈ {0,5,10,15,20} ⇒ IoU ∈ {1, 45/55,
    * 40/60, 35/65, 30/70}); one far-offset false prediction per gt with
    * id%5=0. Prediction ids 2·id / 2·id+1 keep both sides collision-free. */
  private def forcedSetup(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("image_id").orderBy("id")
    val based = Tables.annotationsView(s, d)
      .select(col("id"), col("image_id"), col("category_id"))
      .withColumn("rn", row_number().over(w))
    def box(x: org.apache.spark.sql.Column) = Seq(
      x.cast("double").as("box_x_min"), lit(0.0).as("box_y_min"),
      lit(50.0).as("box_width"), lit(50.0).as("box_height"))
    val base = col("rn").cast("long") * 100000L
    val gt = based.select(
      (Seq(col("id"), col("image_id"), col("category_id")) ++ box(base)): _*)
    val matched = based.filter(col("id") % 3 =!= 0).select(
      (Seq((col("id") * 2).as("id"), col("image_id"), col("category_id")) ++
        box(base + (col("id") % 5) * 5) :+
        ((col("id") % 97).cast("double") / 96.0).as("confidence")): _*)
    val falsePreds = based.filter(col("id") % 5 === 0).select(
      (Seq((col("id") * 2 + 1).as("id"), col("image_id"), col("category_id")) ++
        box(base + 50000000L) :+ lit(0.4).as("confidence")): _*)
    (gt, matched.unionByName(falsePreds))
  }

  val defs: Map[String, Q] = Map(
    // §2.11 greedy bipartite matching — FULL DuckDB oracle via the forced
    // construction: at minIou=0.5, dx≤15 pairs match (IoU ≥ 35/65 > 0.5),
    // dx=20 (30/70) and the far false predictions stay unmatched. Output is
    // the complete match table (every prediction row + every unmatched gt).
    "q22_matches" -> ((s, d) => {
      val (gt, preds) = forcedSetup(s, d)
      Matching.computeMatches(gt, preds, minIou = 0.5)
        .toDF()
        .select(col("image_id"), col("category_id"), col("prediction_id"),
          col("groundtruth_id"), round(col("iou"), 6).as("iou"))
    }),

    // §2.11 PR/AP per category — FULL DuckDB oracle. Runs the real evaluator
    // end to end (match at minIou=0, results assembly, per-confidence
    // compression, endpoint padding, reverse running-max precision, 101-bin
    // ffill reindex, right-Riemann AP); the construction makes every
    // intermediate an exact ratio of integers the oracle reproduces.
    //
    // Round-9 divergence hunt: this gate (with q58/q15) used to mismatch
    // its oracle at sf0.001 ONLY. Root cause was neither the kernel nor
    // the oracle's math but a DUPLICATE minted annotation id (the smoke
    // lineitem ships one fully-duplicated natural key), which fanned the
    // results assembly's id-keyed joins 2×2. Fixed at the source — the
    // view id now folds in a quantity digit (Tables.annotationsView) —
    // and guarded: the evaluator now refuses duplicate prediction ids.
    // All three gates are oracle-exact at every shipped scale factor.
    "q23_pr_ap" -> ((s, d) => {
      val (gt, preds) = forcedSetup(s, d)
      val ev = new DetectionEvaluator(
        Tables.imagesView(s, d), gt, Map("m" -> preds), Tables.viewLabelMap)
      val (_, ap) = ev.precisionRecall("m", minIou = 0.5)
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
    // the forced construction pins the greedy matcher's output analytically:
    // matched pair ⇔ id%3≠0 ∧ id%5≠4, with IoU (50−dx)/(50+dx) — the same
    // real quotient the kernel's inter/union division computes, hence
    // bit-identical doubles
    "q22_matches" ->
      s"""$viewCte
         |SELECT image_id, category_id, id*2 AS prediction_id,
         |       id AS groundtruth_id,
         |       round((50.0 - (id%5)*5) / (50.0 + (id%5)*5), 6) AS iou
         |FROM annotations WHERE id%3 <> 0 AND id%5 <> 4
         |UNION ALL
         |SELECT image_id, category_id, id*2, CAST(NULL AS BIGINT), 0.0
         |FROM annotations WHERE id%3 <> 0 AND id%5 = 4
         |UNION ALL
         |SELECT image_id, category_id, id*2+1, CAST(NULL AS BIGINT), 0.0
         |FROM annotations WHERE id%5 = 0
         |UNION ALL
         |SELECT image_id, category_id, CAST(NULL AS BIGINT), id, 0.0
         |FROM annotations WHERE id%3 = 0 OR id%5 = 4""".stripMargin,

    // replicates the full PR/AP pipeline over the forced matches. Key
    // identity: after the reverse running-max, precision is non-increasing
    // along the curve while recall is non-decreasing, so the reference's
    // "dedup recall keep-last + ffill onto 101 bins" equals
    // min(precision) over curve points with recall ≤ bin. AP then sums
    // precision · Δrecall over the reindexed (distinct-recall) points.
    "q23_pr_ap" ->
      s"""$viewCte,
         |rows AS (
         |  SELECT category_id,
         |         CASE WHEN id%3 <> 0 THEN CAST(id%97 AS DOUBLE)/96.0
         |              ELSE 0.0 END AS confidence,
         |         CASE WHEN id%3 <> 0
         |              THEN (50.0 - (id%5)*5) / (50.0 + (id%5)*5)
         |              ELSE 0.0 END AS iou,
         |         TRUE AS groundtruth
         |  FROM annotations
         |  UNION ALL
         |  SELECT category_id, 0.4, 0.0, FALSE
         |  FROM annotations WHERE id%5 = 0),
         |bins AS (
         |  SELECT category_id, confidence,
         |         sum(CASE WHEN groundtruth AND iou > 0.5 THEN 1 ELSE 0 END) AS tp,
         |         count(*) AS n,
         |         sum(CASE WHEN groundtruth THEN 1 ELSE 0 END) AS gt
         |  FROM rows GROUP BY 1, 2),
         |raw AS (
         |  SELECT category_id,
         |         sum(tp) OVER cw AS cum_tp, sum(n) OVER cw AS cum_n,
         |         sum(gt) OVER (PARTITION BY category_id) AS n_targets,
         |         row_number() OVER cw AS pos
         |  FROM bins
         |  WINDOW cw AS (PARTITION BY category_id ORDER BY confidence DESC)),
         |rawpts AS (
         |  SELECT category_id, pos,
         |         CAST(cum_tp AS DOUBLE)/cum_n AS prec,
         |         CAST(cum_tp AS DOUBLE)/n_targets AS rec
         |  FROM raw),
         |ext AS (SELECT category_id, max(pos) AS mx FROM rawpts GROUP BY 1),
         |curve AS (
         |  SELECT category_id, pos, prec, rec FROM rawpts
         |  UNION ALL SELECT category_id, -2, 1.0, 0.0 FROM ext
         |  UNION ALL SELECT category_id, -1, prec, 0.0 FROM rawpts WHERE pos = 1
         |  UNION ALL
         |  SELECT e.category_id, e.mx + 1, 0.0, r.rec
         |  FROM ext e JOIN rawpts r ON r.category_id = e.category_id AND r.pos = e.mx
         |  UNION ALL SELECT category_id, mx + 2, 0.0, 1.0 FROM ext),
         |runmax AS (
         |  SELECT category_id, rec,
         |         max(prec) OVER (PARTITION BY category_id ORDER BY pos
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS prec
         |  FROM curve),
         |recbins AS (SELECT CAST(k AS DOUBLE)/100.0 AS rb FROM range(0, 101) t(k)),
         |binpts AS (
         |  SELECT r.category_id, b.rb, min(r.prec) AS prec
         |  FROM runmax r JOIN recbins b ON r.rec <= b.rb
         |  GROUP BY 1, 2),
         |ap AS (
         |  SELECT category_id, sum(prec * dr) AS ap
         |  FROM (SELECT category_id, prec,
         |               rb - coalesce(lag(rb) OVER (PARTITION BY category_id
         |                 ORDER BY rb), rb) AS dr
         |        FROM binpts) GROUP BY 1)
         |SELECT category_id, 'cat_' || CAST(category_id AS VARCHAR) AS category_str,
         |       round(ap, 6) AS ap
         |FROM ap""".stripMargin,
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
         |  -- derive from the shared annotations CTE (not an inlined id
         |  -- formula) so an id-minting change can never desynchronize
         |  -- this oracle from predsView again
         |  SELECT image_id, category_id,
         |         CAST(id % 97 AS DOUBLE) / 96.0 AS confidence
         |  FROM annotations),
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
