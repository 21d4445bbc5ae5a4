package graft

import graft.io.Coco
import graft.eval.Matching
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end parity against the REFERENCE'S OWN stored COCO fixtures
  * (test_lours/test_data/coco_dataset/, the pair used by its
  * test_evaluation/test_matches.py pycocotools-equivalence suite):
  * load both files through our COCO reader, run our matcher, and assert
  * the exact (prediction_id, groundtruth_id, iou) triples the reference
  * matcher produces on the same input (generated offline via
  * tools/ref_pr_oracle.py machinery). Guarded: skips if the read-only
  * reference tree is absent. */
class ReferenceFixtureSpec extends SparkFunSuite {

  private val base = "/root/reference/test_lours/test_data/coco_dataset"
  private def available = new java.io.File(s"$base/annotations_valid_random.json").isFile

  private def load() = {
    val gt = Coco.fromCoco(spark, s"$base/annotations_valid_random.json")
    val pr = Coco.fromCoco(spark, s"$base/predictions_valid_random.json")
    (gt, pr)
  }

  private def run(minIou: Double): Seq[(Long, Long, Double)] = {
    val (gt, pr) = load()
    Matching.computeMatches(gt.annotations, pr.annotations, minIou).collect()
      .map(r => (r.prediction_id.getOrElse(-1L), r.groundtruth_id.getOrElse(-1L),
        math.rint(r.iou * 1e6) / 1e6))
      .sortBy(t => (t._1, t._2)).toSeq
  }

  test("loads the reference fixture pair through fromCoco") {
    assume(available)
    val (gt, pr) = load()
    assert(gt.numImages == 2 && gt.numAnnotations == 21)
    assert(pr.numAnnotations == 21)
    assert(pr.annotations.columns.contains("confidence")) // score renamed
  }

  test("matcher reproduces the reference's triples on its own fixtures (min_iou=0)") {
    assume(available)
    val m = run(0.0)
    assert(m.length == 24)
    assert(m.count(t => t._1 >= 0 && t._2 >= 0) == 18)
    assert(math.abs(m.map(_._3).sum - 4.924571) < 1e-5)
    // spot-check exact triples incl. the low-IoU greedy leftovers
    assert(m.contains((17838L, 35802L, 0.648416)))
    assert(m.contains((92133L, 1640282L, 0.009684)))
    assert(m.contains((97248L, 2146194L, 0.00141)))
    assert(m.contains((-1L, 34646L, 0.0)))
  }

  test("matcher reproduces the reference's triples at min_iou=0.5") {
    assume(available)
    val m = run(0.5)
    assert(m.length == 40)
    val matched = m.filter(t => t._1 >= 0 && t._2 >= 0)
    assert(matched == Seq((17838L, 35802L, 0.648416), (42968L, 1669970L, 0.509091)))
  }

  test("keypoints fixture loads as zero-size point boxes") {
    assume(new java.io.File(s"$base/annotations_keypoints.json").isFile)
    val ds = graft.io.CocoKeypoints.fromCocoKeypoints(spark, s"$base/annotations_keypoints.json")
    assert(ds.numAnnotations > 0)
    import org.apache.spark.sql.functions._
    assert(ds.annotations.filter(col("box_width") =!= 0.0).count() == 0)
  }

  test("empty and no-labelmap fixture variants load without error") {
    assume(available)
    val empty = Coco.fromCoco(spark, s"$base/annotations_empty.json")
    assert(empty.numAnnotations == 0 && empty.numImages > 0)
    val noLm = Coco.fromCoco(spark, s"$base/annotations_no_labelmap.json")
    val completed = noLm.withCompletedLabelMap()
    assert(completed.labelMap.nonEmpty || noLm.numAnnotations == 0)
  }

  test("AP on the reference's random fixture matches its own kernels (3 ious)") {
    // Golden values computed by tools/ref_ap_golden.py, which runs the
    // REFERENCE'S OWN construct_matches_df + pr_curve +
    // compute_average_precision (evaluation/detection/util.py) with the
    // evaluator's exact orchestration (detection_evaluator.py:554-650) on
    // this same fixture pair — the stored-fixture AP loop test_pr.py:14-41
    // drives through pycocotools.
    assume(available)
    val (gt, pr) = load()
    val ev = new graft.eval.DetectionEvaluator(
      gt.images, gt.annotations, Map("m" -> pr.annotations), gt.labelMap)
    val golden = Map( // (category_id, iou) -> reference AP
      (0, 0.0) -> 0.953636364, (1, 0.0) -> 0.720000000,
      (0, 0.2) -> 0.456666667, (1, 0.2) -> 0.477000000,
      (0, 0.5) -> 0.000000000, (1, 0.5) -> 0.090000000)
    for (iou <- Seq(0.0, 0.2, 0.5)) {
      val (_, ap) = ev.precisionRecall("m", minIou = iou)
      val got = ap.select("category_id", "AP").collect()
        .map(r => r.getInt(0) -> r.getDouble(1)).toMap
      for (((cat, i), want) <- golden if i == iou) {
        val have = got.getOrElse(cat,
          fail(s"no AP row for category $cat at iou $iou"))
        assert(math.abs(have - want) < 1e-6,
          s"AP(category=$cat, iou=$iou): spark=$have reference=$want")
      }
    }
  }

  test("PR with mismatched label maps spans gt-only and pred-only categories") {
    // test_pr.py:44-64 (test_pr_different_label_maps): remap predictions
    // {0: 2} so gt carries {0, 1} and predictions carry {2}; the PR curve
    // must cover all three categories — gt-only classes as pure false
    // negatives, the pred-only class as pure false positives — not raise.
    assume(available)
    val (gt, pr) = load()
    val remapped = graft.operators.Remap.remapClasses(pr, Map(0 -> 2))
    val ev = new graft.eval.DetectionEvaluator(
      gt.images, gt.annotations, Map("m" -> remapped.annotations),
      gt.labelMap ++ remapped.labelMap)
    val (prCurve, ap) = ev.precisionRecall("m", minIou = 0.0)
    val cats = prCurve.select("category_id").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(cats == Set(0, 1, 2))
    // nothing can match across disjoint category sets → every AP is 0
    val aps = ap.select("category_id", "AP").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(aps.keySet == Set(0, 1, 2))
    assert(aps.values.forall(_ == 0.0), s"expected all-zero APs, got $aps")
  }

  test("self-prediction confusion matrix is the identity (reference test shape)") {
    // test_confusion_matrix.py::test_confusion_matrix_identical: gt as its
    // own predictions (confidence 1) → identity matrix at min_iou 0 AND 0.8
    assume(available)
    val (gt, _) = load()
    import org.apache.spark.sql.functions._
    val selfPreds = gt.annotations.withColumn("confidence", lit(1.0))
    val ev = new graft.eval.DetectionEvaluator(
      gt.images, gt.annotations, Map("m" -> selfPreds), gt.labelMap)
    for (iou <- Seq(0.0, 0.8)) {
      val cm = ev.confusionMatrix("m", minIou = iou).collect()
      cm.foreach { r =>
        val (g, p) = (r.getAs[String]("groundtruth_label"), r.getAs[String]("prediction_label"))
        val share = r.getAs[Double]("share")
        if (g == p) assert(math.abs(share - 1.0) < 1e-9, s"diag $g at iou=$iou: $share")
        else assert(share == 0.0, s"off-diag ($g,$p) at iou=$iou: $share")
      }
      assert(cm.exists(r => r.getAs[String]("groundtruth_label") ==
        r.getAs[String]("prediction_label")))
    }
  }

  test("df_to_hist reproduces the reference's GOLDEN histogram CSV (test_hist2)") {
    // test_split/test_balanced_groups.py::test_hist2: annotations_valid's
    // (category_id × 2-bin box_height cut) normalized histogram, stored as
    // a golden CSV by the reference itself
    val csvPath = s"$base/histogram_annotations_valid.csv"
    assume(new java.io.File(csvPath).isFile &&
      new java.io.File(s"$base/annotations_valid.json").isFile)
    import org.apache.spark.sql.functions._
    import graft.operators.Grouper
    val ann = Coco.fromCoco(spark, s"$base/annotations_valid.json").annotations
    val edges = Grouper.binEdges(ann, Grouper.ContinuousGroup("box_height", 2))
    val binned = ann.withColumn("hbin", Grouper.binIndex(col("box_height"), edges))
    val hist = Grouper.histogram(binned, Seq("category_id", "hbin"))
    val rows = hist.collect()
    val totalN = rows.map(_.getAs[Long]("count")).sum.toDouble
    val got = rows.map(r => (r.getAs[Int]("category_id").toLong, r.getAs[Int]("hbin")) ->
      r.getAs[Long]("count") / totalN).toMap
    // golden: intervals ordered by upper bound define the bin index; the
    // first edge differs by pandas' display-only 0.1%-of-range lowering,
    // interior/last edges must match ours
    val golden = scala.io.Source.fromFile(csvPath).getLines().drop(1).map { line =>
      val Array(cat, interval, h) = line.split("\",\"|,\"|\",|,(?=[^\\]]*$)").map(_.trim)
      val bounds = interval.stripPrefix("\"(").stripSuffix("]\"").stripPrefix("(")
        .stripSuffix("]").split(",\\s*").map(_.toDouble)
      (cat.toLong, bounds(1), h.toDouble)
    }.toSeq
    val uppers = golden.map(_._2).distinct.sorted
    assert(math.abs(uppers(0) - edges(1)) < 0.01 &&
      math.abs(uppers(1) - edges(2)) < 0.01,
      s"edges mismatch: ours ${edges.toSeq} vs golden uppers $uppers")
    golden.foreach { case (cat, upper, frac) =>
      val bin = uppers.indexOf(upper)
      val ours = got.getOrElse((cat, bin), 0.0)
      assert(math.abs(ours - frac) < 1e-9,
        s"(cat=$cat, bin=$bin): ours $ours vs golden $frac")
    }
    assert(golden.map(_._3).sum > 0.999) // the golden covers the full mass
  }

  test("count error reproduces the reference's crowd-evaluator expectations") {
    // test_evaluation/test_crowd.py::test_simple_crowd_mae on the same
    // fixture pair: min MAE = 0.5, min RMSE = sqrt(0.5) over the 101-point
    // confidence grid (both engines use 0..1 in 0.01 steps) grouped by
    // category, matching the reference's defaults
    assume(available)
    val (gt, pr) = load()
    val ev = new graft.eval.DetectionEvaluator(
      gt.images, gt.annotations, Map("m" -> pr.annotations), gt.labelMap)
    import org.apache.spark.sql.functions._
    val stats = ev.countError("m")
      .agg(min(col("MAE")).as("min_mae"), min(col("RMSE")).as("min_rmse"))
      .collect()(0)
    assert(math.abs(stats.getDouble(0) - 0.5) < 1e-9,
      s"min MAE ${stats.getDouble(0)} != 0.5")
    assert(math.abs(stats.getDouble(1) - 0.7071) < 1e-3,
      s"min RMSE ${stats.getDouble(1)} != 0.7071")
  }
}
