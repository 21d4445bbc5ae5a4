package graft

import graft.eval.Matching

/** Fidelity test of the greedy matcher against the reference kernel
  * (lours/evaluation/detection/util.py:98-186): a seeded random scenario of
  * 12 groundtruth / 20 prediction boxes was run through the reference's
  * `construct_matches_df` (via tools/ref_pr_oracle.py machinery) and the
  * resulting (prediction_id, groundtruth_id, iou) triples are asserted
  * verbatim here, for min_iou 0.0 and 0.3. */
class MatcherFidelitySpec extends SparkFunSuite {
  import spark.implicits._

  private val gt = Seq(
    (0L, 0L, 0, 50.0, 20.4, 5.9, 14.2),
    (1L, 0L, 0, 71.8, 35.6, 17.9, 5.1),
    (2L, 0L, 0, 62.1, 40.4, 16.7, 25.8),
    (3L, 0L, 0, 18.0, 44.3, 27.9, 8.9),
    (4L, 0L, 0, 24.0, 79.6, 20.7, 11.7),
    (5L, 0L, 0, 69.9, 63.4, 17.9, 27.0),
    (6L, 0L, 0, 0.4, 49.8, 17.4, 17.7),
    (7L, 0L, 0, 65.7, 79.1, 11.2, 26.2),
    (8L, 0L, 0, 63.8, 17.2, 5.3, 21.0),
    (9L, 0L, 0, 37.4, 12.8, 9.8, 23.5),
    (10L, 0L, 0, 24.2, 49.0, 22.3, 7.3),
    (11L, 0L, 0, 22.3, 3.5, 10.0, 18.5))

  private val pred = Seq(
    (100L, 0L, 0, 40.6, 77.4, 15.3, 13.9, 0.179),
    (101L, 0L, 0, 69.7, 17.2, 11.0, 18.0, 0.346),
    (102L, 0L, 0, 28.9, 53.7, 6.0, 24.1, 0.948),
    (103L, 0L, 0, 47.9, 24.0, 26.9, 27.7, 0.573),
    (104L, 0L, 0, 4.7, 69.9, 16.7, 8.8, 0.34),
    (105L, 0L, 0, 31.0, 53.0, 18.7, 28.3, 0.272),
    (106L, 0L, 0, 25.8, 10.5, 13.1, 5.1, 0.952),
    (107L, 0L, 0, 12.0, 67.6, 23.8, 23.8, 0.444),
    (108L, 0L, 0, 65.3, 75.6, 5.6, 25.3, 0.98),
    (109L, 0L, 0, 30.4, 72.3, 14.3, 8.4, 0.516),
    (110L, 0L, 0, 78.3, 45.6, 5.8, 15.5, 0.521),
    (111L, 0L, 0, 47.2, 11.6, 8.1, 25.4, 0.897),
    (112L, 0L, 0, 48.4, 15.4, 29.2, 5.4, 0.743),
    (113L, 0L, 0, 51.0, 74.2, 21.4, 20.7, 0.581),
    (114L, 0L, 0, 54.1, 44.2, 15.7, 24.8, 0.427),
    (115L, 0L, 0, 12.1, 14.4, 18.1, 17.8, 0.878),
    (116L, 0L, 0, 35.2, 70.7, 26.8, 23.1, 0.412),
    (117L, 0L, 0, 19.2, 51.3, 13.6, 10.7, 0.923),
    (118L, 0L, 0, 32.2, 45.6, 19.8, 10.0, 0.069),
    (119L, 0L, 0, 7.7, 30.1, 22.1, 14.1, 0.43))

  private def run(minIou: Double): Seq[(Long, Long, Double)] =
    Matching.computeMatches(
      gt.toDF("id", "image_id", "category_id", "box_x_min", "box_y_min", "box_width", "box_height"),
      pred.toDF("id", "image_id", "category_id", "box_x_min", "box_y_min", "box_width", "box_height", "confidence"),
      minIou).collect()
      .map(r => (r.prediction_id.getOrElse(-1L), r.groundtruth_id.getOrElse(-1L),
        math.rint(r.iou * 1e6) / 1e6))
      .sortBy(t => (t._1, t._2)).toSeq

  test("matches reference output at min_iou=0.0") {
    val expected = Seq(
      (-1L, 1L, 0.0), (-1L, 6L, 0.0), (-1L, 9L, 0.0),
      (100L, -1L, 0.0), (101L, -1L, 0.0), (102L, 10L, 0.053463),
      (103L, 2L, 0.138995), (104L, -1L, 0.0), (105L, -1L, 0.0),
      (106L, 11L, 0.151605), (107L, -1L, 0.0), (108L, 7L, 0.352312),
      (109L, 4L, 0.045386), (110L, -1L, 0.0), (111L, 0L, 0.351255),
      (112L, 8L, 0.076351), (113L, 5L, 0.045722), (114L, -1L, 0.0),
      (115L, -1L, 0.0), (116L, -1L, 0.0), (117L, 3L, 0.070219),
      (118L, -1L, 0.0), (119L, -1L, 0.0))
    assert(run(0.0) == expected)
  }

  test("matches reference output at min_iou=0.3 (threshold frees gts for low-conf preds)") {
    val expected = Seq(
      (-1L, 1L, 0.0), (-1L, 2L, 0.0), (-1L, 3L, 0.0), (-1L, 4L, 0.0),
      (-1L, 5L, 0.0), (-1L, 6L, 0.0), (-1L, 8L, 0.0), (-1L, 9L, 0.0),
      (-1L, 11L, 0.0),
      (100L, -1L, 0.0), (101L, -1L, 0.0), (102L, -1L, 0.0), (103L, -1L, 0.0),
      (104L, -1L, 0.0), (105L, -1L, 0.0), (106L, -1L, 0.0), (107L, -1L, 0.0),
      (108L, 7L, 0.352312), (109L, -1L, 0.0), (110L, -1L, 0.0),
      (111L, 0L, 0.351255), (112L, -1L, 0.0), (113L, -1L, 0.0),
      (114L, -1L, 0.0), (115L, -1L, 0.0), (116L, -1L, 0.0), (117L, -1L, 0.0),
      (118L, 10L, 0.354266), (119L, -1L, 0.0))
    assert(run(0.3) == expected)
  }
}
