package graft

import graft.eval.Matching
import org.apache.spark.sql.functions._

/** Parity against the reference evaluator's compute_matches DOCTEST
  * (lours/evaluation/detection/detection_evaluator.py:84-149): the
  * docstring scenario — dummy_dataset(10, 1000) groundtruth, two
  * dummy_dataset(10, 10000) prediction sets at seeds 0/1 sharing the
  * groundtruth's images, DetectionEvaluator, compute_matches() — was run
  * through the reference itself (numpy default_rng drives every numeric
  * column, so the frames regenerate bit-exact; only Faker-derived NAMES
  * were stubbed) and its full match output stored under
  * src/test/resources/evaluator_doctest/. This spec replays BOTH doctest
  * calls — matches["A"] (category specific) and the category-agnostic
  * B_matches — through this engine's matcher and asserts every
  * (prediction_id, groundtruth_id, iou) triple, 10000 rows per case, plus
  * the doctest's literally printed head rows. */
class EvaluatorDoctestParitySpec extends SparkFunSuite {

  private val base = new java.io.File("src/test/resources/evaluator_doctest")
  private def available = new java.io.File(base, "gt_annotations.parquet").isFile
  private def path(n: String) = new java.io.File(base, s"$n.parquet").getAbsolutePath

  private def matcherTriples(pred: String, agnostic: Boolean): Map[Long, (Long, Double)] = {
    val gt = spark.read.parquet(path("gt_annotations"))
    val pr = spark.read.parquet(path(pred))
    Matching.computeMatches(gt, pr, minIou = 0.0, categoryAgnostic = agnostic)
      .collect()
      .flatMap(r => r.prediction_id.map(p =>
        p -> (r.groundtruth_id.getOrElse(-1L), math.rint(r.iou * 1e6) / 1e6)))
      .toMap
  }

  private def referenceTriples(fixture: String): Map[Long, (Long, Double)] = {
    spark.read.parquet(path(fixture))
      .select(col("prediction_id").cast("long"),
        coalesce(col("groundtruth_id"), lit(-1.0)).cast("long").as("gid"),
        col("iou"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), math.rint(r.getDouble(2) * 1e6) / 1e6))
      .toMap
  }

  test("doctest matches['A']: all 10000 category-specific triples match the reference") {
    assume(available)
    val ours = matcherTriples("pred_a", agnostic = false)
    val ref = referenceTriples("matches_a_category_specific")
    assert(ours.size == 10000 && ref.size == 10000)
    assert(ours === ref)
    // the doctest's printed head rows, verbatim
    assert(ours(2311L) === ((207L, 0.370857)))
    assert(ours(515L) === ((820L, 0.586261)))
    assert(ours(7071L) === ((585L, 0.468022)))
    assert(ours(4444L) === ((87L, 0.089832)))
    assert(ours(235L) === ((105L, 0.431787)))
  }

  test("doctest B_matches: all 10000 category-agnostic triples match the reference") {
    assume(available)
    val ours = matcherTriples("pred_b", agnostic = true)
    val ref = referenceTriples("matches_b_agnostic")
    assert(ours.size == 10000 && ref.size == 10000)
    assert(ours === ref)
    assert(ours(7849L) === ((832L, 0.267152)))
    assert(ours(8819L) === ((130L, 0.089308)))
    assert(ours(6537L) === ((785L, 0.322729)))
    assert(ours(1616L) === ((326L, 0.406822)))
    assert(ours(8021L) === ((929L, 0.510778)))
  }
}
