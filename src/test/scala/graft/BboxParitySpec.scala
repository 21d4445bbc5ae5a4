package graft

import graft.functions.Bbox
import org.apache.spark.sql.functions._

/** Bit-level parity with the reference's bbox converter
  * (lours/utils/bbox_converter.py) across ALL 14 format strings — the
  * doctest-golden tranche the r9 verdict asked for. The goldens below are
  * the reference's OWN outputs (export_bbox / import_bbox run on the
  * literal fixture; values captured via repr, which Scala's Double
  * parsing reproduces exactly), so every assert is a cross-engine
  * replay: same column names, same column ORDER (the block/interleaved
  * axis), and bit-identical doubles — including the reference's float
  * evaluation order (relative exports scale by the image dim FIRST, then
  * derive centers/corners) and its point-export quirk (XY emits the box
  * CENTER under box_{x,y}_min names). */
class BboxParitySpec extends SparkFunSuite {
  import spark.implicits._

  // the literal fixture: 3 images, 4 boxes with awkward floats
  private val imageDims = Seq((0L, 342, 167), (1L, 377, 114), (2L, 136, 257))
  private val boxes = Seq(
    (0L, 2L, 13.547, 41.3, 38.4521739, 51.125),
    (1L, 1L, 0.0, 7.125, 63.576932, 13.0),
    (2L, 2L, 111.25, 9.0, 24.75, 199.5),
    (3L, 0L, 42.625, 100.001, 99.999123, 3.0625))

  private def fixture() = {
    val images = imageDims.toDF("img_id", "im_w", "im_h")
    boxes.toDF("idx", "image_id", "box_x_min", "box_y_min",
        "box_width", "box_height")
      .join(broadcast(images), col("image_id") === col("img_id"))
  }

  // reference export_bbox output per format: (reference column names,
  // 4 rows of doubles in fixture idx order)
  private val exportGolden: Map[String, (Seq[String], Seq[Seq[Double]])] = Map(
    "XYWH" -> (Seq("box_x_min", "box_y_min", "box_width", "box_height"), Seq(
      Seq(13.547, 41.3, 38.4521739, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.001, 99.999123, 3.0625))),
    "XWYH" -> (Seq("box_x_min", "box_width", "box_y_min", "box_height"), Seq(
      Seq(13.547, 38.4521739, 41.3, 51.125),
      Seq(0.0, 63.576932, 7.125, 13.0),
      Seq(111.25, 24.75, 9.0, 199.5),
      Seq(42.625, 99.999123, 100.001, 3.0625))),
    "XYXY" -> (Seq("box_x_min", "box_y_min", "box_x_max", "box_y_max"), Seq(
      Seq(13.547, 41.3, 51.9991739, 92.425),
      Seq(0.0, 7.125, 63.576932, 20.125),
      Seq(111.25, 9.0, 136.0, 208.5),
      Seq(42.625, 100.001, 142.624123, 103.0635))),
    "XXYY" -> (Seq("box_x_min", "box_x_max", "box_y_min", "box_y_max"), Seq(
      Seq(13.547, 51.9991739, 41.3, 92.425),
      Seq(0.0, 63.576932, 7.125, 20.125),
      Seq(111.25, 136.0, 9.0, 208.5),
      Seq(42.625, 142.624123, 100.001, 103.0635))),
    "CXCYWH" -> (Seq("box_x_center", "box_y_center", "box_width", "box_height"), Seq(
      Seq(32.77308695, 66.8625, 38.4521739, 51.125),
      Seq(31.788466, 13.625, 63.576932, 13.0),
      Seq(123.625, 108.75, 24.75, 199.5),
      Seq(92.6245615, 101.53225, 99.999123, 3.0625))),
    "CXWCYH" -> (Seq("box_x_center", "box_width", "box_y_center", "box_height"), Seq(
      Seq(32.77308695, 38.4521739, 66.8625, 51.125),
      Seq(31.788466, 63.576932, 13.625, 13.0),
      Seq(123.625, 24.75, 108.75, 199.5),
      Seq(92.6245615, 99.999123, 101.53225, 3.0625))),
    "XY" -> (Seq("box_x_min", "box_y_min"), Seq(
      Seq(32.77308695, 66.8625),
      Seq(31.788466, 13.625),
      Seq(123.625, 108.75),
      Seq(92.6245615, 101.53225))),
    "xywh" -> (Seq("box_x_min_relative", "box_y_min_relative",
        "box_width_relative", "box_height_relative"), Seq(
      Seq(0.09961029411764706, 0.16070038910505835, 0.2827365727941176, 0.19892996108949415),
      Seq(0.0, 0.0625, 0.16863907692307692, 0.11403508771929824),
      Seq(0.8180147058823529, 0.03501945525291829, 0.18198529411764705, 0.7762645914396887),
      Seq(0.12463450292397661, 0.5988083832335329, 0.2923950964912281, 0.018338323353293412))),
    "xwyh" -> (Seq("box_x_min_relative", "box_width_relative",
        "box_y_min_relative", "box_height_relative"), Seq(
      Seq(0.09961029411764706, 0.2827365727941176, 0.16070038910505835, 0.19892996108949415),
      Seq(0.0, 0.16863907692307692, 0.0625, 0.11403508771929824),
      Seq(0.8180147058823529, 0.18198529411764705, 0.03501945525291829, 0.7762645914396887),
      Seq(0.12463450292397661, 0.2923950964912281, 0.5988083832335329, 0.018338323353293412))),
    "xyxy" -> (Seq("box_x_min_relative", "box_y_min_relative",
        "box_x_max_relative", "box_y_max_relative"), Seq(
      Seq(0.09961029411764706, 0.16070038910505835, 0.38234686691176467, 0.3596303501945525),
      Seq(0.0, 0.0625, 0.16863907692307692, 0.17653508771929824),
      Seq(0.8180147058823529, 0.03501945525291829, 1.0, 0.811284046692607),
      Seq(0.12463450292397661, 0.5988083832335329, 0.4170295994152047, 0.6171467065868264))),
    "xxyy" -> (Seq("box_x_min_relative", "box_x_max_relative",
        "box_y_min_relative", "box_y_max_relative"), Seq(
      Seq(0.09961029411764706, 0.38234686691176467, 0.16070038910505835, 0.3596303501945525),
      Seq(0.0, 0.16863907692307692, 0.0625, 0.17653508771929824),
      Seq(0.8180147058823529, 1.0, 0.03501945525291829, 0.811284046692607),
      Seq(0.12463450292397661, 0.4170295994152047, 0.5988083832335329, 0.6171467065868264))),
    "cxcywh" -> (Seq("box_x_center_relative", "box_y_center_relative",
        "box_width_relative", "box_height_relative"), Seq(
      Seq(0.2409785805147059, 0.2601653696498054, 0.2827365727941176, 0.19892996108949415),
      Seq(0.08431953846153846, 0.11951754385964912, 0.16863907692307692, 0.11403508771929824),
      Seq(0.9090073529411764, 0.42315175097276264, 0.18198529411764705, 0.7762645914396887),
      Seq(0.27083205116959064, 0.6079775449101796, 0.2923950964912281, 0.018338323353293412))),
    "cxwcyh" -> (Seq("box_x_center_relative", "box_width_relative",
        "box_y_center_relative", "box_height_relative"), Seq(
      Seq(0.2409785805147059, 0.2827365727941176, 0.2601653696498054, 0.19892996108949415),
      Seq(0.08431953846153846, 0.16863907692307692, 0.11951754385964912, 0.11403508771929824),
      Seq(0.9090073529411764, 0.18198529411764705, 0.42315175097276264, 0.7762645914396887),
      Seq(0.27083205116959064, 0.2923950964912281, 0.6079775449101796, 0.018338323353293412))),
    "xy" -> (Seq("box_x_min_relative", "box_y_min_relative"), Seq(
      Seq(0.2409785805147059, 0.2601653696498054),
      Seq(0.08431953846153846, 0.11951754385964912),
      Seq(0.9090073529411764, 0.42315175097276264),
      Seq(0.27083205116959064, 0.6079775449101796))))

  // reference import_bbox(export_bbox(fixture, fmt), fmt) → canonical
  // XYWH (the reference's own roundtrip is NOT always bit-exact — e.g.
  // relative xyxy drifts in the last ulp — and the goldens keep that
  // drift: parity means matching the reference, not beating it)
  private val importGolden: Map[String, Seq[Seq[Double]]] = Map(
    "XYWH" -> Seq(
      Seq(13.547, 41.3, 38.4521739, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.001, 99.999123, 3.0625)),
    "XWYH" -> Seq(
      Seq(13.547, 41.3, 38.4521739, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.001, 99.999123, 3.0625)),
    "XYXY" -> Seq(
      Seq(13.547, 41.3, 38.452173900000005, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.001, 99.999123, 3.0625)),
    "XXYY" -> Seq(
      Seq(13.547, 41.3, 38.452173900000005, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.001, 99.999123, 3.0625)),
    "CXCYWH" -> Seq(
      Seq(13.547, 41.3, 38.4521739, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.001, 99.999123, 3.0625)),
    "CXWCYH" -> Seq(
      Seq(13.547, 41.3, 38.4521739, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.001, 99.999123, 3.0625)),
    "XY" -> Seq(
      Seq(32.77308695, 66.8625, 0.0, 0.0),
      Seq(31.788466, 13.625, 0.0, 0.0),
      Seq(123.625, 108.75, 0.0, 0.0),
      Seq(92.6245615, 101.53225, 0.0, 0.0)),
    "xywh" -> Seq(
      Seq(13.547, 41.3, 38.4521739, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.00099999999999, 99.999123, 3.0625)),
    "xwyh" -> Seq(
      Seq(13.547, 41.3, 38.4521739, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.00099999999999, 99.999123, 3.0625)),
    "xyxy" -> Seq(
      Seq(13.547, 41.3, 38.45217389999999, 51.124999999999986),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.00099999999999, 99.999123, 3.062500000000014)),
    "xxyy" -> Seq(
      Seq(13.547, 41.3, 38.45217389999999, 51.124999999999986),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.25, 9.0, 24.75, 199.5),
      Seq(42.625, 100.00099999999999, 99.999123, 3.062500000000014)),
    "cxcywh" -> Seq(
      Seq(13.547, 41.3, 38.4521739, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.24999999999999, 9.0, 24.75, 199.5),
      Seq(42.625, 100.001, 99.999123, 3.0625)),
    "cxwcyh" -> Seq(
      Seq(13.547, 41.3, 38.4521739, 51.125),
      Seq(0.0, 7.125, 63.576932, 13.0),
      Seq(111.24999999999999, 9.0, 24.75, 199.5),
      Seq(42.625, 100.001, 99.999123, 3.0625)),
    "xy" -> Seq(
      Seq(32.77308695, 66.8625, 0.0, 0.0),
      Seq(31.788466, 13.625, 0.0, 0.0),
      Seq(123.62499999999999, 108.75, 0.0, 0.0),
      Seq(92.6245615, 101.53225, 0.0, 0.0)))

  private def exported(fmtName: String) = {
    val fmt = Bbox.parseFormat(fmtName)
    fixture().select(col("idx") +:
        Bbox.fromCanonical(fmt, col("box_x_min"), col("box_y_min"),
          col("box_width"), col("box_height"), col("im_w"), col("im_h")): _*)
      .orderBy("idx")
  }

  test("export parity: all 14 reference format strings, bit-identical doubles") {
    exportGolden.foreach { case (fmtName, (goldenCols, goldenRows)) =>
      val fmt = Bbox.parseFormat(fmtName)
      assert(fmt.referenceColumnNames == goldenCols,
        s"$fmtName: column names/order diverge from the reference")
      val got = exported(fmtName).collect().map(r =>
        (1 until r.length).map(r.getDouble))
      goldenRows.zip(got).zipWithIndex.foreach { case ((g, a), i) =>
        assert(a == g, s"$fmtName row $i: got $a, reference printed $g")
      }
    }
  }

  test("import parity: reference-exported values re-import to the reference's canonical") {
    importGolden.foreach { case (fmtName, goldenRows) =>
      val fmt = Bbox.parseFormat(fmtName)
      val exp = exported(fmtName)
        .join(boxes.map(b => (b._1, b._2)).toDF("idx", "image_id"), Seq("idx"))
        .join(broadcast(imageDims.toDF("img_id", "im_w", "im_h")),
          col("image_id") === col("img_id"))
      val names = fmt.columnNames
      val back = exp.select(col("idx") +: Bbox.toCanonical(fmt,
          col(s"`${names(0)}`"), col(s"`${names(1)}`"),
          if (names.size > 2) col(s"`${names(2)}`") else lit(0.0),
          if (names.size > 3) col(s"`${names(3)}`") else lit(0.0),
          col("im_w"), col("im_h")): _*)
        .orderBy("idx")
      val got = back.collect().map(r => (1 to 4).map(r.getDouble))
      goldenRows.zip(got).zipWithIndex.foreach { case ((g, a), i) =>
        assert(a == g, s"$fmtName row $i: got $a, reference printed $g")
      }
    }
  }

  test("block-order parse: darknet's cxwcyh and friends are accepted") {
    assert(Bbox.parseFormat("cxwcyh") ==
      Bbox.BoxFormat(Bbox.CenterSize, relative = true, blockOrder = true))
    assert(Bbox.parseFormat("XWYH") ==
      Bbox.BoxFormat(Bbox.CornerSize, relative = false, blockOrder = true))
    assert(Bbox.parseFormat("xxyy") ==
      Bbox.BoxFormat(Bbox.TwoCorner, relative = true, blockOrder = true))
    // the pre-existing contracts hold: interleaved parses keep default order
    assert(Bbox.parseFormat("XYWH") == Bbox.BoxFormat(Bbox.CornerSize, false))
    intercept[IllegalArgumentException](Bbox.parseFormat("XYwh"))
    intercept[IllegalArgumentException](Bbox.parseFormat("xxYH"))
  }
}
