package graft

import graft.model.DummyData
import graft.operators.Frames
import graft.io.{SchemaUtil, Yolov5, CocoKeypoints}
import graft.validate.{Validation, LabelMapBuilder}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class DummyDataSpec extends SparkFunSuite {

  test("dummyDataset is seeded-deterministic and partition-invariant") {
    val a = DummyData.dummyDataset(spark, 10, 100, seed = 7)
    val b = DummyData.dummyDataset(spark, 10, 100, seed = 7)
    assert(collectSorted(a.images) == collectSorted(b.images))
    assert(collectSorted(a.annotations) == collectSorted(b.annotations))
    val c = DummyData.dummyDataset(spark, 10, 100, seed = 8)
    assert(collectSorted(a.annotations) != collectSorted(c.annotations))
    a.validated()
    // boxes inside their images by construction
    assert(graft.operators.Locators.malformedBoxReport(a).count() == 0)
  }

  test("dummyDataset with confidence is prediction-shaped") {
    val p = DummyData.dummyDataset(spark, 5, 50, addConfidence = true, seed = 1)
    assert(p.annotations.columns.contains("confidence"))
    val confs = p.annotations.select("confidence").collect().map(_.getDouble(0))
    assert(confs.forall(c => c >= 0 && c < 1))
  }
}

class FramesSpec extends SparkFunSuite {

  test("getOneFrame returns the n-th image with its annotations") {
    val ds = tinyDataset()
    val (img, anns) = Frames.getOneFrame(ds, 1)
    assert(img.getAs[Long]("id") == 1L)
    assert(anns.map(_.getAs[Long]("id")).sorted == Seq(2L, 3L))
  }

  test("iterImages yields one row per image with grouped annotations") {
    val ds = tinyDataset()
    val rows = Frames.iterImages(ds).toSeq
    assert(rows.map(_.getAs[Long]("id")) == Seq(0L, 1L, 2L, 3L))
    val annsOf0 = rows.head.getAs[scala.collection.Seq[org.apache.spark.sql.Row]]("annotations")
    assert(annsOf0.size == 2)
    assert(rows.last.isNullAt(rows.last.fieldIndex("annotations"))) // image 3: empty
  }

  test("invalidImageReport probes files distributed; removeInvalidImages cascades") {
    val root = Files.createTempDirectory("imgval").toString
    val png = Array[Int](
      0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0, 100, 0, 0, 0, 50, 8, 6, 0, 0, 0).map(_.toByte)
    Files.write(Paths.get(root, "good.png"), png)
    Files.write(Paths.get(root, "garbage.png"), Array[Byte](1, 2, 3, 4, 5))
    import spark.implicits._
    val images = Seq(
      (0L, 100, 50, "good.png"),     // valid
      (1L, 999, 50, "good.png"),     // exists but size mismatch... dup path; use separate rows
      (2L, 10, 10, "garbage.png"),   // undecodable
      (3L, 10, 10, "missing.png")    // missing
    ).toDF("id", "width", "height", "relative_path")
    val ds = graft.model.GraftDataset.create(images,
      tinyDataset().annotations.limit(0), Map.empty, imagesRoot = root)
    val report = Frames.invalidImageReport(ds).collect()
      .map(r => r.getAs[Long]("id") ->
        (r.getAs[Boolean]("missing"), r.getAs[Boolean]("undecodable"),
          r.getAs[Boolean]("size_mismatch"))).toMap
    assert(!report.contains(0L))
    assert(report(1L) == (false, false, true))
    assert(report(2L) == (false, true, false))
    assert(report(3L) == (true, false, false))
    val cleaned = Frames.removeInvalidImages(ds)
    assert(cleaned.images.select("id").collect().map(_.getLong(0)).toSeq == Seq(0L))
  }
}

class SchemaUtilSpec extends SparkFunSuite {
  import spark.implicits._

  private val schema =
    """{
      |  "type": "object",
      |  "required": ["id"],
      |  "properties": {
      |    "id": {"type": "integer"},
      |    "score": {"type": "number", "default": 0.5},
      |    "attributes": {
      |      "type": "object",
      |      "properties": {
      |        "occluded": {"type": "boolean", "default": false},
      |        "tags": {"type": "array",
      |                 "items": {"type": "string", "enum": ["big", "red"]}}
      |      }
      |    }
      |  }
      |}""".stripMargin

  test("JSON schema converts to a dotted StructType") {
    val st = SchemaUtil.toStructType(schema)
    assert(st.fieldNames.toSeq ==
      Seq("id", "score", "attributes.occluded", "attributes.tags"))
    assert(st("id").dataType == org.apache.spark.sql.types.LongType)
    assert(!st("id").nullable)
    assert(st("attributes.tags").dataType ==
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))
  }

  test("enforce adds missing columns, casts, and fills defaults") {
    val df = Seq((1L, null.asInstanceOf[java.lang.Double])).toDF("id", "score")
    val out = SchemaUtil.enforce(df, schema)
    val r = out.collect()(0)
    assert(r.getAs[Double]("score") == 0.5)             // default filled
    assert(r.getAs[Boolean]("attributes.occluded") == false) // added w/ default
    assert(out.columns.contains("attributes.tags"))      // added null array
  }

  test("enum-array fields drive booleanization") {
    assert(SchemaUtil.enumArrayFields(schema) == Map("attributes.tags" -> Seq("big", "red")))
    val df = Seq((1L, Seq("red"))).toDF("id", "attributes.tags")
    val (out, fams) = SchemaUtil.booleanizeBySchema(df, schema)
    assert(fams == Set("attributes.tags"))
    assert(out.columns.toSet.contains("attributes.tags.red"))
    assert(out.select(col("`attributes.tags.red`")).collect()(0).getBoolean(0))
  }
}

class ValidationSpec extends SparkFunSuite {

  test("check passes on a well-formed dataset, fails on malformed boxes") {
    val good = DummyData.dummyDataset(spark, 5, 20, seed = 3)
    Validation.check(good)
    intercept[IllegalArgumentException](Validation.check(tinyDataset())) // has bad boxes
    Validation.check(tinyDataset(), checkBoxes = false)
  }

  test("assertColumnsProperlyNormalized catches scalar+dotted conflicts") {
    import spark.implicits._
    Validation.assertColumnsProperlyNormalized(Seq((1, 2)).toDF("a.b", "c"))
    intercept[IllegalArgumentException](
      Validation.assertColumnsProperlyNormalized(Seq((1, 2)).toDF("a", "a.b")))
  }

  test("frame intersection equality tolerates disjoint ids, rejects changed cells") {
    val ds = tinyDataset()
    val subset = ds.annotations.filter(col("id") <= 3)
    Validation.assertFrameIntersectionsEqual(ds.annotations, subset)
    val mutated = subset.withColumn("box_width", col("box_width") + 1)
    intercept[IllegalArgumentException](
      Validation.assertFrameIntersectionsEqual(ds.annotations, mutated))
  }

  test("golden-parquet regression: first run dumps, second compares, drift fails") {
    val dir = Files.createTempDirectory("golden").toString + "/g1"
    val ds = DummyData.dummyDataset(spark, 4, 12, seed = 5)
    Validation.datasetRegression(ds, dir)      // dumps
    Validation.datasetRegression(ds, dir)      // matches
    val drifted = ds.copy(annotations = ds.annotations.filter(col("id") =!= 0))
    intercept[IllegalArgumentException](Validation.datasetRegression(drifted, dir))
  }

  test("constructLabelMap asserts bijectivity both ways") {
    val ds = tinyDataset()
    assert(LabelMapBuilder.constructLabelMap(ds.annotations) ==
      Map(0 -> "person", 1 -> "car"))
    val broken = ds.annotations.withColumn("category_str",
      when(col("id") === 0, "alias").otherwise(col("category_str")))
    intercept[IllegalArgumentException](LabelMapBuilder.constructLabelMap(broken))
  }
}

class ExtraIoSpec extends SparkFunSuite {

  test("coco keypoints become zero-size point boxes") {
    val dir = Files.createTempDirectory("kp").toString
    Files.writeString(Paths.get(dir, "kp.json"),
      """{"images": [{"id": 1, "file_name": "a.jpg", "width": 100, "height": 100}],
        |  "annotations": [{"id": 1, "image_id": 1, "category_id": 0, "bbox": [10.0, 20.0, 0.0, 0.0]}],
        |  "categories": [{"id": 0, "name": "kp", "supercategory": ""}]}""".stripMargin)
    val ds = CocoKeypoints.fromCocoKeypoints(spark, s"$dir/kp.json")
    val a = ds.annotations.collect()(0)
    assert(a.getAs[Double]("box_x_min") == 10.0)
    assert(a.getAs[Double]("box_width") == 0.0)
    // keypoint datasets pass validity only with keypoints allowed
    assert(graft.operators.Locators.removeInvalidAnnotations(ds).numAnnotations == 0)
    assert(graft.operators.Locators.removeInvalidAnnotations(ds, allowKeypoints = true)
      .numAnnotations == 1)
  }

  test("yolov5 writer emits data.yaml and split lists") {
    val ds = tinyDataset()
    val dir = Files.createTempDirectory("y5").toString
    Yolov5.toYolov5(ds, dir)
    val yaml = Files.readString(Paths.get(dir, "data.yaml"))
    assert(yaml.contains("nc: 2"))
    assert(yaml.contains("train: train.txt"))
    val trainList = Files.readString(Paths.get(dir, "train.txt"))
    assert(trainList.contains("images/a.jpg"))
    assert(Files.exists(Paths.get(dir, "classes.names")))
  }

  test("multi-model multi-iou PR sweep yields the full cross") {
    import spark.implicits._
    val gt = DummyData.dummyDataset(spark, 5, 40, seed = 11)
    val p1 = DummyData.dummyDataset(spark, 5, 60, addConfidence = true, seed = 12)
    val p2 = DummyData.dummyDataset(spark, 5, 60, addConfidence = true, seed = 13)
    val ev = new graft.eval.DetectionEvaluator(gt.images, gt.annotations,
      Map("A" -> p1.annotations, "B" -> p2.annotations), gt.labelMap)
    val (pr, ap) = ev.precisionRecallAll(ious = Seq(0.0, 0.5))
    val combos = ap.select("model", "iou_threshold").distinct().collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSet
    assert(combos == Set(("A", 0.0), ("A", 0.5), ("B", 0.0), ("B", 0.5)))
    assert(pr.select("model").distinct().count() == 2)
  }
}

class SketchSpec extends SparkFunSuite {
  test("approx_count_distinct stays within the configured error bound") {
    val r = graft.queries.SketchQueries.defs("q47_approx_distinct")(
      spark, "/root/testdata/sf0.001").collect()(0)
    assert(r.getAs[Long]("exact_parts") > 0 && r.getAs[Long]("exact_orders") > 0)
    assert(r.getAs[Boolean]("parts_within_bound"), "parts sketch out of bound")
    assert(r.getAs[Boolean]("orders_within_bound"), "orders sketch out of bound")
  }
}

class StatLabelFBetaSpec extends SparkFunSuite {
  import spark.implicits._

  test("withStatLabel joins per-bin mean/median back onto rows") {
    val df = Seq((0, 1.0), (0, 3.0), (1, 10.0)).toDF("bin", "v")
    val mean = graft.operators.GrouperStats.withStatLabel(df, "v", "bin")
      .collect().map(r => (r.getInt(0), r.getDouble(1)) -> r.getAs[Double]("bin_label")).toMap
    assert(mean((0, 1.0)) == 2.0 && mean((1, 10.0)) == 10.0)
    val med = graft.operators.GrouperStats.withStatLabel(df, "v", "bin", useMedian = true)
      .filter(col("bin") === 0).select("bin_label").distinct().collect()
    assert(med.length == 1)
  }

  test("withFBeta adds the reference f-beta formula") {
    val pr = Seq((0.8, 0.5)).toDF("precision", "recall")
    val out = graft.eval.EvalReports.withFBeta(pr, 2.0)
    val f2 = out.collect()(0).getAs[Double]("f2_score")
    val expected = 5.0 * 0.8 * 0.5 / (0.8 * 4 + 0.5 + 1e-5)
    assert(math.abs(f2 - expected) < 1e-12)
  }
}

class FolderSweepSpec extends SparkFunSuite {
  test("orphanFiles reports files on disk not referenced by any image row") {
    val root = java.nio.file.Files.createTempDirectory("sweep").toString
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R', 0, 0, 0, 3, 0, 0, 0, 2, 8, 6, 0, 0, 0).map(_.toByte)
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "known.png"), png)
    java.nio.file.Files.write(java.nio.file.Paths.get(root, "orphan.png"), png)
    import spark.implicits._
    val images = Seq((0L, 3, 2, "known.png")).toDF("id", "width", "height", "relative_path")
    val ds = graft.model.GraftDataset.create(images,
      tinyDataset().annotations.limit(0), Map.empty, imagesRoot = root)
    val orphans = graft.operators.FolderSweep.orphanFiles(ds, "*.png")
      .collect().map(_.getString(0))
    assert(orphans.toSeq == Seq("orphan.png"))
  }
}
