package graft

import graft.io._
import org.apache.spark.sql.functions._

/** Drive every format loader against the REFERENCE'S OWN fixture trees
  * (test_lours/test_data/) — the strongest evidence that a user of the
  * reference can point this engine at their existing data unchanged.
  * Each test is guarded (assume) on fixture availability. */
class ReferenceIoFixtureSpec extends SparkFunSuite {

  private val base = "/root/reference/test_lours/test_data"
  private def exists(p: String) = new java.io.File(s"$base/$p").exists

  test("caipy: the reference caipy_dataset tree loads with both splits") {
    assume(exists("caipy_dataset/Annotations/train"))
    val ds = Caipy.fromCaipy(spark, s"$base/caipy_dataset")
    assert(ds.numImages == 4)
    assert(ds.numAnnotations > 0)
    val splits = ds.images.select("split").distinct().collect().map(_.getString(0)).sorted
    assert(splits.toSeq == Seq("train", "valid"))
    assert(ds.labelMap.nonEmpty)
    ds.validated()
  }

  test("darknet: reference label files + classes.names parse against probed dims") {
    assume(exists("darknet_dataset/classes.names"))
    val classNames = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$base/darknet_dataset/classes.names"))
      .toArray.map(_.toString.trim).filter(_.nonEmpty).toSeq
    assert(classNames.nonEmpty)
    // images: probe real dimensions from the fixture JPEGs
    val imgDs = ImagesFolder.fromFolder(spark, s"$base/darknet_dataset/train", "*.jpg")
    assert(imgDs.numImages == 2)
    assert(imgDs.images.filter(col("width") > 0).count() == 2) // JPEG probe worked
    val ds = Darknet.fromDarknet(spark, s"$base/darknet_dataset/train",
      imgDs.images, classNames, split = Some("train"))
    assert(ds.numAnnotations > 0)
    // relative coords scaled into pixel bounds
    val bad = graft.operators.Locators.malformedBoxReport(ds).count()
    assert(bad == 0, "darknet boxes out of probed image bounds")
  }

  test("yolov5: data.yaml names + labels dirs load") {
    assume(exists("yolov5_dataset/yolov5.yaml"))
    val (_, names) = DarknetConfig.parseDataYaml(s"$base/yolov5_dataset/yolov5.yaml")
    assert(names.nonEmpty)
    val imgDs = ImagesFolder.fromFolder(spark, s"$base/yolov5_dataset/train/images", "*.jpg")
    val ds = Darknet.fromDarknet(spark, s"$base/yolov5_dataset/train/labels",
      imgDs.images, names, split = Some("train"))
    assert(ds.numAnnotations > 0)
    assert(ds.labelMap.size == names.size)
  }

  test("pascalvoc: reference XML tree parses with parts skipped") {
    assume(exists("pascalvoc_dataset/Annotations"))
    val ds = PascalVoc.fromPascalVoc(spark, s"$base/pascalvoc_dataset/Annotations")
    assert(ds.numImages == 6)
    assert(ds.numAnnotations > 0)
    assert(ds.labelMap.nonEmpty)
    assert(ds.annotations.filter(col("box_width") <= 0).count() == 0)
  }

  test("mot: reference gt.txt loads with conf==0 dropped") {
    assume(exists("mot_dataset/gt.txt"))
    val ds = Mot.fromMot(spark, s"$base/mot_dataset/gt.txt")
    assert(ds.numImages > 0 && ds.numAnnotations > 0)
    assert(ds.annotations.filter(col("confidence") === 0.0).count() == 0)
  }

  test("crowdhuman: reference odgt explodes person+head rows") {
    assume(exists("crowdhuman_dataset"))
    val odgt = new java.io.File(s"$base/crowdhuman_dataset").listFiles()
      .find(_.getName.endsWith(".odgt"))
    assume(odgt.isDefined)
    val ds = CrowdHuman.fromCrowdHuman(spark, odgt.get.getAbsolutePath)
    assert(ds.numImages > 0)
    val cats = ds.annotations.select("category_id").distinct()
      .collect().map(_.getInt(0)).sorted
    assert(cats.toSeq == Seq(0, 1)) // person + head
    // person shares are real ratios; head shares are NaN by definition
    // ("we don't know how visible each head is", crowd_human.py:104-106)
    assert(ds.annotations.filter(col("category_id") === 0)
      .filter(isnan(col("visible_share")) || col("visible_share") > 1.0)
      .count() == 0)
    assert(ds.annotations.filter(col("category_id") === 1)
      .filter(!isnan(col("visible_share"))).count() == 0)
  }

  test("match_index realigns the reference's reindex fixture to the original ids") {
    // test_reindex.py::test_match_index: the _reindex variant carries the
    // same images under different ids; match_index by relative_path must
    // restore the original image table exactly
    assume(exists("coco_dataset/annotations_train.json") &&
      exists("coco_dataset/annotations_train_reindex.json"))
    val ds1 = Coco.fromCoco(spark, s"$base/coco_dataset/annotations_train.json",
      split = Some("train"))
    val ds2 = Coco.fromCoco(spark, s"$base/coco_dataset/annotations_train_reindex.json",
      split = Some("train"))
    assert(ds1.images.join(ds2.images, Seq("id", "relative_path")).count()
      < ds1.numImages) // the fixture really is re-indexed
    val re = graft.operators.Ids.matchIndex(ds2, ds1, on = "relative_path")
    def key(ds: graft.model.GraftDataset) = ds.images
      .select("id", "relative_path", "width", "height")
      .collect().map(_.toString).sorted.toSeq
    assert(key(re) == key(ds1))
    re.validated()
    assert(re.numAnnotations == ds2.numAnnotations)
  }

  test("partial coco fixtures load (test_partial_coco_io expectations)") {
    assume(exists("coco_dataset/annotations_no_labelmap.json"))
    val noLm = Coco.fromCoco(spark, s"$base/coco_dataset/annotations_no_labelmap.json",
      split = Some("train"), labelMap = Map(9 -> "object"))
    assert(noLm.numImages == 2 && noLm.numAnnotations == 9)
    assert(noLm.labelMap == Map(9 -> "object"))
    assert(noLm.annotations.select("category_id").distinct()
      .collect().map(_.getInt(0)).toSeq == Seq(9))
    graft.validate.Validation.check(noLm)

    val empty = Coco.fromCoco(spark, s"$base/coco_dataset/annotations_empty.json",
      split = Some("train"))
    assert(empty.numImages == 2 && empty.numAnnotations == 0)
    assert(empty.labelMap.size == 15)
    graft.validate.Validation.check(empty)

    val emptyNoLm = Coco.fromCoco(spark,
      s"$base/coco_dataset/annotations_empty_no_labelmap.json", split = Some("train"))
    assert(emptyNoLm.numImages == 2 && emptyNoLm.numAnnotations == 0)
    assert(emptyNoLm.labelMap.isEmpty)
    graft.validate.Validation.check(emptyNoLm)
  }

  test("cross-format merge parity: caipy + coco fixtures (test_merge.py shape)") {
    // replicates test_dataset/test_merge.py::test_merge's additivity and
    // commutativity-modulo-ids on the reference's own fixture pair
    assume(exists("caipy_dataset/Annotations/train") &&
      exists("coco_dataset/annotations_train.json"))
    val ds1 = Caipy.fromCaipy(spark, s"$base/caipy_dataset")
    val ds2 = Coco.fromCoco(spark, s"$base/coco_dataset/annotations_train.json")
    val merged = graft.operators.Merge.union(ds1, ds2)
    assert(merged.numImages == ds1.numImages + ds2.numImages)
    assert(merged.numAnnotations == ds1.numAnnotations + ds2.numAnnotations)
    merged.validated()
    def contentKey(ds: graft.model.GraftDataset) = ds.annotations
      .join(ds.images.select(col("id").as("__iid"), col("relative_path")),
        col("image_id") === col("__iid"))
      .select(col("relative_path"), col("category_str"),
        round(col("box_x_min"), 3), round(col("box_width"), 3))
      .collect().map(_.toString).sorted.toSeq
    assert(contentKey(merged) == contentKey(graft.operators.Merge.union(ds2, ds1)))
  }

  // ---- round-trip matrix on the reference's own fixture trees ----
  // (test_io.py:38-129 semantics: load the reference's files, write through
  // our sinks, reload, assert dataset equality — ignore_index where the
  // format drops ids, exactly as the reference's own asserts do)

  private def tmpDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString

  /** assert_dataset_equal(..., ignore_index=True) analogue: image-content
    * keyed annotation multiset (path + category name + boxes), id-free. */
  private def contentKey(ds: graft.model.GraftDataset): Seq[String] = ds.annotations
    .join(ds.images.select(col("id").as("__iid"), col("relative_path")),
      col("image_id") === col("__iid"))
    .select(col("relative_path"), col("category_str"),
      round(col("box_x_min"), 4), round(col("box_y_min"), 4),
      round(col("box_width"), 4), round(col("box_height"), 4))
    .collect().map(_.toString).sorted.toSeq

  test("caipy fixture: to_caipy → from_caipy round-trip is dataset-equal") {
    assume(exists("caipy_dataset/Annotations/train"))
    val ds = Caipy.fromCaipy(spark, s"$base/caipy_dataset")
    assert(ds.numImages == 4 && ds.numAnnotations == 30)
    val t = tmpDir("ref_caipy_rt")
    Caipy.toCaipy(ds, t)
    val back = Caipy.fromCaipy(spark, t)
    assert(graft.operators.Diff.datasetsEqual(ds, back),
      "caipy → caipy round-trip lost content")
  }

  test("caipy fixture: to_coco → from_coco per split merges back equal") {
    assume(exists("caipy_dataset/Annotations/train"))
    val ds = Caipy.fromCaipy(spark, s"$base/caipy_dataset")
    val t = tmpDir("ref_caipy_coco_rt")
    val written = Coco.toCoco(ds, t) // one <name>_<split>.json per split
    def splitFile(s: String) = written.find(_.endsWith(s"_$s.json"))
      .getOrElse(fail(s"toCoco wrote no file for split $s (got $written)"))
    val backTrain = Coco.fromCoco(spark, splitFile("train"), split = Some("train"))
    val backValid = Coco.fromCoco(spark, splitFile("valid"), split = Some("valid"))
    val merged = graft.operators.Merge.union(backTrain, backValid)
    assert(merged.numImages == ds.numImages)
    assert(merged.numAnnotations == ds.numAnnotations)
    assert(contentKey(merged) == contentKey(ds),
      "caipy → coco → merge round-trip lost content")
  }

  test("caipy fixture: to_darknet / to_yolov5 round-trips (ignore_index)") {
    assume(exists("caipy_dataset/Annotations/train"))
    val ds = Caipy.fromCaipy(spark, s"$base/caipy_dataset")
    val names = ds.labelMap.toSeq.sortBy(_._1).map(_._2)
    val t1 = tmpDir("ref_caipy_darknet_rt")
    Darknet.toDarknet(ds, t1)
    val backDk = Darknet.fromDarknet(spark, s"$t1/labels", ds.images, names)
    assert(contentKey(backDk) == contentKey(ds),
      "caipy → darknet round-trip lost content")
    val t2 = tmpDir("ref_caipy_yolo_rt")
    Yolov5.toYolov5(ds, t2)
    val backY5 = DarknetConfig.fromDataYaml(spark, s"$t2/data.yaml", s"$t2/labels",
      ds.images)
    assert(contentKey(backY5) == contentKey(ds),
      "caipy → yolov5 round-trip lost content")
  }

  test("caipy fixture: to_parquet → from_parquet round-trip is dataset-equal") {
    assume(exists("caipy_dataset/Annotations/train"))
    val ds = Caipy.fromCaipy(spark, s"$base/caipy_dataset")
    val t = tmpDir("ref_caipy_parquet_rt")
    ParquetIO.write(ds, t, overwrite = true)
    val back = ParquetIO.read(spark, t)
    assert(graft.operators.Diff.datasetsEqual(ds, back),
      "caipy → parquet round-trip lost content")
  }

  test("darknet fixture: full 4-image load + to_darknet round-trip") {
    assume(exists("darknet_dataset/classes.names"))
    val names = java.nio.file.Files
      .readAllLines(java.nio.file.Paths.get(s"$base/darknet_dataset/classes.names"))
      .toArray.map(_.toString.trim).filter(_.nonEmpty).toSeq
    def loadSplit(split: String) = {
      val imgs = ImagesFolder.fromFolder(spark, s"$base/darknet_dataset/$split", "*.jpg")
      Darknet.fromDarknet(spark, s"$base/darknet_dataset/$split",
        imgs.images, names, split = Some(split))
    }
    val ds = graft.operators.Merge.union(loadSplit("train"), loadSplit("valid"))
    // test_darknet_io: len(dataset) == 4, len_annot() == 30
    assert(ds.numImages == 4 && ds.numAnnotations == 30)
    ds.validated()
    val t = tmpDir("ref_darknet_rt")
    Darknet.toDarknet(ds, t)
    val back = Darknet.fromDarknet(spark, s"$t/labels", ds.images, names)
    assert(contentKey(back) == contentKey(ds),
      "darknet fixture round-trip lost content")
  }

  test("yolov5 fixture: yaml load + to_yolov5 round-trip") {
    assume(exists("yolov5_dataset/yolov5.yaml"))
    val (_, names) = DarknetConfig.parseDataYaml(s"$base/yolov5_dataset/yolov5.yaml")
    def loadSplit(split: String) = {
      val imgs = ImagesFolder.fromFolder(spark,
        s"$base/yolov5_dataset/$split/images", "*.jpg")
      Darknet.fromDarknet(spark, s"$base/yolov5_dataset/$split/labels",
        imgs.images, names, split = Some(split))
    }
    val ds = graft.operators.Merge.union(loadSplit("train"), loadSplit("valid"))
    // test_yolov5_io: len(dataset) == 4, len_annot() == 30
    assert(ds.numImages == 4 && ds.numAnnotations == 30)
    ds.validated()
    val t = tmpDir("ref_yolo_rt")
    Yolov5.toYolov5(ds, t)
    val back = DarknetConfig.fromDataYaml(spark, s"$t/data.yaml", s"$t/labels", ds.images)
    assert(contentKey(back) == contentKey(ds),
      "yolov5 fixture round-trip lost content")
  }

  test("pascalvoc fixture: generic split-folder load + detection variant counts") {
    assume(exists("pascalvoc_dataset/ImageSets/Main"))
    // test_pascalvoc: generic = 6 images / 21 annots (15 objects + 6 parts),
    // splits {train, val, NA}; detection = 5 images / 18 annots
    val generic = PascalVoc.fromPascalVoc(spark,
      s"$base/pascalvoc_dataset/Annotations",
      splitFolder = Some(s"$base/pascalvoc_dataset/ImageSets/Main"))
    assert(generic.numImages == 6)
    assert(generic.numAnnotations == 21)
    val splits = generic.images.select("split").distinct()
      .collect().map(r => Option(r.getString(0))).toSet
    assert(splits == Set(Some("train"), Some("val"), None))
    // parts carry a body_id pointing at an existing root annotation
    val partRows = generic.annotations.filter(col("body_id").isNotNull)
    assert(partRows.count() == 6)
    assert(partRows.join(
      generic.annotations.select(col("id").as("__rid")),
      col("body_id") === col("__rid"), "left_anti").count() == 0)
    val detection = PascalVoc.fromPascalVocDetection(spark, s"$base/pascalvoc_dataset")
    assert(detection.numImages == 5)
    assert(detection.numAnnotations == 18)
  }

  test("mot fixture: head-category load matches reference counts") {
    assume(exists("mot_dataset/gt.txt"))
    // test_mot: category head/0 → 2 images, 80 annotations
    val ds = Mot.fromMot(spark, s"$base/mot_dataset/gt.txt",
      categoryId = 0, categoryStr = "head")
    assert(ds.numImages == 2)
    assert(ds.numAnnotations == 80)
    assert(ds.labelMap == Map(0 -> "head"))
  }

  test("crowdhuman fixture: person+head explode matches reference counts") {
    assume(exists("crowdhuman_dataset/crowdhuman_train.odgt"))
    // test_crowd_human: 3 images, 113 annotations
    val ds = CrowdHuman.fromCrowdHuman(spark,
      s"$base/crowdhuman_dataset/crowdhuman_train.odgt")
    assert(ds.numImages == 3)
    assert(ds.numAnnotations == 113)
  }

  test("remap: the reference's own remap.csv reproduces its test expectations") {
    // replicates test_dataset/test_class_remap.py::test_class_remap_from_csv
    // end to end on the reference's fixtures: 80-category COCO valid set,
    // remap.csv collapses the mapped categories to 3 outputs
    assume(exists("coco_dataset/annotations_valid.json") && exists("remap_dataset/remap.csv"))
    val ds = Coco.fromCoco(spark, s"$base/coco_dataset/annotations_valid.json")
    assert(ds.labelMap.size == 80 && ds.numAnnotations == 21 && ds.numImages == 2)
    val csv = s"$base/remap_dataset/remap.csv"
    val remapped = graft.operators.Remap.remapFromCsv(ds, csv)
    assert(remapped.labelMap.size == 3, s"label map: ${remapped.labelMap}")
    assert(remapped.numAnnotations == 20)
    val keepAll = graft.operators.Remap.remapFromCsv(ds, csv, removeNotMapped = false)
    assert(keepAll.labelMap.size == 71, s"label map size ${keepAll.labelMap.size}")
    assert(keepAll.numAnnotations == 21)
    val emptied = graft.operators.Remap.remapFromCsv(ds, csv,
      removeEmptiedImages = true)
    assert(emptied.labelMap.size == 3)
    assert(emptied.numAnnotations == 20 && emptied.numImages == 1)
  }
}

/** Tagged caipy fixture + its custom JSON schema — schema-driven loading
  * against the reference's own tagged dataset. */
class CaipyTaggedFixtureSpec extends SparkFunSuite {
  private val base = "/root/reference/test_lours/test_data/caipy_dataset/tags"

  test("from_caipy_generic with the reference custom schema booleanizes enum arrays") {
    assume(new java.io.File(s"$base/custom_schema.json").isFile &&
      new java.io.File(s"$base/small_tagged_dataset/Annotations").isDirectory)
    val schema = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$base/custom_schema.json"))
    val enums = graft.io.SchemaUtil.enumArrayFields(
      graft.io.CaipySchema.annotationSubschema(schema).get)
    assert(enums.contains("attributes.colors"))
    val ds = graft.io.CaipyGeneric.fromCaipyGeneric(spark,
      s"$base/small_tagged_dataset/Annotations", split = Some("train"),
      schemaJson = Some(schema))
    assert(ds.numImages == 2 && ds.numAnnotations > 0)
    // enum arrays pivoted into boolean families per the schema
    assert(ds.booleanized("annotations").contains("attributes.colors"))
    assert(ds.annotations.columns.contains("attributes.colors.red"))
    import org.apache.spark.sql.functions._
    assert(ds.annotations.filter(col("`attributes.colors.red`")).count() >= 1)
  }

  test("default-schema 785 fixture reproduces test_caipy_tags expectations") {
    // test_tags.py::test_caipy_tags on the reference's PACKAGED default
    // schema: 1 image / 2 annotations; image tags flatten to dotted
    // columns; enum arrays booleanize to the FULL enum (absent values
    // included); debooleanize restores the array form.
    val schemaPath = java.nio.file.Paths.get(
      "/root/reference/lours/dataset/io/schema_util/default-schema.json")
    assume(java.nio.file.Files.isRegularFile(schemaPath) &&
      new java.io.File(s"$base/default_schema/785.json").isFile)
    val schema = java.nio.file.Files.readString(schemaPath)
    val ds = graft.io.CaipyGeneric.fromCaipyGeneric(spark,
      s"$base/default_schema", schemaJson = Some(schema))
    assert(ds.numImages == 1 && ds.numAnnotations == 2)
    assert(ds.images.columns.contains("tags.time"))
    assert(ds.images.columns.contains("tags.weather"))
    // full enum from the schema, not just values present in the data
    val cols = ds.annotations.columns.toSet
    for (c <- Seq("red", "green", "yellow", "blue", "white", "black", "orange",
        "purple", "grey", "brown", "pink", "beige", "cyan"))
      assert(cols.contains(s"attributes.colors.$c"), s"missing colors.$c")
    for (p <- Seq("side", "front", "top", "back", "unknown"))
      assert(cols.contains(s"attributes.position.$p"), s"missing position.$p")
    for (c <- Seq("attributes.occluded", "parent_id", "children_ids", "confidence"))
      assert(cols.contains(c), s"missing $c")
    // debooleanize round-trip restores the array columns
    var deb = graft.operators.Booleanize.debooleanize(ds, "annotations",
      "attributes.colors")
    deb = graft.operators.Booleanize.debooleanize(deb, "annotations",
      "attributes.position")
    val debCols = deb.annotations.columns.toSet
    assert(debCols.contains("attributes.colors") &&
      debCols.contains("attributes.position"))
    assert(!debCols.exists(_.startsWith("attributes.colors.")))
    import org.apache.spark.sql.functions._
    // 785.json: the person row is blue+white, occluded, confidence 0.5
    val person = ds.annotations.filter(col("category_str") === "person")
    assert(person.filter(col("`attributes.colors.blue`") &&
      col("`attributes.colors.white`") && !col("`attributes.colors.red`") &&
      col("`attributes.occluded`")).count() == 1)
  }
}
