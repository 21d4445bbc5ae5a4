package graft

import graft.model.{GraftDataset, LabelMaps}
import graft.operators.{Booleanize, Merge}
import org.apache.spark.sql.functions._

/** Ports of the reference's docstring examples (doctests) — the reference
  * runs these as tests (pyproject.toml:94-96), so they are its de-facto
  * spec. Each case rebuilds the doctest's LITERAL input frames and asserts
  * the PRINTED output values, not just shapes. Families covered here:
  * constructor defaulting (dataset.py:99-163), booleanize/debooleanize
  * (dataset.py:3047-3338), merge/+ (dataset.py:2405-2560), label-map
  * merging (label_map_merger.py:29-48). The evaluation/histogram/IO
  * families have their own parity suites (ReferenceFixtureSpec,
  * ReferenceIoFixtureSpec). */
class DoctestParitySpec extends SparkFunSuite {
  import spark.implicits._

  test("constructor doctest: type/category_str derivation on the literal frames") {
    // dataset.py:116-160: two images with explicit ids/splits, two
    // annotations with ids 2,3, label map {0: this, 1: that}
    val images = Seq(
      (0L, 1920, 1080, "0.jpg", "train"),
      (1L, 1280, 720, "1.jpg", "valid")
    ).toDF("id", "width", "height", "relative_path", "split")
    val annotations = Seq(
      (2L, 0L, 1, 10.0, 30.0, 100.0, 200.0),
      (3L, 1L, 0, 20.0, 40.0, 200.0, 300.0)
    ).toDF("id", "image_id", "category_id",
      "box_x_min", "box_y_min", "box_width", "box_height")
    val ds = GraftDataset.create(images, annotations,
      Map(0 -> "this", 1 -> "that"), datasetName = Some("my_dataset"))
    assert(ds.numImages == 2 && ds.numAnnotations == 2)
    // printed repr: type ".jpg" (Path.suffix keeps the dot)
    assert(ds.images.orderBy("id").collect().map(_.getAs[String]("type")).toSeq
      == Seq(".jpg", ".jpg"))
    // printed repr: id 2 → category 1 → "that", id 3 → category 0 → "this"
    val anns = ds.annotations.orderBy("id").collect()
    assert(anns.map(_.getAs[String]("category_str")).toSeq == Seq("that", "this"))
    // box columns printed as floats (30.0, 100.0 …) — dtype coercion to double
    assert(anns.map(_.getAs[Double]("box_y_min")).toSeq == Seq(30.0, 40.0))
    assert(anns.map(_.getAs[Double]("box_width")).toSeq == Seq(100.0, 200.0))
  }

  /** The booleanize/debooleanize doctest corpus (dataset.py:3047-3120):
    * 3 images with two list columns, 3 annotations with one. */
  private def booleanizeDoctestDataset(): GraftDataset = {
    val images = Seq(
      (0L, 342, 167, "0.jpg", Seq("enough"), Seq("challenge", "someone")),
      (1L, 377, 114, "1.jpg", Seq("present", "successful"), Seq("challenge")),
      (2L, 136, 257, "2.jpg", Seq("present", "successful", "enough"),
        Seq("challenge", "someone"))
    ).toDF("id", "width", "height", "relative_path", "beyond", "father")
    val annotations = Seq(
      (0L, 2L, 19, 138.451739, Seq("no", "season", "play", "choice", "force", "bit")),
      (1L, 1L, 19, 63.576932, Seq("no", "choice", "force")),
      (2L, 2L, 15, 99.999123, Seq("no", "season", "play", "week", "bit"))
    ).toDF("id", "image_id", "category_id", "box_height", "where")
      .withColumn("box_x_min", lit(1.0)).withColumn("box_y_min", lit(2.0))
      .withColumn("box_width", lit(3.0))
    GraftDataset.create(images, annotations,
      Map(15 -> "step", 19 -> "why", 25 -> "interview"),
      datasetName = Some("inside_else_memory"), imagesRoot = "such/serious")
  }

  test("booleanize doctest: inferred domains, printed flags, family tracking") {
    val ds = booleanizeDoctestDataset()
    val modified = Booleanize.booleanize(
      Booleanize.booleanize(ds, "images", "beyond"), "annotations", "where")
    // printed: images go 7 → 9 columns (beyond → enough/present/successful),
    // annotations 9 → 15 (where → 7 flags)
    val imgFlags = Booleanize.boolColumns(modified.images, "beyond")
    assert(imgFlags == Seq("beyond.enough", "beyond.present", "beyond.successful"))
    val annFlags = Booleanize.boolColumns(modified.annotations, "where")
    assert(annFlags == Seq("where.bit", "where.choice", "where.force", "where.no",
      "where.play", "where.season", "where.week"))
    // printed image flag values (rows in id order)
    val im = modified.images.orderBy("id").collect()
    assert(im.map(_.getAs[Boolean]("beyond.enough")).toSeq == Seq(true, false, true))
    assert(im.map(_.getAs[Boolean]("beyond.present")).toSeq == Seq(false, true, true))
    assert(im.map(_.getAs[Boolean]("beyond.successful")).toSeq == Seq(false, true, true))
    // printed annotation flag values
    val an = modified.annotations.orderBy("id").collect()
    assert(an.map(_.getAs[Boolean]("where.play")).toSeq == Seq(true, false, true))
    assert(an.map(_.getAs[Boolean]("where.season")).toSeq == Seq(true, false, true))
    assert(an.map(_.getAs[Boolean]("where.week")).toSeq == Seq(false, false, true))
    assert(an.map(_.getAs[Boolean]("where.choice")).toSeq == Seq(true, true, false))
    // printed booleanized_columns = {'images': {'beyond'}, 'annotations': {'where'}}
    assert(modified.booleanized("images") == Set("beyond"))
    assert(modified.booleanized("annotations") == Set("where"))
    // untouched list column survives as-is
    assert(im(1).getAs[scala.collection.Seq[String]]("father").toSeq
      == Seq("challenge"))

    // explicit-enum variant (dataset.py:3129-3147): only the given values
    // become flags, annotations stay untouched
    val explicit = Booleanize.booleanize(ds, "images", "beyond",
      Some(Seq("enough", "successful")))
    val ex = explicit.images.orderBy("id").collect()
    assert(Booleanize.boolColumns(explicit.images, "beyond")
      == Seq("beyond.enough", "beyond.successful"))
    assert(ex.map(_.getAs[Boolean]("beyond.enough")).toSeq == Seq(true, false, true))
    assert(ex.map(_.getAs[Boolean]("beyond.successful")).toSeq == Seq(false, true, true))
    assert(explicit.annotations.columns.contains("where"))
  }

  test("debooleanize doctest: lists rebuilt sorted, per-table variant") {
    val ds = booleanizeDoctestDataset()
    val modified = Booleanize.booleanize(
      Booleanize.booleanize(ds, "images", "beyond"), "annotations", "where")
    // printed round trip (dataset.py:3276-3305): value order is the flag
    // (alphabetical) order, NOT the original list order — row 2's input
    // [present, successful, enough] prints back [enough, present, successful]
    val back = Booleanize.debooleanize(
      Booleanize.debooleanize(modified, "images", "beyond"),
      "annotations", "where")
    val im = back.images.orderBy("id").collect()
    assert(im.map(_.getAs[scala.collection.Seq[String]]("beyond").toSeq).toSeq == Seq(
      Seq("enough"), Seq("present", "successful"),
      Seq("enough", "present", "successful")))
    val an = back.annotations.orderBy("id").collect()
    assert(an.map(_.getAs[scala.collection.Seq[String]]("where").toSeq).toSeq == Seq(
      Seq("bit", "choice", "force", "no", "play", "season"),
      Seq("choice", "force", "no"),
      Seq("bit", "no", "play", "season", "week")))
    assert(back.booleanized("images").isEmpty
      && back.booleanized("annotations").isEmpty)
    // dataframe="images" variant (dataset.py:3306-3331): annotations keep
    // their flags
    val partial = Booleanize.debooleanize(modified, "images", "beyond")
    assert(partial.images.columns.contains("beyond"))
    assert(partial.annotations.columns.contains("where.play"))
    assert(partial.booleanized("annotations") == Set("where"))
  }

  test("booleanizer module golden: null/empty lists, absent enum values (reference replay)") {
    // goldens from running the reference's column_booleanizer.booleanize/
    // debooleanize on the literal frame {tags: [a,b] / None / [] / [b,c]}:
    //   flags  -> row0 (T,T,F), rows 1+2 all-False (null AND empty both),
    //             row3 (F,T,T); null rows are also EXCLUDED from domain
    //             deduction (the dropna rule), so the inferred domain is
    //             exactly {a,b,c}
    //   deboole-> rows 1+2 come back as EMPTY lists, not nulls
    //   explicit enum {b, zz} -> only those two flags; the absent value
    //             'zz' yields an all-False column
    val df = Seq(
      (0L, Option(Seq("a", "b"))),
      (1L, Option.empty[Seq[String]]),
      (2L, Option(Seq.empty[String])),
      (3L, Option(Seq("b", "c")))
    ).toDF("id", "tags")
    val (out, domain) = Booleanize.booleanizeColumn(df, "tags")
    assert(domain == Set("a", "b", "c"), "null rows must not add to the domain")
    val rows = out.orderBy("id").collect()
    def flags(i: Int) = Seq("tags.a", "tags.b", "tags.c")
      .map(c => rows(i).getAs[Boolean](c))
    assert(flags(0) == Seq(true, true, false))
    assert(flags(1) == Seq(false, false, false), "null list must flag all-False")
    assert(flags(2) == Seq(false, false, false), "empty list must flag all-False")
    assert(flags(3) == Seq(false, true, true))
    // round trip: null and empty both return as EMPTY lists (the printed
    // reference output), never null
    val back = Booleanize.debooleanizeColumn(out, "tags").orderBy("id").collect()
    assert(back.map(_.getAs[scala.collection.Seq[String]]("tags").toSeq).toSeq
      == Seq(Seq("a", "b"), Seq(), Seq(), Seq("b", "c")))
    // explicit enum including a value absent from the data
    val (explicit, dom2) = Booleanize.booleanizeColumn(df, "tags",
      Some(Seq("b", "zz")))
    assert(dom2 == Set("b", "zz"))
    val er = explicit.orderBy("id").collect()
    assert(er.map(_.getAs[Boolean]("tags.b")).toSeq
      == Seq(true, false, false, true))
    assert(er.forall(!_.getAs[Boolean]("tags.zz")),
      "an enum value absent from the data must be an all-False column")
  }

  /** The merge doctest pair (dataset.py:2405-2560). */
  private def mergeDoctestPair(): (GraftDataset, GraftDataset) = {
    val e1 = GraftDataset.create(
      Seq((0L, 342, 136, "help/me.jpeg", "train"),
        (1L, 377, 167, "whatever/wait.png", "train"))
        .toDF("id", "width", "height", "relative_path", "split"),
      Seq((0L, 0L, 15, 73.932999, 71.552480, 42.673983),
        (1L, 0L, 19, 4.567638, 248.551257, 122.602211))
        .toDF("id", "image_id", "category_id", "box_y_min", "box_width", "box_height")
        .withColumn("box_x_min", lit(10.0)),
      Map(15 -> "step", 19 -> "why", 25 -> "interview"),
      imagesRoot = "such/serious", datasetName = Some("inside_else_memory"))
    val e2 = GraftDataset.create(
      Seq((0L, 955, 229, "determine/story.jpg", "train"),
        (1L, 131, 840, "air/method.bmp", "train"))
        .toDF("id", "width", "height", "relative_path", "split"),
      Seq((0L, 1L, 14, 276.974642, 9.718823, 184.684056),
        (1L, 0L, 22, 6.311037, 123.141689, 174.239136))
        .toDF("id", "image_id", "category_id", "box_y_min", "box_width", "box_height")
        .withColumn("box_x_min", lit(20.0)),
      Map(14 -> "listen", 15 -> "marriage", 22 -> "reach"),
      imagesRoot = "care/suggest", datasetName = Some("shake_effort_many"))
    (e1, e2)
  }

  test("merge doctest: + realigns the label map, re-roots and re-indexes") {
    val (e1, e2) = mergeDoctestPair()
    // plain merge raises the label-map incompatibility (id 15: step vs
    // marriage) — the doctest's IncompatibleLabelMapsError
    val err = intercept[IllegalArgumentException] { Merge.merge(e1, e2).images.count() }
    assert(err.getMessage.contains("label map"))

    val merged = Merge.plus(e1, e2)
    // printed: 4 images and 4 objects, name concatenation, common root "."
    assert(merged.numImages == 4 && merged.numAnnotations == 4)
    assert(merged.datasetName.contains("inside_else_memory+shake_effort_many"))
    assert(merged.imagesRoot == ".")
    // printed label map after the {14: 14, 15: 16, 22: 22} remap
    assert(merged.labelMap == Map(14 -> "listen", 15 -> "step", 16 -> "marriage",
      19 -> "why", 22 -> "reach", 25 -> "interview"))
    // printed images: paths re-prefixed with the former roots; e2's rows get
    // ids 2,3 in relative_path sort order (air/method.bmp before
    // determine/story.jpg — the reference's reset_index default)
    val im = merged.images.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[String]("relative_path"))).toSeq
    assert(im == Seq(
      0L -> "such/serious/help/me.jpeg",
      1L -> "such/serious/whatever/wait.png",
      2L -> "care/suggest/air/method.bmp",
      3L -> "care/suggest/determine/story.jpg"))
    // printed annotations: e2's listen/reach rows follow their images to
    // ids 2/3 with remapped category ids, annotation ids shifted to 2,3
    val an = merged.annotations.orderBy("id").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("image_id"),
        r.getAs[String]("category_str"), r.getAs[Int]("category_id"))).toSeq
    assert(an == Seq(
      (0L, 0L, "step", 15), (1L, 0L, "why", 19),
      (2L, 2L, "listen", 14), (3L, 3L, "reach", 22)))
  }

  test("merge doctest: explicit remap + ignore-index path matches +") {
    // dataset.py:2511-2546: merge(other.remap_classes({15: 1},
    // remove_not_mapped=False), ignore_index=True) also succeeds — here via
    // plus, whose row-incompatibility branch IS ignore_index
    val (e1, e2) = mergeDoctestPair()
    val remapped = graft.operators.Remap.remapClasses(
      e2, Map(15 -> 1), Map.empty, removeNotMapped = false)
    assert(remapped.labelMap == Map(14 -> "listen", 1 -> "marriage", 22 -> "reach"))
    val merged = Merge.plus(e1, remapped)
    assert(merged.numImages == 4 && merged.numAnnotations == 4)
    assert(merged.labelMap == Map(1 -> "marriage", 14 -> "listen", 15 -> "step",
      19 -> "why", 22 -> "reach", 25 -> "interview"))
  }

  /** The remove_invalid_annotations doctest corpus (dataset.py:1265-1290),
    * rebuilt from the repr the doctest PRINTS (dummy_dataset(2, 4, seed=1)
    * needs the faker package, absent offline — but the doctest shows every
    * load-bearing value, so the literal frames ARE the doctest's input;
    * box_x_min is elided by the repr's `...` and set to an in-range 0.0,
    * which no assertion touches). */
  private def invalidAnnDoctest(badIds: Seq[Long]) = {
    val images = Seq(
      (0L, 955, 229, "determine/story.jpg", "eval"),
      (1L, 131, 840, "air/method.bmp", "train")
    ).toDF("id", "width", "height", "relative_path", "split")
    val annotations = Seq(
      (0L, 1L, 15, 0.0, 276.974642, 353.331683, 353.331683),
      (1L, 0L, 14, 0.0, 64.213606, 358.653949, 116.336568),
      (2L, 0L, 22, 0.0, 69.431616, 525.305264, 41.677117),
      (3L, 1L, 14, 0.0, 380.938227, 36.133726, 442.881021)
    ).toDF("id", "image_id", "category_id",
      "box_x_min", "box_y_min", "box_width", "box_height")
      // the doctest corrupts box_width post-construction (loc[ids] = -1)
      .withColumn("box_width",
        when(col("id").isin(badIds: _*), -1.0).otherwise(col("box_width")))
    GraftDataset.create(images, annotations,
      Map(14 -> "listen", 15 -> "marriage", 22 -> "reach"),
      datasetName = Some("shake_effort_many"))
  }

  test("remove_invalid_annotations doctest: default drops the bad box only") {
    // dataset.py:1290-1309: "Removed 1 annotation, in 1 image" →
    // 2 images and 3 objects, ids 1, 2, 3 survive
    val ds = invalidAnnDoctest(badIds = Seq(0L))
    val out = graft.operators.Locators.removeInvalidAnnotations(ds)
    assert(out.numImages == 2 && out.numAnnotations == 3)
    val kept = out.annotations.orderBy("id").collect()
    assert(kept.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L, 3L))
    // the printed message's counts: 1 annotation removed, in 1 image
    assert(ds.numAnnotations - out.numAnnotations == 1)
    assert(kept.map(_.getAs[String]("category_str")).toSeq
      == Seq("listen", "reach", "listen"))
    assert(out.labelMap == Map(14 -> "listen", 15 -> "marriage", 22 -> "reach"))
  }

  test("remove_invalid_annotations doctest: remove_related_images drops the image") {
    // dataset.py:1313-1330: "Removed 1 image with invalid annotations" →
    // 1 image and 2 objects; image 1 goes, its VALID annotation 3 goes too
    val ds = invalidAnnDoctest(badIds = Seq(0L))
    val out = graft.operators.Locators.removeInvalidAnnotations(ds,
      removeRelatedImages = true)
    assert(out.numImages == 1 && out.numAnnotations == 2)
    assert(out.images.collect().map(_.getAs[Long]("id")).toSeq == Seq(0L))
    assert(out.annotations.orderBy("id").collect()
      .map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
  }

  test("remove_invalid_annotations doctest: remove_emptied_images cascades") {
    // dataset.py:1334-1380: ids 0 AND 3 corrupted → "Removed 2
    // annotations, in 1 image" → image 1 emptied and dropped
    val ds = invalidAnnDoctest(badIds = Seq(0L, 3L))
    val out = graft.operators.Locators.removeInvalidAnnotations(ds,
      removeEmptiedImages = true)
    assert(out.numImages == 1 && out.numAnnotations == 2)
    assert(out.images.collect().map(_.getAs[Long]("id")).toSeq == Seq(0L))
    assert(out.annotations.orderBy("id").collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Double]("box_width"))).toSeq
      == Seq((1L, 358.653949), (2L, 525.305264)))
  }

  test("label_map_merger doctest: inner subset, outer union, conflicts") {
    // label_map_merger.py:29-48, values asserted verbatim
    val m1 = Map(0 -> "car", 1 -> "person", 2 -> "truck")
    val m2 = Map(0 -> "car", 1 -> "person")
    assert(LabelMaps.mergeInner(m1, m2) == m1)
    val m2b = m2 + (3 -> "head")
    intercept[IllegalArgumentException] { LabelMaps.mergeInner(m1, m2b) }
    assert(LabelMaps.mergeOuter(m1, m2b)
      == Map(0 -> "car", 1 -> "person", 2 -> "truck", 3 -> "head"))
    val m2c = m2b + (0 -> "vehicle")
    intercept[IllegalArgumentException] { LabelMaps.mergeOuter(m1, m2c) }
  }
}
