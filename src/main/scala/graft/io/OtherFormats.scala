package graft.io

import graft.model.GraftDataset
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MOT CSV source — reference from_mot (lours/dataset/io/mot.py:9-126).
  * Headerless CSV with fixed columns; `conf == 0` rows dropped; the images
  * table is built from the distinct frame ids. */
object Mot {
  val schema: StructType = StructType(Seq(
    StructField("image_id", LongType), StructField("obj_id", LongType),
    StructField("box_x_min", DoubleType), StructField("box_y_min", DoubleType),
    StructField("box_width", DoubleType), StructField("box_height", DoubleType),
    StructField("confidence", DoubleType),
    StructField("x_world", DoubleType), StructField("y_world", DoubleType)))

  def fromMot(spark: SparkSession, annCsv: String,
      imageWidth: Int = 1920, imageHeight: Int = 1080,
      categoryId: Int = 1, categoryStr: String = "pedestrian",
      split: Option[String] = None): GraftDataset = {
    val raw = spark.read.schema(schema).csv(annCsv)
      .filter(col("confidence") =!= 0.0) // conf==0 dropped (mot.py:79-126)
    val images0 = raw.select(col("image_id").as("id")).distinct()
      .select(col("id"),
        lit(imageWidth).as("width"), lit(imageHeight).as("height"),
        concat(lit("img"), format_string("%06d", col("id")), lit(".jpg"))
          .as("relative_path"))
    val images = split.map(s => images0.withColumn("split", lit(s))).getOrElse(images0)
    val annotations = raw.select(
      col("image_id"), lit(categoryId).as("category_id"),
      col("box_x_min"), col("box_y_min"), col("box_width"), col("box_height"),
      col("confidence"), col("obj_id"), col("x_world"), col("y_world"))
    GraftDataset.create(images, annotations, Map(categoryId -> categoryStr))
  }
}

/** CrowdHuman ODGT (JSON-lines) source — reference from_crowd_human
  * (lours/dataset/io/crowd_human.py:14-134). Each record explodes into one
  * person row (`vbox` by default, `fbox` when `visibleBox=false`) and one
  * head row (`hbox`) per gt box. `tag == "mask"` boxes, `extra.ignore == 1`
  * boxes, and `head_attr.ignore == 1` heads are skipped; heads carry a NaN
  * visible_share ("we don't know how visible each head is"); remaining
  * `extra`/`head_attr` attributes carry through as columns (head_attr wins
  * on head rows, dict-merge order) with `unsure` null-filled to 0; boxes
  * are capped to image bounds at the end — all per the reference loader.
  * JSONL is Spark's native json format → fully distributed parse. */
object CrowdHuman {
  def fromCrowdHuman(spark: SparkSession, odgtPath: String,
      imageWidth: Int = 1920, imageHeight: Int = 1080,
      visibleBox: Boolean = true,
      split: Option[String] = None): GraftDataset = {
    val raw = spark.read.json(odgtPath) // JSONL: one record per line
    val images0 = raw.select(
      xxhash64(col("ID")).as("id"),
      lit(imageWidth).as("width"), lit(imageHeight).as("height"),
      concat(col("ID"), lit(".jpg")).as("relative_path"))
    val images = split.map(s => images0.withColumn("split", lit(s))).getOrElse(images0)

    // schema-safe access: the odgt dialect may omit extra/head_attr entirely
    val gtSchema = raw.schema("gtboxes").dataType
      .asInstanceOf[ArrayType].elementType.asInstanceOf[StructType]
    def attrFields(parent: String): Seq[String] =
      gtSchema.fields.find(_.name == parent).map(_.dataType) match {
        case Some(st: StructType) => st.fieldNames.toSeq.filterNot(_ == "ignore")
        case _ => Nil
      }
    def hasIgnore(parent: String): Boolean =
      gtSchema.fields.find(_.name == parent).map(_.dataType) match {
        case Some(st: StructType) => st.fieldNames.contains("ignore")
        case _ => false
      }

    val boxes0 = raw.select(xxhash64(col("ID")).as("image_id"),
      explode(col("gtboxes")).as("b"))
      // masks skipped (crowd_human.py:85-86); Python's `tag == "mask"` is
      // False for None, so a null/absent tag is KEPT — `=!=` alone would
      // evaluate null and silently drop tag-less dialect records
      .filter(col("b.tag").isNull || col("b.tag") =!= "mask")
    // extra.ignore == 1 drops BOTH the person and its head (py:88-89)
    val boxes =
      if (hasIgnore("extra"))
        boxes0.filter(col("b.extra.ignore").isNull || col("b.extra.ignore") =!= 1)
      else boxes0

    def fromBox(c: String, idx: Int) = element_at(col(s"b.$c"), idx).cast("double")
    // visible_share = vbox area / fbox area on BOTH variants (py:91-94)
    val visibleShare = {
      val vArea = fromBox("vbox", 3) * fromBox("vbox", 4)
      val fArea = fromBox("fbox", 3) * fromBox("fbox", 4)
      when(fArea > 0, vArea / fArea).otherwise(lit(Double.NaN))
    }
    val extraNames = attrFields("extra")
    val headNames = attrFields("head_attr")
    // merged-dict column order: extra first, head_attr additions after;
    // on head rows head_attr values overlay same-named extra keys (py:96-115)
    val attrNames = extraNames ++ headNames.filterNot(extraNames.contains)
    def attrCols(headRow: Boolean): Seq[org.apache.spark.sql.Column] = attrNames.map { n =>
      val fromHead = headRow && headNames.contains(n)
      val src = if (fromHead) s"b.head_attr.$n"
        else if (extraNames.contains(n)) s"b.extra.$n" else ""
      (if (src.isEmpty) lit(null) else col(src)).as(n)
    }

    val pBox = if (visibleBox) "vbox" else "fbox"
    val person = boxes.select(Seq(
      col("image_id"), lit(0).as("category_id"),
      fromBox(pBox, 1).as("box_x_min"), fromBox(pBox, 2).as("box_y_min"),
      fromBox(pBox, 3).as("box_width"), fromBox(pBox, 4).as("box_height"),
      visibleShare.as("visible_share")) ++ attrCols(headRow = false): _*)
    val heads0 = boxes.filter(col("b.hbox").isNotNull)
    val heads = // head_attr.ignore == 1 drops the head only (py:102-103)
      if (hasIgnore("head_attr"))
        heads0.filter(col("b.head_attr.ignore").isNull || col("b.head_attr.ignore") =!= 1)
      else heads0
    val head = heads.select(Seq(
      col("image_id"), lit(1).as("category_id"),
      fromBox("hbox", 1).as("box_x_min"), fromBox("hbox", 2).as("box_y_min"),
      fromBox("hbox", 3).as("box_width"), fromBox("hbox", 4).as("box_height"),
      lit(Double.NaN).as("visible_share")) ++ attrCols(headRow = true): _*)
    var ann = person.unionByName(head)
    if (attrNames.contains("unsure")) // unsure fillna(0) (py:127)
      ann = ann.na.fill(0, Seq("unsure"))
    graft.functions.Bbox.capBoxes(GraftDataset.create(images, ann,
      Map(0 -> "person", 1 -> "head"))) // .cap_bounding_box_coordinates() (py:129-134)
  }
}

/** PascalVOC XML source — reference from_pascalVOC_generic
  * (lours/dataset/io/pascalvoc.py:13-252). No spark-xml dependency is
  * available, so XML documents are read distributed as whole files
  * (`wholetext`) and parsed per-row with the JDK DOM parser inside
  * `mapPartitions` — parser init amortized per partition. */
object PascalVoc {

  /** One annotation row: a root `<object>` (`bodyOrd = -1`) or one of its
    * `<part>` children (`bodyOrd` = the parent object's in-document
    * ordinal — the reference's `body_id` link, pascalvoc.py:95-125). `ord`
    * is the row's own in-document emission ordinal (id basis). */
  case class VocRow(stem: String, width: Int, height: Int, name: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double,
      difficult: Boolean, truncated: Boolean, ord: Int, bodyOrd: Int)

  private[io] def parseDoc(stem: String, xml: String): Seq[VocRow] = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    // direct-child matching: an object's own <name>/<bndbox> must not be
    // confused with those of its nested <part> elements (element order
    // inside <object> is not fixed across VOC dialects)
    def children(e: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
      val nl = e.getChildNodes
      (0 until nl.getLength).map(nl.item).collect {
        case el: org.w3c.dom.Element if el.getTagName == tag => el
      }
    }
    def text(e: org.w3c.dom.Element, tag: String): Option[String] =
      children(e, tag).headOption.map(_.getTextContent.trim)
    def box(e: org.w3c.dom.Element): (Double, Double, Double, Double) = {
      val bb = children(e, "bndbox").head
      (text(bb, "xmin").get.toDouble, text(bb, "ymin").get.toDouble,
        text(bb, "xmax").get.toDouble, text(bb, "ymax").get.toDouble)
    }
    val root = doc.getDocumentElement
    val size = children(root, "size").head
    val w = text(size, "width").get.toInt
    val h = text(size, "height").get.toInt
    var ord = -1
    children(root, "object").flatMap { o =>
      ord += 1
      val myOrd = ord
      val (x0, y0, x1, y1) = box(o)
      val main = VocRow(stem, w, h, text(o, "name").get, x0, y0, x1, y1,
        text(o, "difficult").exists(_ == "1"),
        text(o, "truncated").exists(_ == "1"), myOrd, -1)
      // <part> children become annotation rows of their own, linked to
      // the parent via bodyOrd (reference: body_id, pascalvoc.py:95-125)
      val partRows = children(o, "part").map { p =>
        ord += 1
        val (px0, py0, px1, py1) = box(p)
        VocRow(stem, w, h, text(p, "name").get, px0, py0, px1, py1,
          difficult = false, truncated = false, ord, myOrd)
      }
      main +: partRows
    }
  }

  /** Read `<split>.txt` stem lists from a split folder (pascalvoc.py:68-87:
    * one file per split value, mutually exclusive; a missing file is an
    * empty split). Returns stem → split.
    *
    * Reads through the Hadoop FileSystem API so the split folder may live
    * on any filesystem the annotation XMLs do (hdfs/s3/local) — java.nio
    * would silently yield empty splits for a non-local URI, and
    * fromPascalVocDetection would then drop every image with no error.
    * A missing split FOLDER fails fast (it was explicitly requested); a
    * missing individual split file stays an empty split, as the reference's
    * FileNotFoundError handler does. */
  private[io] def readSplitFolder(splitFolder: String,
      splitValues: Seq[String],
      hadoopConf: org.apache.hadoop.conf.Configuration): Map[String, String] = {
    val folder = new org.apache.hadoop.fs.Path(splitFolder)
    val fs = folder.getFileSystem(hadoopConf)
    require(fs.exists(folder),
      s"Split folder '$splitFolder' does not exist or is unreachable")
    val sets = splitValues.map { v =>
      val p = new org.apache.hadoop.fs.Path(folder, s"$v.txt")
      v -> (if (fs.isFile(p)) {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .map(_.trim).filter(_.nonEmpty).toSet
        finally in.close()
      } else Set.empty[String])
    }
    for (Seq((a, sa), (b, sb)) <- sets.combinations(2)) {
      val overlap = sa & sb
      require(overlap.isEmpty, s"Splits $a and $b have non null overlap: $overlap")
    }
    sets.flatMap { case (v, ss) => ss.map(_ -> v) }.toMap
  }

  def fromPascalVoc(spark: SparkSession, annotationsDir: String,
      split: Option[String] = None,
      splitFolder: Option[String] = None,
      splitValues: Seq[String] = Seq("train", "val")): GraftDataset = {
    import spark.implicits._
    // recursive + dir-relative stems: nested XML trees load, and images in
    // different subdirectories with the same basename keep distinct ids
    val files = spark.read.option("wholetext", true)
      .option("recursiveFileLookup", "true").option("pathGlobFilter", "*.xml")
      .text(annotationsDir)
      .select(Stems.relativeStem(spark, annotationsDir, input_file_name(), ".xml")
        .as("stem"), col("value"))
      .as[(String, String)]
    val rows = files.mapPartitions(_.flatMap { case (stem, xml) => parseDoc(stem, xml) })
      .toDF()
    val rowsCached = rows.cache()
    // label map: distinct names, sorted, 0-based (pascalvoc.py label inference)
    val names = rowsCached.select("name").distinct().collect().map(_.getString(0)).sorted
    val labelMap = names.zipWithIndex.map(_.swap).toMap
    val nameToId = element_at(
      map(names.zipWithIndex.flatMap { case (n, i) => Seq(lit(n), lit(i)) }.toSeq: _*),
      col("name"))
    val images0 = rowsCached.groupBy("stem").agg(
      first("width").as("width"), first("height").as("height"))
      .select(xxhash64(col("stem")).as("id"), col("width"), col("height"),
        concat(col("stem"), lit(".jpg")).as("relative_path"), col("stem"))
    // split assignment: an explicit split-folder (stem lists) wins over a
    // constant split; unlisted stems keep a null split (pascalvoc.py:89-93)
    val images = (splitFolder match {
      case Some(sf) =>
        val stemToSplit =
          readSplitFolder(sf, splitValues, spark.sparkContext.hadoopConfiguration)
        val splitExpr =
          if (stemToSplit.isEmpty) lit(null).cast("string")
          else element_at(map(stemToSplit.toSeq
            .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*), col("stem"))
        images0.withColumn("split", splitExpr)
      case None =>
        split.map(s => images0.withColumn("split", lit(s))).getOrElse(images0)
    }).drop("stem")
    // stable in-document ids: parts link to their root object via body_id
    // (reference pascalvoc.py:95-125); both hash (stem, ordinal)
    val annotations = rowsCached.select(
      xxhash64(col("stem"), col("ord")).as("id"),
      xxhash64(col("stem")).as("image_id"),
      nameToId.cast("int").as("category_id"),
      col("xmin").as("box_x_min"), col("ymin").as("box_y_min"),
      (col("xmax") - col("xmin")).as("box_width"),
      (col("ymax") - col("ymin")).as("box_height"),
      col("difficult"), col("truncated"),
      when(col("bodyOrd") >= 0, xxhash64(col("stem"), col("bodyOrd"))).as("body_id"))
    GraftDataset.create(images, annotations, labelMap)
  }

  /** from_pascalVOC_detection (pascalvoc.py:210-252): the official VOC
    * layout — Annotations/ + JPEGImages/ + ImageSets/Main split lists —
    * with images in no split dropped. */
  def fromPascalVocDetection(spark: SparkSession, root: String): GraftDataset = {
    val ds = fromPascalVoc(spark, s"$root/Annotations",
      splitFolder = Some(s"$root/ImageSets/Main"))
    graft.operators.Locators.filterImages(ds, col("split").isNotNull)
  }
}

/** Image-folder source — reference from_folder
  * (lours/dataset/io/images_folder.py:9-113): an images-only dataset from a
  * directory tree; dimensions probed from file headers (PNG IHDR + JPEG
  * SOF markers, pure-JVM, inside the distributed binaryFile scan). */
object ImagesFolder {

  /** Minimal header probe: PNG and JPEG dimensions; (0,0) if unknown. */
  private[graft] def probeDims(bytes: Array[Byte]): (Int, Int) = {
    def u16(i: Int) = ((bytes(i) & 0xFF) << 8) | (bytes(i + 1) & 0xFF)
    def i32(i: Int) = ((bytes(i) & 0xFF) << 24) | ((bytes(i + 1) & 0xFF) << 16) |
      ((bytes(i + 2) & 0xFF) << 8) | (bytes(i + 3) & 0xFF)
    if (bytes.length > 24 && bytes(0) == 0x89.toByte && bytes(1) == 'P')
      (i32(16), i32(20)) // PNG IHDR
    else if (bytes.length > 4 && bytes(0) == 0xFF.toByte && bytes(1) == 0xD8.toByte) {
      // JPEG: scan segments for SOF0..SOF15 (except DHT/DAC/RST)
      var i = 2
      while (i + 9 < bytes.length) {
        if (bytes(i) != 0xFF.toByte) return (0, 0)
        val marker = bytes(i + 1) & 0xFF
        val len = u16(i + 2)
        if (marker >= 0xC0 && marker <= 0xCF && marker != 0xC4 && marker != 0xC8 && marker != 0xCC)
          return (u16(i + 7), u16(i + 5))
        i += 2 + len
      }
      (0, 0)
    } else (0, 0)
  }

  def fromFolder(spark: SparkSession, dir: String,
      pattern: String = "*.{png,jpg,jpeg}",
      split: Option[String] = None): GraftDataset = {
    import spark.implicits._
    val files = spark.read.format("binaryFile")
      .option("pathGlobFilter", pattern)
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
    val probed = files.map { case (path, content) =>
      val (w, h) = probeDims(content)
      val rel = path.substring(path.lastIndexOf('/') + 1)
      (rel, w, h)
    }.toDF("relative_path", "width", "height")
    val images0 = probed.select(
      xxhash64(col("relative_path")).as("id"),
      col("width"), col("height"), col("relative_path"))
    val images = split.map(s => images0.withColumn("split", lit(s))).getOrElse(images0)
    val emptyAnn = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("id", LongType), StructField("image_id", LongType),
        StructField("category_id", IntegerType),
        StructField("box_x_min", DoubleType), StructField("box_y_min", DoubleType),
        StructField("box_width", DoubleType), StructField("box_height", DoubleType))))
    GraftDataset.create(images, emptyAnn, Map.empty, dir)
  }
}
