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
  * person row (`fbox`) and one head row (`hbox`) per gt box, with the
  * visible-share attribute derived from `vbox`/`fbox` areas. JSONL is
  * Spark's native json format → fully distributed parse. */
object CrowdHuman {
  def fromCrowdHuman(spark: SparkSession, odgtPath: String,
      imageWidth: Int = 1920, imageHeight: Int = 1080,
      split: Option[String] = None): GraftDataset = {
    val raw = spark.read.json(odgtPath) // JSONL: one record per line
    val images0 = raw.select(
      xxhash64(col("ID")).as("id"),
      lit(imageWidth).as("width"), lit(imageHeight).as("height"),
      concat(col("ID"), lit(".jpg")).as("relative_path"))
    val images = split.map(s => images0.withColumn("split", lit(s))).getOrElse(images0)

    val boxes = raw.select(xxhash64(col("ID")).as("image_id"),
      explode(col("gtboxes")).as("b"))
      .filter(col("b.tag") === "person")
    def fromBox(c: String, idx: Int) = element_at(col(s"b.$c"), idx).cast("double")
    val visibleShare = {
      val vArea = fromBox("vbox", 3) * fromBox("vbox", 4)
      val fArea = fromBox("fbox", 3) * fromBox("fbox", 4)
      when(fArea > 0, vArea / fArea).otherwise(0.0)
    }
    val person = boxes.select(
      col("image_id"), lit(0).as("category_id"),
      fromBox("fbox", 1).as("box_x_min"), fromBox("fbox", 2).as("box_y_min"),
      fromBox("fbox", 3).as("box_width"), fromBox("fbox", 4).as("box_height"),
      visibleShare.as("visible_share"))
    val head = boxes.filter(col("b.hbox").isNotNull).select(
      col("image_id"), lit(1).as("category_id"),
      fromBox("hbox", 1).as("box_x_min"), fromBox("hbox", 2).as("box_y_min"),
      fromBox("hbox", 3).as("box_width"), fromBox("hbox", 4).as("box_height"),
      lit(1.0).as("visible_share"))
    GraftDataset.create(images, person.unionByName(head),
      Map(0 -> "person", 1 -> "head"))
  }
}

/** PascalVOC XML source — reference from_pascalVOC_generic
  * (lours/dataset/io/pascalvoc.py:13-252). No spark-xml dependency is
  * available, so XML documents are read distributed as whole files
  * (`wholetext`) and parsed per-row with the JDK DOM parser inside
  * `mapPartitions` — parser init amortized per partition. */
object PascalVoc {

  case class VocRow(stem: String, width: Int, height: Int, name: String,
      xmin: Double, ymin: Double, xmax: Double, ymax: Double,
      difficult: Boolean, truncated: Boolean)

  private[io] def parseDoc(stem: String, xml: String): Seq[VocRow] = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = f.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    def text(e: org.w3c.dom.Element, tag: String): Option[String] = {
      val nl = e.getElementsByTagName(tag)
      if (nl.getLength == 0) None else Some(nl.item(0).getTextContent.trim)
    }
    val root = doc.getDocumentElement
    val size = root.getElementsByTagName("size").item(0).asInstanceOf[org.w3c.dom.Element]
    val w = text(size, "width").get.toInt
    val h = text(size, "height").get.toInt
    val objs = root.getElementsByTagName("object")
    (0 until objs.getLength).flatMap { i =>
      val o = objs.item(i).asInstanceOf[org.w3c.dom.Element]
      if (o.getParentNode != root) None // skip nested <part> objects
      else {
        val bb = o.getElementsByTagName("bndbox").item(0).asInstanceOf[org.w3c.dom.Element]
        Some(VocRow(stem, w, h, text(o, "name").get,
          text(bb, "xmin").get.toDouble, text(bb, "ymin").get.toDouble,
          text(bb, "xmax").get.toDouble, text(bb, "ymax").get.toDouble,
          text(o, "difficult").exists(_ == "1"), text(o, "truncated").exists(_ == "1")))
      }
    }
  }

  def fromPascalVoc(spark: SparkSession, annotationsDir: String,
      split: Option[String] = None): GraftDataset = {
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
        concat(col("stem"), lit(".jpg")).as("relative_path"))
    val images = split.map(s => images0.withColumn("split", lit(s))).getOrElse(images0)
    val annotations = rowsCached.select(
      xxhash64(col("stem")).as("image_id"),
      nameToId.cast("int").as("category_id"),
      col("xmin").as("box_x_min"), col("ymin").as("box_y_min"),
      (col("xmax") - col("xmin")).as("box_width"),
      (col("ymax") - col("ymin")).as("box_height"),
      col("difficult"), col("truncated"))
    GraftDataset.create(images, annotations, labelMap)
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
