package graft.queries

import graft.Tables
import graft.functions.Bbox
import graft.io.{Caipy, Coco, CrowdHuman, Darknet, DarknetConfig, ImagesFolder, Jsonl, Mot, ParquetIO, WebDataset, Yolov5}
import graft.model.GraftDataset
import graft.operators.Locators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Correctness-gate queries for the format hub (SURVEY §2.1/§2.2).
  *
  * Pattern: derive a deterministic dataset from the sfDir parquet tables,
  * push it THROUGH the format (our sink → our loader, or a
  * Spark-constructed fixture file → our loader), and aggregate the loaded
  * canonical tables. The DuckDB oracle computes the same aggregate straight
  * from the parquet tables — if any stage of the serializer/parser drops,
  * mangles, or re-types rows, the hash differs. This is the reference's own
  * IO integration bar (test_lours/test_dataset/test_io.py:38-129),
  * cross-engine-verified instead of fixture-pinned.
  */
object IoQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  /** 'P' split ∩ id%mod=0 — per-image-file formats take a larger mod so
    * file-count overhead doesn't dominate the timed bench (ADVICE r2). */
  private def subset(s: SparkSession, d: String, mod: Int = 10): GraftDataset =
    Locators.filterImages(
      Locators.getSplit(Tables.datasetView(s, d), Some("P")),
      col("id") % mod === 0)
      .copy(datasetName = Some("rt"))

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** The standard roundtrip aggregate: per category, row count + box sums +
    * distinct-image count (image ids may be re-minted by a loader, but
    * their cardinality must survive). */
  private def annAgg(ann: DataFrame): DataFrame =
    ann.groupBy(col("category_id"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("box_width")), 2).as("w_sum"),
        round(sum(col("box_x_min")), 2).as("x_sum"),
        countDistinct(col("image_id")).as("n_images"))

  val defs: Map[String, Q] = Map(
    // WebDataset tar shards: documents → 8 deterministic USTAR shards →
    // binaryFile read-back; text and every meta column must survive the
    // (.txt, .json) member roundtrip byte-for-byte. Oracle = the source
    // table itself (the IO-gate convention).
    "q125_webdataset_roundtrip" -> ((s, d) => {
      val docs = graft.Tables.documents(s, d)
      val dir = tmp("graft_wds_rt")
      WebDataset.toWebDataset(docs, dir, numShards = 8)
      val meta = org.apache.spark.sql.types.StructType.fromDDL(
        "lang STRING, source STRING, n_chars BIGINT")
      WebDataset.fromWebDataset(s, dir)
        .select(col("doc_id"), col("text"),
          from_json(col("meta_json"), meta).as("m"))
        .select(col("doc_id"), col("text"), col("m.lang").as("lang"),
          col("m.source").as("source"), col("m.n_chars").as("n_chars"))
    }),
    "q41_coco_roundtrip" -> ((s, d) => {
      val ds = subset(s, d)
      val written = Coco.toCoco(ds, tmp("graft_coco_rt"), overwrite = true)
      val back = Coco.fromCoco(s, written.head)
      back.annotations
        .groupBy(col("category_id"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("box_width")), 2).as("w_sum"),
          round(sum(col("box_x_min")), 2).as("x_sum"))
    }),

    // §2.1/2.2 caipy: per-image JSON tree write → read. mod=100 keeps
    // file-count overhead from dominating the engine bench. The explicit
    // documentSchema (exactly what inference would produce on this tree)
    // uses the loader's schema support to skip the inference pass — one
    // full parse of every JSON, formerly the #1 bench cost (VERDICT r3).
    "q49_caipy_roundtrip" -> ((s, d) => {
      val ds = subset(s, d, mod = 100)
      val dir = tmp("graft_caipy_rt")
      Caipy.toCaipy(ds, dir)
      val docSchema = org.apache.spark.sql.types.StructType.fromDDL(
        "annotations ARRAY<STRUCT<bbox: ARRAY<BIGINT>, category_id: BIGINT, " +
          "category_str: STRING, id: BIGINT, image_id: BIGINT>>, " +
          "image STRUCT<file_name: STRING, height: BIGINT, id: BIGINT, " +
          "type: STRING, width: BIGINT>")
      val back = Caipy.fromCaipy(s, dir, splits = Seq("P"),
        documentSchema = Some(docSchema))
      annAgg(back.annotations)
    }),

    // §2.1/2.2 darknet: label txts + classes.names write → read (box pixel
    // ↔ relative conversion roundtrips through full-precision doubles)
    "q50_darknet_roundtrip" -> ((s, d) => {
      val ds = subset(s, d, mod = 50)
      val dir = tmp("graft_darknet_rt")
      Darknet.toDarknet(ds, dir)
      val back = Darknet.fromDarknet(s, s"$dir/labels", ds.images,
        classNames = (0 to 6).map(i => s"cat_$i"), split = Some("P"))
      annAgg(back.annotations)
    }),

    // §2.1/2.2 yolov5: data.yaml + split lists + labels write → generic
    // yaml-config read
    "q51_yolov5_roundtrip" -> ((s, d) => {
      val ds = subset(s, d, mod = 50)
      val dir = tmp("graft_yolo_rt")
      Yolov5.toYolov5(ds, dir)
      val back = DarknetConfig.fromDataYaml(s, s"$dir/data.yaml", s"$dir/labels",
        ds.images, split = Some("P"))
      annAgg(back.annotations)
    }),

    // §2.1 MOT: headerless CSV constructed by Spark's csv writer (a code
    // path disjoint from the parser), conf==0 rows must be dropped
    "q52_mot_io" -> ((s, d) => {
      val ann = Tables.annotationsView(s, d).filter(col("image_id") % 10 === 0)
      val dir = tmp("graft_mot_io")
      ann.select(
        col("image_id"), col("id").as("obj_id"),
        col("box_x_min"), col("box_y_min"), col("box_width"), col("box_height"),
        (col("category_id") % 3).cast("double").as("confidence"),
        lit(0.5).as("x_world"), (col("box_y_min") / 2).as("y_world"))
        .write.mode("overwrite").csv(dir)
      val back = Mot.fromMot(s, dir, split = Some("train"))
      back.annotations.groupBy(col("confidence"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("box_width")), 2).as("w_sum"),
          round(sum(col("y_world")), 2).as("yw_sum"),
          countDistinct(col("image_id")).as("n_images"))
    }),

    // §2.1 CrowdHuman: ODGT JSONL constructed by Spark's json writer;
    // person/head fan-out, mask tags dropped, extra.ignore drops both rows,
    // head_attr.ignore drops the head, vbox person boxes, NaN head share,
    // extra/head_attr attribute carry-through (unsure null→0)
    "q53_crowdhuman_io" -> ((s, d) => {
      val ann = Tables.annotationsView(s, d).filter(col("image_id") % 20 === 0)
      val dir = tmp("graft_ch_io")
      ann.select(
        concat(lit("img"), col("image_id")).as("ID"),
        struct(
          when(col("category_id") < 5, "person").otherwise("mask").as("tag"),
          array(col("box_x_min"), col("box_y_min"),
            col("box_width"), col("box_height")).as("fbox"),
          array(col("box_x_min"), col("box_y_min"),
            col("box_width") / 2, col("box_height")).as("vbox"),
          when(col("category_id") % 2 === 0,
            array(col("box_x_min"), col("box_y_min"),
              col("box_width") / 4, col("box_height") / 4)).as("hbox"),
          struct((col("category_id") % 7 === 3).cast("long").as("ignore"),
            (col("id") % 3).as("occ")).as("extra"),
          struct((col("category_id") % 5 === 2).cast("long").as("ignore"),
            (col("id") % 2).as("unsure")).as("head_attr")).as("b"))
        .groupBy("ID").agg(collect_list(col("b")).as("gtboxes"))
        .write.mode("overwrite").json(dir)
      // huge dims: cap_bounding_box_coordinates must be a no-op here
      val back = CrowdHuman.fromCrowdHuman(s, dir,
        imageWidth = 1000000, imageHeight = 1000000)
      back.annotations.groupBy(col("category_id"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("box_width")), 2).as("w_sum"),
          round(sum(nanvl(col("visible_share"), lit(-1.0))), 4).as("vs_sum"),
          countDistinct(col("image_id")).as("n_images"),
          sum(col("occ")).as("occ_sum"),
          sum(col("unsure")).as("unsure_sum"))
    }),

    // §2.1 PascalVOC: per-image XML constructed row-wise (string building,
    // disjoint from the DOM parser), label map inferred from sorted names
    "q54_pascalvoc_io" -> ((s, d) => {
      val ds = subset(s, d, mod = 50)
      val dir = tmp("graft_voc_io")
      val objXml = format_string(
        "<object><name>cat_%d</name><difficult>%d</difficult><truncated>0</truncated>" +
          "<bndbox><xmin>%d</xmin><ymin>%d</ymin><xmax>%d</xmax><ymax>%d</ymax></bndbox></object>",
        col("category_id"),
        (col("id") % 2 === 0).cast("int"),
        col("box_x_min").cast("long"), col("box_y_min").cast("long"),
        (col("box_x_min") + col("box_width")).cast("long"),
        (col("box_y_min") + col("box_height")).cast("long"))
      val docs = ds.annotations.select(col("image_id"), objXml.as("obj"))
        .groupBy("image_id").agg(sort_array(collect_list(col("obj"))).as("objs"))
        .join(ds.images.select(col("id").as("image_id"),
          col("width"), col("height"),
          regexp_extract(col("relative_path"), "([^/]+)\\.[^.]+$", 1).as("stem")),
          Seq("image_id"))
        .select(col("stem"), format_string(
          "<annotation><size><width>%d</width><height>%d</height><depth>3</depth></size>%s</annotation>",
          col("width"), col("height"), concat_ws("", col("objs"))).as("xml"))
      docs.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(dir, r.getString(0) + ".xml"), r.getString(1))
        }
      }
      val back = graft.io.PascalVoc.fromPascalVoc(s, dir, split = Some("P"))
      back.annotations.groupBy(col("category_id"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("box_width")), 2).as("w_sum"),
          sum(when(col("difficult"), 1L).otherwise(0L)).as("n_difficult"),
          countDistinct(col("image_id")).as("n_images"))
    }),

    // §2.1 from_folder: fabricated PNG headers probed for dimensions inside
    // the distributed binaryFile scan
    "q55_folder_io" -> ((s, d) => {
      val imgs = Tables.imagesView(s, d)
        .filter(col("split") === "P" && col("id") % 100 === 0)
        .select(col("id"), col("width"), col("height"))
      val dir = tmp("graft_folder_io")
      imgs.foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        it.foreach { r =>
          val (id, w, h) = (r.getLong(0), r.getInt(1), r.getInt(2))
          val b = java.nio.ByteBuffer.allocate(25)
          b.put(Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
          b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h).put(8.toByte)
          java.nio.file.Files.write(
            java.nio.file.Paths.get(dir, s"img_$id.png"), b.array())
        }
      }
      val back = ImagesFolder.fromFolder(s, dir)
      back.images.agg(count(lit(1)).as("n"),
        sum(col("width")).as("w_sum"), sum(col("height")).as("h_sum"))
    }),

    // §2.1 from_darknet_json: the darknet detector-output predictions JSON.
    // The fixture is constructed from the view with full-precision relative
    // coords and id-derived confidences; class_id carries the DENSE darknet
    // id while idsMap maps it back to original id + 10 — so the gate
    // exercises a REAL ids_map reversal, not an identity
    "q65_darknet_json" -> ((s, d) => {
      val ds = subset(s, d, mod = 50)
      val dir = tmp("graft_dkjson")
      val rel = Bbox.exportBoxes(ds,
        Bbox.BoxFormat(Bbox.CenterSize, relative = true), dropCanonical = true)
      val obj = format_string(
        """{"class_id": %s, "name": "cat_%s", "confidence": %s, """ +
          """"relative_coordinates": {"center_x": %s, "center_y": %s, """ +
          """"width": %s, "height": %s}}""",
        col("category_id"), col("category_id"),
        ((col("id") % 97).cast("double") / 96.0).cast("string"),
        col("cx").cast("string"), col("cy").cast("string"),
        col("width").cast("string"), col("height").cast("string"))
      val frames = rel.select(col("image_id"), obj.as("o"))
        .groupBy("image_id").agg(sort_array(collect_list(col("o"))).as("objs"))
        .join(ds.images.select(col("id").as("image_id"), col("relative_path")),
          Seq("image_id"))
        .select(format_string("""{"filename": "%s", "objects": [%s]}""",
          col("relative_path"), concat_ws(", ", col("objs"))).as("frame"))
      // one JSON array document — driver-side assembly is the format's own
      // materialization point (like the per-split COCO sink), gate-sized
      val doc = frames.collect().map(_.getString(0)).mkString("[", ",\n", "]")
      val jsonPath = java.nio.file.Paths.get(dir, "preds.json")
      java.nio.file.Files.writeString(jsonPath, doc)
      val idsMap = (0 to 6).map(i => i -> (i + 10, s"cat_$i")).toMap
      val back = Darknet.fromDarknetJson(s, jsonPath.toString, dir, ds.images, idsMap)
      back.annotations.groupBy(col("category_id"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("box_width")), 2).as("w_sum"),
          round(sum(col("box_x_min")), 2).as("x_sum"),
          // ×96 first: confidences are k/96, so the scaled sum is ≈ integer
          // — rounding an integer-adjacent value can't hit a half-way case,
          // while round(sum, 4) sat exactly on .xxxx5 boundaries and flipped
          // on the 1-ulp drift the JSON text round-trip introduces
          round(sum(col("confidence")) * 96.0, 2).as("conf_sum"),
          countDistinct(col("image_id")).as("n_images"))
    }),

    // §2.2 to_yolov7: the v5 layout with ABSOLUTE split-list paths (the
    // whole v5↔v7 difference). The gate parses data.yaml back, checks the
    // list reference is absolute, counts the list's absolute image lines,
    // and roundtrips the labels through the generic yaml loader
    "q66_yolov7_roundtrip" -> ((s, d) => {
      val ds = subset(s, d, mod = 50)
      val dir = tmp("graft_yolo7_rt")
      Yolov5.toYolov7(ds, dir)
      val (scalars, _) = DarknetConfig.parseDataYaml(s"$dir/data.yaml")
      val listPath = scalars("P")
      require(listPath.startsWith("/"), "v7 split-list reference must be absolute")
      val absImages =
        java.nio.file.Paths.get(dir).toAbsolutePath.toString + "/images/"
      val lst = s.read.textFile(listPath).toDF("p")
        .agg(count(lit(1)).as("n_list"),
          sum(when(col("p").startsWith(absImages), 1L).otherwise(0L)).as("n_abs"))
      val back = DarknetConfig.fromDataYaml(s, s"$dir/data.yaml", s"$dir/labels",
        ds.images, split = Some("P"))
      annAgg(back.annotations).crossJoin(lst)
    }),

    // §2.1 from_coco_keypoints: the COCO keypoints variant — annotations
    // load as POINTS (box_width = box_height forced to 0, io/coco.py:136-174)
    // while x/y survive exactly. The fixture is a real to_coco file of the
    // subset, so the gate exercises sink → keypoints-loader end to end; the
    // wh_sum column asserts the zero-size rule cross-engine.
    "q67_coco_keypoints" -> ((s, d) => {
      val ds = subset(s, d)
      val written = Coco.toCoco(ds, tmp("graft_kp_rt"), overwrite = true)
      val back = graft.io.CocoKeypoints.fromCocoKeypoints(s, written.head)
      back.annotations.groupBy(col("category_id"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("box_x_min")), 2).as("x_sum"),
          round(sum(col("box_y_min")), 2).as("y_sum"),
          round(sum(col("box_width") + col("box_height")), 2).as("wh_sum"),
          countDistinct(col("image_id")).as("n_images"))
    }),

    // §2.1/2.2 native parquet persistence: exact roundtrip incl. ids
    // JSONL roundtrip over the documents corpus (gzip shards - the format
    // real corpus releases ship in): write, read back FAILFAST with the
    // explicit schema, every column must survive byte-exact. Oracle is the
    // source table itself.
    "q165_jsonl_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = tmp("graft_jsonl_rt")
      Jsonl.toJsonl(docs, dir, compression = "gzip")
      Jsonl.fromJsonl(s, dir, docs.schema)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
    }),

    // ORC roundtrip over the documents corpus (the Hive-era lake format):
    // write zstd ORC, read back, every column must survive byte-exact.
    // Oracle is the source table itself.
    "q170_orc_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val dir = tmp("graft_orc_rt")
      graft.io.OrcIO.toOrc(docs, dir)
      graft.io.OrcIO.fromOrc(s, dir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"),
          col("n_chars"))
    }),

    // CSV roundtrip with DELIBERATELY hostile content — embedded commas,
    // newlines, double quotes, backslashes, the \N null sentinel as TEXT,
    // plus a note column where NULL and '' must stay distinct. RFC 4180
    // quoting both directions (escape = quote char), multiLine read,
    // FAILFAST. Oracle fabricates the same frame straight from documents.
    "q171_csv_roundtrip" -> ((s, d) => {
      val hostile = Tables.documents(s, d).select(
        col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 4 === 0, lit(", comma,\nnew line"))
            .when(col("doc_id") % 4 === 1, lit(" say \"quoted\" end"))
            .when(col("doc_id") % 4 === 2, lit(" back\\slash and \\N sentinel"))
            .otherwise(lit(""))).as("text"),
        col("lang"), col("source"), col("n_chars"),
        when(col("doc_id") % 5 === 0, lit(null).cast("string"))
          .when(col("doc_id") % 5 === 1, lit(""))
          .otherwise(lit("n")).as("note"))
      val dir = tmp("graft_csv_rt")
      graft.io.CsvIO.toCsv(hostile, dir)
      graft.io.CsvIO.fromCsv(s, dir, hostile.schema)
    }),

    // the stored-layout FK-join face (the bucketed sibling of the AQE +
    // broadcast row in SURVEY §4.2): persist the dataset view as BUCKETED
    // tables — images by id, annotations by image_id, same bucket count —
    // reload through the catalog, and run the FK join + per-image
    // aggregate ON the bucket key. This is the 100-TB routing once the
    // dimension side no longer broadcasts: both the join and the
    // aggregation ride the stored layout with ZERO shuffle exchanges
    // (plan-locked in BucketedJoinSpec; measured 0-vs-2 exchanges by the
    // fk_join_bucketed scale probe). The layout must be result-INVISIBLE:
    // the oracle is the plain unbucketed join over the same views.
    "q198_bucketed_fk_join" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val name = "graft_gate_bkt_" + d.replaceAll("[^A-Za-z0-9]", "_")
      graft.io.BucketedIO.writeBucketed(ds, name, buckets = 8)
      val back = graft.io.BucketedIO.readBucketed(s, name, Tables.viewLabelMap)
      back.annotations.select("image_id", "box_width", "box_height")
        .join(back.images.select(col("id").as("image_id"), col("split"),
          col("height")), Seq("image_id"))
        .groupBy(col("image_id"), col("split"))
        .agg(count(lit(1)).as("n_annots"),
          round(sum(col("box_width") * col("box_height")), 4).as("area"),
          max(col("height")).as("max_h"))
    }),

    "q56_parquet_roundtrip" -> ((s, d) => {
      val ds = subset(s, d)
      val dir = tmp("graft_pq_rt")
      ParquetIO.write(ds, dir, overwrite = true)
      val back = ParquetIO.read(s, dir)
      back.annotations.groupBy(col("category_id"))
        .agg(count(lit(1)).as("n"),
          round(sum(col("box_width")), 2).as("w_sum"),
          sum(col("id")).as("id_sum"),
          countDistinct(col("image_id")).as("n_images"))
    }),

    // FiftyOne export (to_fiftyone, dataset.py:5052 → fiftyone_convert.py):
    // the sample/label dict structure built distributed, flattened back to
    // one row per label for the oracle. Category 6 boxes are zeroed so the
    // keypoint branch (zero-size box → Keypoint with points=[[x,y]]) is
    // exercised alongside Detections; relative xywh = pixel / image dim,
    // IEEE-exact in both engines.
    "q99_fiftyone_export" -> ((s, d) => {
      val ds0 = Tables.datasetView(s, d)
      val ann = ds0.annotations
        .withColumn("box_width",
          when(col("category_id") === 6, 0.0).otherwise(col("box_width")))
        .withColumn("box_height",
          when(col("category_id") === 6, 0.0).otherwise(col("box_height")))
      val ds = ds0.copy(annotations = ann)
      val samples = graft.io.Fiftyone.sampleFrame(ds, "gt", allowKeypoints = true)
      val base = Seq(col("lours_id").as("image_id"), col("relative_path"), col("split"))
      val dets = samples
        .select(base :+ explode(col("gt_detection.detections")).as("det"): _*)
        .select(col("image_id"), col("relative_path"), col("split"),
          lit("det").as("kind"), col("det.lours_id").as("ann_id"),
          col("det.label").as("label"), col("det.label_id").as("label_id"),
          element_at(col("det.bounding_box"), 1).as("rel_x"),
          element_at(col("det.bounding_box"), 2).as("rel_y"),
          element_at(col("det.bounding_box"), 3).as("rel_w"),
          element_at(col("det.bounding_box"), 4).as("rel_h"))
      val kps = samples
        .select(base :+ explode(col("gt_keypoint.keypoints")).as("kp"): _*)
        .select(col("image_id"), col("relative_path"), col("split"),
          lit("kp").as("kind"), col("kp.lours_id").as("ann_id"),
          col("kp.label").as("label"), col("kp.label_id").as("label_id"),
          element_at(element_at(col("kp.points"), 1), 1).as("rel_x"),
          element_at(element_at(col("kp.points"), 1), 2).as("rel_y"),
          lit(null).cast("double").as("rel_w"),
          lit(null).cast("double").as("rel_h"))
      dets.unionByName(kps)
    })
  )

  import Tables.viewCte

  /** Shared oracle body: the standard roundtrip aggregate over the 'P' ∩
    * id%mod=0 subset. */
  private def annAggSql(mod: Int): String =
    s"""$viewCte
       |SELECT a.category_id, count(*) AS n,
       |       round(sum(a.box_width), 2) AS w_sum,
       |       round(sum(a.box_x_min), 2) AS x_sum,
       |       count(DISTINCT a.image_id) AS n_images
       |FROM annotations a JOIN images i ON a.image_id = i.id
       |WHERE i.split = 'P' AND i.id % $mod = 0
       |GROUP BY a.category_id""".stripMargin

  val oracles: Map[String, String] = Map(
    "q125_webdataset_roundtrip" ->
      "SELECT doc_id, text, lang, source, n_chars FROM documents",
    "q41_coco_roundtrip" -> (
      s"""$viewCte
         |SELECT a.category_id, count(*) AS n,
         |       round(sum(a.box_width), 2) AS w_sum,
         |       round(sum(a.box_x_min), 2) AS x_sum
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |WHERE i.split = 'P' AND i.id % 10 = 0
         |GROUP BY a.category_id""".stripMargin),

    "q198_bucketed_fk_join" -> (
      s"""$viewCte
         |SELECT a.image_id, i.split, count(*) AS n_annots,
         |       round(sum(a.box_width * a.box_height), 4) AS area,
         |       max(i.height) AS max_h
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |GROUP BY 1, 2""".stripMargin),

    "q49_caipy_roundtrip" -> annAggSql(100),
    "q50_darknet_roundtrip" -> annAggSql(50),
    "q51_yolov5_roundtrip" -> annAggSql(50),

    "q65_darknet_json" -> (
      s"""$viewCte
         |SELECT a.category_id + 10 AS category_id, count(*) AS n,
         |       round(sum(a.box_width), 2) AS w_sum,
         |       round(sum(a.box_x_min), 2) AS x_sum,
         |       round(sum(CAST(a.id % 97 AS DOUBLE) / 96.0) * 96.0, 2) AS conf_sum,
         |       count(DISTINCT a.image_id) AS n_images
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |WHERE i.split = 'P' AND i.id % 50 = 0
         |GROUP BY a.category_id""".stripMargin),

    "q66_yolov7_roundtrip" -> (
      s"""$viewCte,
         |imgcount AS (SELECT count(*) AS c FROM images
         |             WHERE split = 'P' AND id % 50 = 0)
         |SELECT a.category_id, count(*) AS n,
         |       round(sum(a.box_width), 2) AS w_sum,
         |       round(sum(a.box_x_min), 2) AS x_sum,
         |       count(DISTINCT a.image_id) AS n_images,
         |       (SELECT c FROM imgcount) AS n_list,
         |       (SELECT c FROM imgcount) AS n_abs
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |WHERE i.split = 'P' AND i.id % 50 = 0
         |GROUP BY a.category_id""".stripMargin),

    "q52_mot_io" -> (
      s"""$viewCte
         |SELECT CAST(a.category_id % 3 AS DOUBLE) AS confidence, count(*) AS n,
         |       round(sum(a.box_width), 2) AS w_sum,
         |       round(sum(a.box_y_min / 2), 2) AS yw_sum,
         |       count(DISTINCT a.image_id) AS n_images
         |FROM annotations a
         |WHERE a.image_id % 10 = 0 AND a.category_id % 3 <> 0
         |GROUP BY 1""".stripMargin),

    "q53_crowdhuman_io" -> (
      s"""$viewCte,
         |kept AS (SELECT * FROM annotations
         |  WHERE image_id % 20 = 0 AND category_id < 5 AND category_id % 7 <> 3),
         |person AS (
         |  SELECT 0 AS category_id, box_width / 2 AS w, 0.5 AS vs, image_id,
         |         id % 3 AS occ, 0 AS unsure
         |  FROM kept),
         |head AS (
         |  SELECT 1 AS category_id, box_width / 4 AS w, -1.0 AS vs, image_id,
         |         id % 3 AS occ, id % 2 AS unsure
         |  FROM kept WHERE category_id % 2 = 0 AND category_id % 5 <> 2)
         |SELECT category_id, count(*) AS n, round(sum(w), 2) AS w_sum,
         |       round(sum(vs), 4) AS vs_sum,
         |       count(DISTINCT image_id) AS n_images,
         |       CAST(sum(occ) AS BIGINT) AS occ_sum,
         |       CAST(sum(unsure) AS BIGINT) AS unsure_sum
         |FROM (SELECT * FROM person UNION ALL SELECT * FROM head)
         |GROUP BY category_id""".stripMargin),

    // the VOC loader infers label ids from SORTED DISTINCT names present →
    // dense-rank the category over the ones that appear in the subset
    "q54_pascalvoc_io" -> (
      s"""$viewCte,
         |g AS (
         |  SELECT a.category_id AS orig, count(*) AS n,
         |         round(sum(CAST(CAST(a.box_x_min + a.box_width AS BIGINT) AS DOUBLE)
         |                   - CAST(CAST(a.box_x_min AS BIGINT) AS DOUBLE)), 2) AS w_sum,
         |         CAST(sum(CASE WHEN a.id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_difficult,
         |         count(DISTINCT a.image_id) AS n_images
         |  FROM annotations a JOIN images i ON a.image_id = i.id
         |  WHERE i.split = 'P' AND i.id % 50 = 0
         |  GROUP BY a.category_id)
         |SELECT CAST(dense_rank() OVER (ORDER BY orig) - 1 AS INT) AS category_id,
         |       n, w_sum, n_difficult, n_images
         |FROM g""".stripMargin),

    "q55_folder_io" -> (
      s"""$viewCte
         |SELECT count(*) AS n, CAST(sum(width) AS BIGINT) AS w_sum, CAST(sum(height) AS BIGINT) AS h_sum
         |FROM images WHERE split = 'P' AND id % 100 = 0""".stripMargin),

    "q67_coco_keypoints" -> (
      s"""$viewCte
         |SELECT a.category_id, count(*) AS n,
         |       round(sum(a.box_x_min), 2) AS x_sum,
         |       round(sum(a.box_y_min), 2) AS y_sum,
         |       CAST(0.0 AS DOUBLE) AS wh_sum,
         |       count(DISTINCT a.image_id) AS n_images
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |WHERE i.split = 'P' AND i.id % 10 = 0
         |GROUP BY a.category_id""".stripMargin),

    "q165_jsonl_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",

    "q170_orc_roundtrip" ->
      """SELECT doc_id, text, lang, source, n_chars FROM documents""",

    "q171_csv_roundtrip" ->
      """SELECT doc_id,
        |  text || CASE WHEN doc_id % 4 = 0 THEN ', comma,' || chr(10) || 'new line'
        |               WHEN doc_id % 4 = 1 THEN ' say "quoted" end'
        |               WHEN doc_id % 4 = 2 THEN ' back\slash and \N sentinel'
        |               ELSE '' END AS text,
        |  lang, source, n_chars,
        |  CASE WHEN doc_id % 5 = 0 THEN NULL
        |       WHEN doc_id % 5 = 1 THEN ''
        |       ELSE 'n' END AS note
        |FROM documents""".stripMargin,

    "q56_parquet_roundtrip" -> (
      s"""$viewCte
         |SELECT a.category_id, count(*) AS n,
         |       round(sum(a.box_width), 2) AS w_sum,
         |       CAST(sum(a.id) AS BIGINT) AS id_sum,
         |       count(DISTINCT a.image_id) AS n_images
         |FROM annotations a JOIN images i ON a.image_id = i.id
         |WHERE i.split = 'P' AND i.id % 10 = 0
         |GROUP BY a.category_id""".stripMargin),

    "q99_fiftyone_export" ->
      s"""$viewCte
         |SELECT a.image_id, i.relative_path, i.split,
         |       CASE WHEN a.category_id = 6 THEN 'kp' ELSE 'det' END AS kind,
         |       a.id AS ann_id,
         |       'cat_' || CAST(a.category_id AS VARCHAR) AS label,
         |       a.category_id AS label_id,
         |       a.box_x_min / i.width AS rel_x,
         |       a.box_y_min / i.height AS rel_y,
         |       CASE WHEN a.category_id = 6 THEN NULL
         |            ELSE a.box_width / i.width END AS rel_w,
         |       CASE WHEN a.category_id = 6 THEN NULL
         |            ELSE a.box_height / i.height END AS rel_h
         |FROM annotations a JOIN images i ON a.image_id = i.id""".stripMargin
  )
}
