package graft.queries

import graft.Tables
import graft.operators.{Ids, Booleanize}
import graft.functions.Bbox
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Additional oracle-gated queries widening SURVEY §2 coverage:
  * match_index, reset_index_from_mapping, debooleanize, bbox import,
  * grouped top-k, invalid-image sweep, remap_from_other, hist distances,
  * construct_label_map, reset_images_root, the validation/regression
  * report, and get_one_frame. */
object ExtraQueries extends graft.QueryModule {
  type Q = (SparkSession, String) => DataFrame

  /** Temp fixture tree deleted at JVM exit — q68's files are probed lazily
    * from executors at query-execution time, so they must outlive the gate
    * builder (but not the run). */
  private def tempTreeForRun(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix).toString
    Runtime.getRuntime.addShutdownHook(new Thread(() => graft.IoUtil.rmTree(dir)))
    dir
  }

  val defs: Map[String, Q] = Map(
    // Morton (z-order) clustering key over two 10-bit bucketed dims —
    // pure shift/mask integer arithmetic, identical in any engine with
    // bit ops. The layout face (range-partitioned clustered write, both
    // dims' per-file ranges compact) is spec-locked in Round9Spec.
    "q187_zorder_key" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_orderkey") % 50 === 0)
      li.select(col("l_orderkey"), col("l_linenumber").cast("long").as("l_linenumber"),
        col("l_partkey"),
        graft.operators.ZOrder.zOrderKey(
          pmod(col("l_orderkey"), lit(1024)), pmod(col("l_partkey"), lit(1024)),
          bits = 10).as("z"))
    }),

    // §2.4 match_index: realign ids to another dataset via relative_path
    "q42_match_index" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      // the "other" dataset: same images, ids shifted by 7
      val other = ds.copy(images = ds.images.withColumn("id", col("id") + 7))
      Ids.matchIndex(ds, other, on = "relative_path")
        .annotations.groupBy(col("image_id") % 10).count()
        .withColumnRenamed("(image_id % 10)", "bucket")
    }),

    // §2.6 reset_index_from_mapping with removeUnmapped
    "q43_reset_from_mapping" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val mapping = ds.images.filter(col("id") % 2 === 0)
        .select(col("id").as("old_id"), (col("id") / 2).cast("long").as("new_id"))
      Ids.resetIndexFromMapping(ds, mapping, removeUnmapped = true)
        .annotations.select(col("id"), col("image_id"), col("category_id"))
    }),

    // §2.8 debooleanize: flag family → array column (roundtrip through both)
    "q44_debooleanize" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val tagged = li.select(
        (((col("l_orderkey") * 8 + col("l_linenumber")) * 100000 + col("l_partkey")) * 10000
          + col("l_suppkey")).as("id"),
        array_compact(array(
          when(col("l_returnflag") === "R", "returned"),
          when(col("l_quantity") > 25, "bulk"))).as("tags"))
      val (boolDf, _) = Booleanize.booleanizeColumn(tagged, "tags",
        Some(Seq("bulk", "returned")))
      Booleanize.debooleanizeColumn(boolDf, "tags")
        .select(col("id"), concat_ws(",", col("tags")).as("tags_str"))
    }),

    // §2.9 bbox import: two-corner pixels → canonical XYWH
    "q45_bbox_import" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val xyxy = li.select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("rid"),
        (col("l_partkey") % 500).cast("double").as("x1"),
        (col("l_suppkey") % 300).cast("double").as("y1"),
        (col("l_partkey") % 500 + col("l_quantity")).cast("double").as("x2"),
        (col("l_suppkey") % 300 + 10.0).as("y2"))
      xyxy.select((col("rid") +:
        Bbox.toCanonical(Bbox.parseFormat("XYXY"),
          col("x1"), col("y1"), col("x2"), col("y2"))): _*)
    }),

    // §2.13 remove_invalid_images + get_invalid_images + exhaustive folder
    // sweep over a CONSTRUCTED image tree: per subset image, (id/100)%4
    // selects valid file / wrong-dims header / undecodable bytes / no file,
    // and every valid image also gets an unreferenced orphan twin. The
    // operators then probe the real filesystem distributed; the oracle
    // recomputes each bucket arithmetically.
    "q68_invalid_images" -> ((s, d) => {
      val ds0 = graft.operators.Locators.filterImages(
        graft.operators.Locators.getSplit(Tables.datasetView(s, d), Some("P")),
        col("id") % 100 === 0)
      val dir = tempTreeForRun("graft_inv_img")
      // the subset is tiny by construction (id % 100 == 0 inside one
      // split): write the fixture files on the DRIVER. An executor-side
      // foreachPartition write only works in local mode, where driver and
      // executors happen to share a filesystem — on a real cluster the
      // files would land on the wrong machines. (The PROBE stays
      // distributed — that's the operator under test; fixture setup is
      // harness.)
      def pngHeader(w: Int, h: Int): Array[Byte] = {
        val b = java.nio.ByteBuffer.allocate(25)
        b.put(Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
        b.putInt(13).put("IHDR".getBytes("US-ASCII")).putInt(w).putInt(h).put(8.toByte)
        b.array()
      }
      ds0.images.select(col("id"), col("width"), col("height"), col("relative_path"))
        .collect()
        .foreach { r =>
          val (id, w, h, rel) = (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))
          val p = java.nio.file.Paths.get(dir, rel)
          (id / 100) % 4 match {
            case 0 =>
              java.nio.file.Files.write(p, pngHeader(w, h))
              java.nio.file.Files.write(
                java.nio.file.Paths.get(dir, s"orphan_$id.png"), pngHeader(w, h))
            case 1 => java.nio.file.Files.write(p, pngHeader(w + 3, h))
            case 2 => java.nio.file.Files.write(p, "not an image".getBytes("US-ASCII"))
            case _ => () // missing
          }
        }
      val ds = ds0.copy(imagesRoot = dir)
      val report = graft.operators.Frames.invalidImageReport(ds)
      val repAgg = report.agg(
        coalesce(sum(when(col("missing"), 1L).otherwise(0L)), lit(0L)).as("n_missing"),
        coalesce(sum(when(col("undecodable"), 1L).otherwise(0L)), lit(0L)).as("n_undecodable"),
        coalesce(sum(when(col("size_mismatch"), 1L).otherwise(0L)), lit(0L)).as("n_mismatch"))
      val cleaned = graft.operators.Frames.removeInvalidImages(ds)
      val keptAgg = cleaned.images.agg(count(lit(1)).as("n_kept_images"))
        .crossJoin(cleaned.annotations.agg(count(lit(1)).as("n_kept_anns")))
      val orphans = graft.operators.FolderSweep.orphanFiles(ds)
        .agg(count(lit(1)).as("n_orphans"))
      repAgg.crossJoin(keptAgg).crossJoin(orphans)
    }),

    // §2.10 remap_from_other: id collisions force the lowest-free-id
    // allocator (dataset.py:3794-4015) through all three branches — match
    // by name (→ other's id), free id (→ kept), collision (→ allocated
    // 7,8,9,10). The resulting mapping is a closed-form CASE for the oracle.
    "q69_remap_from_other" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val other = ds.copy(labelMap =
        Map(0 -> "cat_3", 1 -> "other_a", 2 -> "cat_5", 6 -> "other_b"))
      graft.operators.Remap.remapFromOther(ds, other)
        .annotations.groupBy(col("category_id"), col("category_str"))
        .agg(count(lit(1)).as("n"), round(sum(col("box_width")), 2).as("w_sum"))
    }),

    // §2.12 histogram distance kernels (Costs.klDivergence / emd1d /
    // shareDistance): category histograms of splits P vs F, normalized,
    // then KL, 1-D EMD (cumsum closed form) and 1−IoU share distance —
    // each a closed-form SQL aggregate for the oracle. Histograms are
    // tiny by construction (7 bins); the distributed part is the count
    "q74_hist_distance" -> ((s, d) => {
      import graft.split.Costs
      val img = Tables.imagesView(s, d).select(col("id").as("image_id"), col("split"))
      val counts = Tables.annotationsView(s, d).join(img, Seq("image_id"))
        .filter(col("split").isin("P", "F"))
        .groupBy("split", "category_id").count().collect()
      def hist(sp: String): Array[Double] = (0 to 6).map(b =>
        counts.find(r => r.getString(0) == sp && r.getInt(1) == b)
          .map(_.getLong(2).toDouble).getOrElse(0.0)).toArray
      val p = Costs.normalize(hist("P"))
      val q = Costs.normalize(hist("F"))
      def r6(x: Double): Double =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      import s.implicits._
      Seq((r6(Costs.klDivergence(p, q)), r6(Costs.emd1d(p, q)),
        r6(Costs.shareDistance(p, q))))
        .toDF("kl", "emd", "share_dist")
    }),

    // §2.5 construct_label_map: distinct (id, name) pairs with bijectivity
    // asserts in both directions (io/common.py:15-48)
    "q75_label_map" -> ((s, d) => {
      val m = graft.validate.LabelMapBuilder.constructLabelMap(
        Tables.datasetView(s, d).annotations)
      import s.implicits._
      m.toSeq.sortBy(_._1).toDF("category_id", "category_str")
    }),

    // §2.9 reset_images_root: re-root /data/images → /data; the old→new
    // prefix ("images") is driver-computed once, the rewrite is a concat
    // column (dataset.py:1039-1123)
    "q76_reset_images_root" -> ((s, d) => {
      val ds = Tables.datasetView(s, d).copy(imagesRoot = "/data/images")
      val r = ds.resetImagesRoot("/data")
      require(r.imagesRoot == "/data", s"unexpected root ${r.imagesRoot}")
      r.images.select(col("id"), col("relative_path"))
    }),

    // §2.13 check / assert_ids_well_formed / assert_columns_properly_
    // normalized / dataset_regression / assert_dataset_equal behavior gate:
    // a clean subset must pass every check, each planted violation class
    // must be caught, and the malformed-box count over a planted corpus is
    // recomputed arithmetically by the oracle. Booleans are the q47-style
    // bound pattern — semantics, not just row counts.
    "q78_validation_report" -> ((s, d) => {
      import graft.validate.Validation
      import graft.operators.Locators
      val sub0 = Locators.filterImages(
        Locators.getSplit(Tables.datasetView(s, d), Some("P")),
        col("id") % 100 === 0)
      // the gate chains ~20 small driver-blocking checks; materialize the
      // tiny subset ONCE so each check doesn't re-derive the full view
      val sub = sub0.copy(
        images = sub0.images.localCheckpoint(true),
        annotations = sub0.annotations.localCheckpoint(true))
      val clean = Locators.removeInvalidAnnotations(sub)
      def throws(f: => Unit): Boolean =
        try { f; false } catch { case _: IllegalArgumentException => true }
      val cleanOk = try { Validation.check(clean); true }
        catch { case _: Throwable => false }
      // planted: every 97th annotation id gets a negative width, PLUS the
      // min id unconditionally — at tiny SFs the %100-image / %97-annotation
      // double filter can select zero rows, which made malformed_caught
      // scale-dependent (false at sf0.001, true at sf0.01+); min-id planting
      // guarantees >=1 malformed row whenever the subset is non-empty, at
      // every scale, and the oracle mirrors it arithmetically
      val minAnnId = clean.annotations.agg(min(col("id"))).first() match {
        case r if r.isNullAt(0) => Long.MinValue
        case r => r.getLong(0)
      }
      val badAnn = clean.annotations.withColumn("box_width",
        when(col("id") % 97 === 0 || col("id") === minAnnId, lit(-5.0))
          .otherwise(col("box_width")))
      val malformedCaught = throws(Validation.check(clean.copy(annotations = badAnn)))
      val nMalformed = Locators.malformedBoxReport(clean.copy(annotations = badAnn))
        .filter(col("negative_size")).count()
      // planted: every 100th image collapses onto one path
      val dupImages = clean.images.withColumn("relative_path",
        when(col("id") % 100 === 0, lit("dup.jpg")).otherwise(col("relative_path")))
      val dupCaught = throws(Validation.check(clean.copy(images = dupImages)))
      val normCaught = throws(Validation.assertColumnsProperlyNormalized(
        clean.images.withColumn("split.x", lit(1))))
      // intersection equality: identical frames pass; a changed common row
      // is caught
      val afieOk = try {
        graft.validate.Validation.assertFrameIntersectionsEqual(
          clean.images, clean.images); true
      } catch { case _: Throwable => false }
      val afieCaught = throws {
        graft.validate.Validation.assertFrameIntersectionsEqual(
          clean.images,
          clean.images.withColumn("height", col("height") + 1))
      }
      // golden-parquet regression: write, re-check (equal), mutate (drift)
      val golden = java.nio.file.Files.createTempDirectory("graft_golden").toString
      Validation.datasetRegression(clean, golden)
      val regressionOk = try { Validation.datasetRegression(clean, golden); true }
        catch { case _: Throwable => false }
      val driftCaught = throws {
        Validation.datasetRegression(
          clean.copy(images = clean.images.withColumn("width", col("width") + 1)),
          golden)
      }
      // all regression checks above ran eagerly — the golden tree is done
      graft.IoUtil.rmTree(golden)
      import s.implicits._
      Seq((cleanOk, malformedCaught, nMalformed, dupCaught, normCaught,
        afieOk, afieCaught, regressionOk, driftCaught))
        .toDF("clean_ok", "malformed_caught", "n_malformed", "dup_caught",
          "norm_caught", "afie_ok", "afie_caught", "regression_ok", "drift_caught")
    }),

    // §2.3 get_one_frame: the n-th image in id order plus its annotation
    // count — driver-side single-frame access shaped into a one-row frame
    "q79_get_one_frame" -> ((s, d) => {
      val ds = Tables.datasetView(s, d)
      val (img, anns) = graft.operators.Frames.getOneFrame(ds, n = 5)
      import s.implicits._
      Seq((img.getAs[Long]("id"), img.getAs[String]("relative_path"),
        anns.size.toLong))
        .toDF("id", "relative_path", "n_ann")
    }),

    // §2.3 empty_annotations: images preserved, annotation table emptied
    // with schema intact (dataset.py:879-935)
    "q84_empty_annotations" -> ((s, d) => {
      val e = graft.operators.Locators.emptyAnnotations(Tables.datasetView(s, d))
      e.images.agg(count(lit(1)).as("n_images"))
        .crossJoin(e.annotations.agg(count(lit(1)).as("n_anns")))
        .withColumn("n_ann_cols", lit(e.annotations.columns.length.toLong))
    }),

    // §2.8 get_bool_columns: family discovery by prefix + dtype after a
    // real booleanize pass (column_booleanizer.py:163-201)
    "q85_bool_columns" -> ((s, d) => {
      val li = Tables.lineitem(s, d).limit(1000)
      val tagged = li.select(col("l_orderkey").as("id"),
        array_compact(array(
          when(col("l_returnflag") === "R", "returned"),
          when(col("l_quantity") > 25, "bulk"))).as("tags"))
      val (boolDf, _) = Booleanize.booleanizeColumn(tagged, "tags",
        Some(Seq("bulk", "returned")))
      val names = Booleanize.boolColumns(boolDf, "tags")
      import s.implicits._
      names.sorted.toDF("bool_column")
    }),

    // §2.9 dummy_dataset: structural invariants of the seeded generator —
    // dense ids, FK integrity, split domain, box-in-image containment.
    // The hash-derived VALUES are engine-specific by design (xxhash64);
    // the CONTRACT is what the oracle can and does check (q47 pattern)
    "q86_dummy_dataset" -> ((s, d) => {
      val ds = graft.model.DummyData.dummyDataset(s, nImages = 50,
        nAnnotations = 500, seed = 7L)
      val img = ds.images.agg(count(lit(1)).as("n_images"),
        min(col("id")).as("min_img_id"), max(col("id")).as("max_img_id"),
        countDistinct(col("split")).as("n_splits"))
      val annAgg = ds.annotations
        .join(ds.images.select(col("id").as("__iid"), col("width").as("__w"),
          col("height").as("__h")), col("image_id") === col("__iid"), "left")
        .agg(count(lit(1)).as("n_anns"),
          min(col("id")).as("min_ann_id"), max(col("id")).as("max_ann_id"),
          sum(when(col("__iid").isNull, 1L).otherwise(0L)).as("n_orphan_fk"),
          sum(when(col("box_x_min") < 0 || col("box_y_min") < 0 ||
            col("box_width") <= 0 || col("box_height") <= 0 ||
            col("box_x_min") + col("box_width") > col("__w") ||
            col("box_y_min") + col("box_height") > col("__h"), 1L)
            .otherwise(0L)).as("n_bad_boxes"))
      img.crossJoin(annAgg)
    }),

    // §2.8 schema-driven dtypes/defaults/enums (io/SchemaUtil): a JSON
    // schema drives string→number casts, null/missing-column defaults, and
    // enum-array booleanization — every effect separately visible in the
    // aggregate the oracle recomputes from the raw table
    "q87_schema_enforce" -> ((s, d) => {
      val src = Tables.lineitem(s, d).select(
        (col("l_orderkey") * 8 + col("l_linenumber")).as("rid"),
        col("l_quantity").cast("string").as("qty"),
        when(col("l_returnflag") === "R", col("l_discount")).as("disc"),
        array_compact(array(
          when(col("l_quantity") > 25, "bulk"),
          when(col("l_returnflag") === "R", "returned"))).as("tags"))
      val schema = """{
        "type": "object",
        "required": ["rid"],
        "properties": {
          "rid": {"type": "integer"},
          "qty": {"type": "number"},
          "disc": {"type": "number", "default": 0.5},
          "missing_flag": {"type": "integer", "default": 7},
          "tags": {"type": "array",
                   "items": {"type": "string", "enum": ["bulk", "returned"]}}
        }
      }"""
      val enforced = graft.io.SchemaUtil.enforce(src, schema)
      val (boolDf, fams) = graft.io.SchemaUtil.booleanizeBySchema(enforced, schema)
      require(fams == Set("tags"), s"unexpected booleanized families: $fams")
      boolDf.agg(
        count(lit(1)).as("n"),
        round(sum(col("qty")), 2).as("qty_sum"),
        round(sum(col("disc")), 2).as("disc_sum"),
        sum(col("missing_flag")).as("mf_sum"),
        sum(when(col("`tags.bulk`"), 1L).otherwise(0L)).as("n_bulk"),
        sum(when(col("`tags.returned`"), 1L).otherwise(0L)).as("n_returned"))
    }),

    // §2.6 grouped top-k: 3 priciest lineitems per order
    "q46_group_topk" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val w = Window.partitionBy("l_orderkey")
        .orderBy(desc("l_extendedprice"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
      li.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .groupBy("l_orderkey")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("top3_price"))
    })
  )

  import Tables.viewCte

  val oracles: Map[String, String] = Map(
    "q187_zorder_key" -> {
      val z = (0 until 10).map(i =>
        s"((((a >> $i) & 1) << ${2 * i}) | (((b >> $i) & 1) << ${2 * i + 1}))")
        .mkString(" | ")
      s"""WITH t AS (SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
         |             l_partkey,
         |             l_orderkey % 1024 AS a, l_partkey % 1024 AS b
         |           FROM lineitem WHERE l_orderkey % 50 = 0)
         |SELECT l_orderkey, l_linenumber, l_partkey,
         |       CAST($z AS BIGINT) AS z
         |FROM t""".stripMargin
    },

    "q42_match_index" ->
      s"""$viewCte
         |SELECT (a.image_id + 7) % 10 AS bucket, count(*) AS count
         |FROM annotations a GROUP BY 1""".stripMargin,

    "q43_reset_from_mapping" ->
      s"""$viewCte
         |SELECT a.id, a.image_id // 2 AS image_id, a.category_id
         |FROM annotations a WHERE a.image_id % 2 = 0""".stripMargin,

    "q44_debooleanize" ->
      """SELECT ((l_orderkey * 8 + l_linenumber) * 100000 + l_partkey) * 10000
        |       + l_suppkey AS id,
        |  CASE WHEN l_quantity > 25 AND l_returnflag = 'R' THEN 'bulk,returned'
        |       WHEN l_quantity > 25 THEN 'bulk'
        |       WHEN l_returnflag = 'R' THEN 'returned'
        |       ELSE '' END AS tags_str
        |FROM lineitem""".stripMargin,

    "q45_bbox_import" ->
      """SELECT l_orderkey * 8 + l_linenumber AS rid,
        |  CAST(l_partkey % 500 AS DOUBLE) AS box_x_min,
        |  CAST(l_suppkey % 300 AS DOUBLE) AS box_y_min,
        |  CAST(l_partkey % 500 + l_quantity AS DOUBLE)
        |    - CAST(l_partkey % 500 AS DOUBLE) AS box_width,
        |  (CAST(l_suppkey % 300 AS DOUBLE) + 10.0)
        |    - CAST(l_suppkey % 300 AS DOUBLE) AS box_height
        |FROM lineitem""".stripMargin,

    "q68_invalid_images" ->
      s"""$viewCte,
         |sub AS (SELECT id, (id // 100) % 4 AS k FROM images
         |        WHERE split = 'P' AND id % 100 = 0)
         |SELECT
         |  (SELECT count(*) FROM sub WHERE k = 3) AS n_missing,
         |  (SELECT count(*) FROM sub WHERE k = 2) AS n_undecodable,
         |  (SELECT count(*) FROM sub WHERE k = 1) AS n_mismatch,
         |  (SELECT count(*) FROM sub WHERE k = 0) AS n_kept_images,
         |  (SELECT count(*) FROM annotations a JOIN sub ON a.image_id = sub.id
         |   WHERE sub.k = 0) AS n_kept_anns,
         |  (SELECT count(*) FROM sub WHERE k = 0) AS n_orphans""".stripMargin,

    "q69_remap_from_other" ->
      s"""$viewCte
         |SELECT CAST(CASE a.category_id WHEN 0 THEN 7 WHEN 1 THEN 8
         |            WHEN 2 THEN 9 WHEN 3 THEN 0 WHEN 4 THEN 4
         |            WHEN 5 THEN 2 WHEN 6 THEN 10 END AS INT) AS category_id,
         |       'cat_' || CAST(a.category_id AS VARCHAR) AS category_str,
         |       count(*) AS n, round(sum(a.box_width), 2) AS w_sum
         |FROM annotations a
         |GROUP BY a.category_id""".stripMargin,

    "q74_hist_distance" ->
      s"""$viewCte,
         |counts AS (
         |  SELECT i.split, a.category_id, count(*) AS c
         |  FROM annotations a JOIN images i ON a.image_id = i.id
         |  WHERE i.split IN ('P', 'F') GROUP BY 1, 2),
         |tot AS (SELECT split, sum(c) AS t FROM counts GROUP BY 1),
         |h AS (SELECT category_id,
         |        coalesce(CAST(sum(CASE WHEN split = 'P' THEN c END) AS DOUBLE), 0)
         |          / (SELECT t FROM tot WHERE split = 'P') AS pv,
         |        coalesce(CAST(sum(CASE WHEN split = 'F' THEN c END) AS DOUBLE), 0)
         |          / (SELECT t FROM tot WHERE split = 'F') AS qv
         |      FROM counts GROUP BY 1),
         |c AS (SELECT pv, qv,
         |        sum(pv) OVER (ORDER BY category_id) AS cp,
         |        sum(qv) OVER (ORDER BY category_id) AS cq FROM h)
         |SELECT round(sum(CASE WHEN pv > 0 THEN pv * ln(pv / qv) ELSE 0 END), 6) AS kl,
         |       round(sum(abs(cp - cq)), 6) AS emd,
         |       round(1 - sum(least(pv, qv)) / sum(greatest(pv, qv)), 6) AS share_dist
         |FROM c""".stripMargin,

    "q75_label_map" ->
      s"""$viewCte
         |SELECT DISTINCT category_id, category_str FROM annotations""".stripMargin,

    "q76_reset_images_root" ->
      s"""$viewCte
         |SELECT id, 'images/img_' || id || '.jpg' AS relative_path
         |FROM images""".stripMargin,

    "q78_validation_report" ->
      s"""$viewCte,
         |sub AS (SELECT a.id FROM annotations a JOIN images i ON a.image_id = i.id
         |        WHERE i.split = 'P' AND i.id % 100 = 0
         |          AND a.box_x_min >= 0 AND a.box_y_min >= 0
         |          AND a.box_width > 0 AND a.box_height > 0
         |          AND a.box_x_min + a.box_width <= i.width
         |          AND a.box_y_min + a.box_height <= i.height)
         |SELECT true AS clean_ok, true AS malformed_caught,
         |       (SELECT count(*) FROM sub
         |        WHERE id % 97 = 0 OR id = (SELECT min(id) FROM sub)) AS n_malformed,
         |       true AS dup_caught, true AS norm_caught,
         |       true AS afie_ok, true AS afie_caught,
         |       true AS regression_ok, true AS drift_caught""".stripMargin,

    "q79_get_one_frame" ->
      s"""$viewCte,
         |sel AS (SELECT id, relative_path FROM images ORDER BY id LIMIT 1 OFFSET 5)
         |SELECT sel.id, sel.relative_path,
         |       (SELECT count(*) FROM annotations a WHERE a.image_id = sel.id) AS n_ann
         |FROM sel""".stripMargin,

    "q84_empty_annotations" ->
      s"""$viewCte
         |SELECT (SELECT count(*) FROM images) AS n_images,
         |       CAST(0 AS BIGINT) AS n_anns,
         |       CAST(9 AS BIGINT) AS n_ann_cols""".stripMargin,

    "q85_bool_columns" ->
      """SELECT 'tags.bulk' AS bool_column
        |UNION ALL SELECT 'tags.returned'""".stripMargin,

    "q86_dummy_dataset" ->
      """SELECT CAST(50 AS BIGINT) AS n_images,
        |       CAST(0 AS BIGINT) AS min_img_id, CAST(49 AS BIGINT) AS max_img_id,
        |       CAST(2 AS BIGINT) AS n_splits,
        |       CAST(500 AS BIGINT) AS n_anns,
        |       CAST(0 AS BIGINT) AS min_ann_id, CAST(499 AS BIGINT) AS max_ann_id,
        |       CAST(0 AS BIGINT) AS n_orphan_fk,
        |       CAST(0 AS BIGINT) AS n_bad_boxes""".stripMargin,

    "q87_schema_enforce" ->
      """SELECT count(*) AS n,
        |  round(sum(l_quantity), 2) AS qty_sum,
        |  round(sum(CASE WHEN l_returnflag = 'R' THEN l_discount
        |            ELSE 0.5 END), 2) AS disc_sum,
        |  CAST(7 * count(*) AS BIGINT) AS mf_sum,
        |  CAST(sum(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
        |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_returned
        |FROM lineitem""".stripMargin,

    "q46_group_topk" ->
      """WITH ranked AS (
        |  SELECT l_orderkey, l_extendedprice,
        |    row_number() OVER (PARTITION BY l_orderkey
        |      ORDER BY l_extendedprice DESC, l_linenumber, l_partkey, l_suppkey) AS rk
        |  FROM lineitem)
        |SELECT l_orderkey, count(*) AS n, round(sum(l_extendedprice), 2) AS top3_price
        |FROM ranked WHERE rk <= 3 GROUP BY l_orderkey""".stripMargin
  )
}

/** Sketch-based approximate aggregates (SURVEY §2.14 scale toolbox):
  * HLL distinct counts vs exact. The raw sketch estimate is
  * engine-specific by nature, so the ORACLE-comparable output is the exact
  * count plus a boolean asserting the sketch landed within 5× the
  * configured 1% rsd — deterministic for fixed data, and a real bound
  * check rather than a rows-only row count. */
object SketchQueries extends graft.QueryModule {
  import org.apache.spark.sql.functions._

  val defs: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q47_approx_distinct" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      def withinBound(c: String) =
        abs(approx_count_distinct(col(c), 0.01) - countDistinct(col(c)))
          .cast("double") / countDistinct(col(c)) <= 0.05
      li.agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        countDistinct(col("l_orderkey")).as("exact_orders"),
        withinBound("l_partkey").as("parts_within_bound"),
        withinBound("l_orderkey").as("orders_within_bound"))
    })
  )
  val oracles: Map[String, String] = Map(
    "q47_approx_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS exact_parts,
        |       count(DISTINCT l_orderkey) AS exact_orders,
        |       true AS parts_within_bound,
        |       true AS orders_within_bound
        |FROM lineitem""".stripMargin
  )
}
