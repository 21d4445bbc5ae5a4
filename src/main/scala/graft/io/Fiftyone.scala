package graft.io

import graft.model.GraftDataset
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Schema-faithful FiftyOne export — the service-free face of the
  * reference's `to_fiftyone` (dataset.py:5052-5134 →
  * utils/fiftyone_convert.py:16-341). Instead of pushing samples into a
  * running FiftyOne instance, this builds the exact `fo.Sample` /
  * `fo.Detection` / `fo.Keypoint` dict structure as a DataFrame (one row
  * per sample) and can write it as distributed JSON-lines, which FiftyOne's
  * own importers (or a thin pyfiftyone shim) can ingest.
  *
  * Field mapping replicated from the reference:
  *  - sample: `filepath` = images_root/relative_path, `lours_id` = image
  *    id, `relative_path`, `metadata` = ImageMetadata(width, height),
  *    `split`, plus every image attribute column (fiftyone-sanitized name)
  *    (fiftyone_convert.py:303-312).
  *  - per annotation set `<name>_detection` = Detections(detections=[...]),
  *    `<name>_keypoint` = Keypoints(keypoints=[...])
  *    (fiftyone_convert.py:322-337).
  *  - Detection: `label` = category_str, `label_id` = category_id,
  *    `lours_id` = annotation id, `bounding_box` = RELATIVE [x, y, w, h]
  *    (fiftyone's xywh, fiftyone_convert.py:98-105 + convert_bbox to
  *    "xywh"); annotation attributes ride as extra fields.
  *  - Keypoint: zero-size boxes when `allowKeypoints`, `points` =
  *    [[x, y]] relative (fiftyone_convert.py:107-114).
  *  - name sanitation: '.' → "->" and "attributes" → "attr"
  *    (make_fiftyone_compatible, fiftyone_convert.py:16-55).
  *
  * Deviation (documented): FiftyOne's service-assigned random UUIDs
  * (`fo_id`) are not reproducible without the service, so `record_fo_ids`
  * has no counterpart; `lours_id` is the stable join key instead.
  */
object Fiftyone {

  /** FiftyOne-safe column/field name (make_fiftyone_compatible). */
  def foName(c: String): String = c.replace(".", "->").replace("attributes", "attr")

  /** One row per image, shaped like the fo.Sample dict the reference
    * builds. Distributed end to end: image dims broadcast onto the
    * annotations, label structs aggregate per image (map-side partial),
    * and the sample join is FK-shaped — no driver loop over samples (the
    * reference iterates images in Python; at 100 TB that loop is the
    * first thing to go). */
  def sampleFrame(ds: GraftDataset, annotationsName: String = "groundtruth",
      allowKeypoints: Boolean = false): DataFrame = {
    val d0 = ds.withCategoryStr
    val dims = GraftDataset.broadcastIfSmall(d0.images.select(col("id").as("__iid"),
      col("width").cast("double").as("__iw"),
      col("height").cast("double").as("__ih")))
    val ann = d0.annotations.join(dims, col("image_id") === col("__iid"))
    val attrs = d0.annotationAttributes
    def attrFields: Seq[Column] = attrs.map(c => col(s"`$c`").as(foName(c)))
    val isKp: Column =
      if (allowKeypoints) col("box_width") === 0 && col("box_height") === 0
      else lit(false)

    val detection = struct(Seq(
      col("category_str").as("label"),
      col("category_id").as("label_id"),
      col("id").as("lours_id"),
      array(col("box_x_min") / col("__iw"), col("box_y_min") / col("__ih"),
        col("box_width") / col("__iw"), col("box_height") / col("__ih"))
        .as("bounding_box")) ++ attrFields: _*)
    val keypoint = struct(Seq(
      col("category_str").as("label"),
      col("category_id").as("label_id"),
      col("id").as("lours_id"),
      array(array(col("box_x_min") / col("__iw"), col("box_y_min") / col("__ih")))
        .as("points")) ++ attrFields: _*)

    val dets = ann.filter(!isKp)
      .groupBy(col("image_id"))
      .agg(sort_array(collect_list(detection)).as("detections"))
      .select(col("image_id").as("__did"),
        struct(col("detections")).as(s"${annotationsName}_detection"))
    val kps = ann.filter(isKp)
      .groupBy(col("image_id"))
      .agg(sort_array(collect_list(keypoint)).as("keypoints"))
      .select(col("image_id").as("__kid"),
        struct(col("keypoints")).as(s"${annotationsName}_keypoint"))

    val root = ds.imagesRoot.stripSuffix("/")
    val imgAttrs = d0.imageAttributes.map(c => col(s"`$c`").as(foName(c)))
    val hasSplit = d0.images.columns.contains("split")
    val sample = d0.images.select(Seq(
      concat(lit(root + "/"), col("relative_path")).as("filepath"),
      col("id").as("lours_id"),
      col("relative_path"),
      struct(col("width"), col("height")).as("metadata"),
      (if (hasSplit) col("split") else lit(null).cast("string")).as("split"))
      ++ imgAttrs: _*)

    val joined = sample
      .join(dets, sample("lours_id") === dets("__did"), "left").drop("__did")
    (if (allowKeypoints)
       joined.join(kps, joined("lours_id") === kps("__kid"), "left").drop("__kid")
     else joined)
  }

  /** Write the sample frame as distributed JSON-lines (one fo.Sample dict
    * per line) — the handoff file a FiftyOne-side loader ingests. */
  def writeJsonl(ds: GraftDataset, outDir: String,
      annotationsName: String = "groundtruth",
      allowKeypoints: Boolean = false): Unit =
    sampleFrame(ds, annotationsName, allowKeypoints)
      .write.mode("overwrite").json(outDir)
}
