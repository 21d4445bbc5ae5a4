package graft.operators

import graft.model.{GraftDataset, LabelMaps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bulk annotation append — reference add_detection_annotation /
  * AnnotationAppender (lours/dataset/dataset.py:5136-5365;
  * lours/utils/annotations_appender.py:21-375).
  *
  * New rows get ids allocated past the current max (annotations_appender.py:
  * 197-199) — one tiny aggregate + a uniform id shift, no global window:
  * the appended batch keeps its own (0-based, unique) ids and is offset as a
  * block, which distributes at any batch size.
  */
object Appender {

  /** Append an annotation batch. `batch` must carry the required annotation
    * columns except `id` (allocated here), `category_str` and `split`
    * (re-derived). New categories extend the label map via `newLabels`. */
  def appendAnnotations(ds: GraftDataset, batch: DataFrame,
      newLabels: Map[Int, String] = Map.empty): GraftDataset = {
    val labelMap = LabelMaps.mergeOuter(ds.labelMap, newLabels)
    val maxId: Long = ds.annotations.agg(max("id")).collect()(0) match {
      case r if r.isNullAt(0) => -1L
      case r => r.getLong(0)
    }
    val withId =
      if (batch.columns.contains("id"))
        batch.withColumn("id", col("id").cast("long") + lit(maxId + 1))
      else {
        // block-offset ids: unique + parallel (annotations_appender.py:197-199
        // semantics — fresh ids past max — without requiring density)
        batch.withColumn("id", monotonically_increasing_id() + lit(maxId + 1))
      }
    val prepared = GraftDataset.defaultAnnotColumns(withId)
    val merged = ds.copy(labelMap = labelMap)
    val aligned = prepared.withColumn("category_str",
      GraftDataset.labelMapColumn(labelMap, col("category_id")))
    val out = merged.copy(
      annotations = merged.annotations.unionByName(aligned, allowMissingColumns = true))
    out.withSplitPropagated.reordered
  }
}
