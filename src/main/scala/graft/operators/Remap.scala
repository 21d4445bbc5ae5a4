package graft.operators

import graft.model.{GraftDataset, LabelMaps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

/** Class (category-dimension) remapping — reference remap_classes family
  * (lours/dataset/dataset.py:3340-4015).
  *
  * The mapping is a tiny driver-side dict, so the rewrite is a literal-map
  * `element_at` (codegen'd, no shuffle, no join) over the annotations table;
  * the label map is rewritten on the driver.
  */
object Remap {

  /** Rewrite `category_id` through `mapping`; annotations whose category is
    * not mapped are dropped when `removeNotMapped`, else keep their id and
    * (optionally renamed) entry. `newNames` gives names for output ids not
    * already named by the current label map (dataset.py:3340-3579). */
  def remapClasses(
      ds: GraftDataset,
      mapping: Map[Int, Int],
      newNames: Map[Int, String] = Map.empty,
      removeNotMapped: Boolean = false,
      removeEmptiedImages: Boolean = false): GraftDataset = {
    val newLabelMap: Map[Int, String] = {
      val mapped = mapping.map { case (in, out) =>
        out -> newNames.getOrElse(out,
          ds.labelMap.getOrElse(in, out.toString))
      }
      val kept =
        if (removeNotMapped) Map.empty[Int, String]
        else ds.labelMap.view.filterKeys(k => !mapping.contains(k)).toMap
      kept ++ mapped
    }
    val mapExpr =
      if (mapping.isEmpty) lit(null).cast(IntegerType)
      else element_at(
        map(mapping.toSeq.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*),
        col("category_id"))
    val remapped0 = ds.annotations.withColumn("__new_cat",
      when(mapExpr.isNotNull, mapExpr).otherwise(
        if (removeNotMapped) lit(null).cast(IntegerType) else col("category_id")))
    val remapped = (if (removeNotMapped) remapped0.filter(col("__new_cat").isNotNull)
                    else remapped0)
      .withColumn("category_id", col("__new_cat"))
      .drop("__new_cat")
      .withColumn("category_str",
        GraftDataset.labelMapColumn(newLabelMap, col("category_id")))
    val out = ds.copy(annotations = remapped, labelMap = newLabelMap)
    if (!removeEmptiedImages) out
    else {
      // standard emptied-image cascade (indexing.py:106-119): keep images that
      // still have annotations plus images that were empty before the remap
      val stillHas = ds.images.join(remapped.select(col("image_id")),
        ds.images("id") === col("image_id"), "left_semi")
      val wasEmpty = ds.images.join(ds.annotations.select(col("image_id")),
        ds.images("id") === col("image_id"), "left_anti")
      out.copy(images = stillHas.unionByName(wasEmpty))
    }
  }

  /** Keep only the given classes (identity remap on the kept subset) —
    * dataset.py:4017-4255. */
  def keepClasses(ds: GraftDataset, ids: Set[Int],
      removeEmptiedImages: Boolean = false): GraftDataset =
    remapClasses(ds, ids.map(i => i -> i).toMap,
      removeNotMapped = true, removeEmptiedImages = removeEmptiedImages)

  /** Drop the given classes — dataset.py:4017-4255. */
  def removeClasses(ds: GraftDataset, ids: Set[Int],
      removeEmptiedImages: Boolean = false): GraftDataset =
    keepClasses(ds, ds.labelMap.keySet -- ids, removeEmptiedImages)

  /** Remap from a mapping table `(input_category_id, output_category_id,
    * output_category_name)` (remap_from_dataframe, dataset.py:3633-3792).
    * The table is a dimension — collected to the driver (tiny by contract). */
  def remapFromDataFrame(ds: GraftDataset, df: DataFrame,
      removeNotMapped: Boolean = false): GraftDataset = {
    val rows = df.select(
      col("input_category_id").cast(IntegerType),
      col("output_category_id").cast(IntegerType),
      col("output_category_name").cast(StringType)).collect()
    val mapping = rows.map(r => r.getInt(0) -> r.getInt(1)).toMap
    val names = rows.map(r => r.getInt(1) -> r.getString(2)).toMap
    remapClasses(ds, mapping, names, removeNotMapped)
  }

  /** Align this dataset's category ids to another's label map by name;
    * names missing from `other` get lowest-free ids
    * (remap_from_other, dataset.py:3794-4015). */
  def remapFromOther(ds: GraftDataset, other: GraftDataset,
      removeNotMapped: Boolean = false): GraftDataset = {
    val target = LabelMaps.allocateMissing(other.labelMap, ds.labelMap.values.toSeq)
    val byName = target.map(_.swap)
    val mapping = ds.labelMap.collect {
      case (id, name) if byName.contains(name) => id -> byName(name)
    }
    remapClasses(ds, mapping, target, removeNotMapped)
  }
}
