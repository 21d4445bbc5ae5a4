package graft.model

import org.apache.spark.sql.types._

/** Canonical core schemas of the two-table relational model.
  *
  * Mirrors the reference's required/default column sets
  * (lours/dataset/dataset.py:51-70): a fixed, dtype-enforced core plus any
  * number of dynamic "attribute" columns riding along on the same DataFrame.
  */
object Schemas {

  // ---- images table -------------------------------------------------------
  val ImageId = "id"
  val ImageCore: Seq[StructField] = Seq(
    StructField("id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("relative_path", StringType, nullable = false),
    StructField("type", StringType, nullable = true),
    StructField("split", StringType, nullable = true)
  )
  val imageCoreNames: Seq[String] = ImageCore.map(_.name)
  /** Columns a caller must supply; the rest are derived/defaulted. */
  val imageRequired: Set[String] = Set("width", "height", "relative_path")

  // ---- annotations table --------------------------------------------------
  val AnnotCore: Seq[StructField] = Seq(
    StructField("id", LongType, nullable = false),
    StructField("image_id", LongType, nullable = false),
    StructField("category_id", IntegerType, nullable = false),
    StructField("category_str", StringType, nullable = true),
    StructField("split", StringType, nullable = true),
    StructField("box_x_min", DoubleType, nullable = false),
    StructField("box_y_min", DoubleType, nullable = false),
    StructField("box_width", DoubleType, nullable = false),
    StructField("box_height", DoubleType, nullable = false)
  )
  val annotCoreNames: Seq[String] = AnnotCore.map(_.name)
  val annotRequired: Set[String] =
    Set("image_id", "category_id", "box_x_min", "box_y_min", "box_width", "box_height")

  /** Canonical bbox column names (reference utils/__init__.py:8). */
  val boxCols: Seq[String] = Seq("box_x_min", "box_y_min", "box_width", "box_height")

  /** Canonical column ordering: core columns (in core order) first, then
    * attribute columns in their current order
    * (utils/dataframe_formatter.py:7-34). */
  def canonicalOrder(existing: Seq[String], core: Seq[String]): Seq[String] = {
    val coreSet = core.toSet
    core.filter(existing.contains) ++ existing.filterNot(coreSet.contains)
  }
}
