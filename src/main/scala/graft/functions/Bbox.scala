package graft.functions

import graft.model.GraftDataset
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bounding-box coordinate algebra — reference format parser + import/export
  * (lours/utils/bbox_converter.py:19-496).
  *
  * A format is described by three axes:
  *   - geometry: min-corner+size (`XYWH`), center+size (`CXCYWH`),
  *     two-corner (`XYXY`), or point (`XY`, zero size)
  *   - units: absolute pixels (UPPERCASE) or image-relative 0..1 (lowercase)
  *   - the canonical internal form is `XYWH` pixels
  *     (`box_x_min, box_y_min, box_width, box_height`)
  *
  * Every conversion is pure column arithmetic (fully codegen'd); relative
  * units additionally need the image dims, resolved by one broadcast FK join
  * (bbox_converter.py:279-295) — images ≪ annotations so this never shuffles
  * the fact table.
  */
object Bbox {

  sealed trait Geometry
  case object CornerSize extends Geometry // x_min, y_min, w, h
  case object CenterSize extends Geometry // cx, cy, w, h
  case object TwoCorner extends Geometry  // x_min, y_min, x_max, y_max
  case object Point extends Geometry      // x, y (w = h = 0)

  /** Parsed box format (parse_format_string, bbox_converter.py:19-77).
    * `blockOrder = true` is the reference's `[0,1,2,3]` column order
    * ({x1}{x2}{y1}{y2}: XWYH, XXYY, CXWCYH — darknet's `cxwcyh` lives
    * here); `false` is the interleaved `[0,2,1,3]` order
    * ({x1}{y1}{x2}{y2}: XYWH, XYXY, CXCYWH). Only column ORDER differs —
    * the geometry math is order-blind. */
  case class BoxFormat(geometry: Geometry, relative: Boolean,
      blockOrder: Boolean = false) {
    def columnNames: Seq[String] = (geometry, blockOrder) match {
      case (CornerSize, false) => Seq("x_min", "y_min", "width", "height")
      case (CornerSize, true) => Seq("x_min", "width", "y_min", "height")
      case (CenterSize, false) => Seq("cx", "cy", "width", "height")
      case (CenterSize, true) => Seq("cx", "width", "cy", "height")
      case (TwoCorner, false) => Seq("x_min", "y_min", "x_max", "y_max")
      case (TwoCorner, true) => Seq("x_min", "x_max", "y_min", "y_max")
      case (Point, _) => Seq("x", "y")
    }
    /** The reference's column names for this format
      * (column_names_from_options, bbox_converter.py:80-118): `box_`-
      * prefixed, `_relative`-suffixed when relative, point named
      * box_x_min/box_y_min (reference quirk: point EXPORT values are the
      * box center yet keep the _min names). */
    def referenceColumnNames: Seq[String] = {
      val base = (geometry, blockOrder) match {
        case (Point, _) => Seq("box_x_min", "box_y_min")
        case (CenterSize, true) =>
          Seq("box_x_center", "box_width", "box_y_center", "box_height")
        case (CenterSize, false) =>
          Seq("box_x_center", "box_y_center", "box_width", "box_height")
        case (CornerSize, true) =>
          Seq("box_x_min", "box_width", "box_y_min", "box_height")
        case (CornerSize, false) =>
          Seq("box_x_min", "box_y_min", "box_width", "box_height")
        case (TwoCorner, true) =>
          Seq("box_x_min", "box_x_max", "box_y_min", "box_y_max")
        case (TwoCorner, false) =>
          Seq("box_x_min", "box_y_min", "box_x_max", "box_y_max")
      }
      if (relative) base.map(_ + "_relative") else base
    }
  }

  /** Accepts ALL the reference's format strings (FORMAT_TO_OPTIONS,
    * bbox_converter.py:19-33): the interleaved orders XYWH / CXCYWH /
    * XYXY / XY, the block orders XWYH / CXWCYH / XXYY, and their
    * lowercase (relative-unit) forms — 14 strings total. */
  def parseFormat(s: String): BoxFormat = {
    val relative = s.exists(_.isLower)
    require(s.toUpperCase == s || s.toLowerCase == s,
      s"box format '$s' mixes cases (upper = pixels, lower = relative)")
    s.toUpperCase match {
      case "XYWH" => BoxFormat(CornerSize, relative)
      case "XWYH" => BoxFormat(CornerSize, relative, blockOrder = true)
      case "CXCYWH" => BoxFormat(CenterSize, relative)
      case "CXWCYH" => BoxFormat(CenterSize, relative, blockOrder = true)
      case "XYXY" => BoxFormat(TwoCorner, relative)
      case "XXYY" => BoxFormat(TwoCorner, relative, blockOrder = true)
      case "XY" => BoxFormat(Point, relative)
      case other => throw new IllegalArgumentException(s"unknown box format '$other'")
    }
  }

  /** Canonical output column names (reference utils/__init__.py:8). */
  val canonical = Seq("box_x_min", "box_y_min", "box_width", "box_height")

  /** Convert input columns in format `fmt` to the canonical XYWH-pixels
    * columns (import_bbox, bbox_converter.py:141-312). `in1..in4` are the
    * format's columns in [[BoxFormat.columnNames]] order (in3/in4 unused for
    * Point). `width`/`height` are the image-dim columns, required when
    * `fmt.relative`. */
  def toCanonical(fmt: BoxFormat, in1: Column, in2: Column,
      in3: Column = lit(0.0), in4: Column = lit(0.0),
      width: Column = lit(1), height: Column = lit(1)): Seq[Column] = {
    val (sx, sy) = if (fmt.relative) (width.cast("double"), height.cast("double"))
                   else (lit(1.0), lit(1.0))
    // reorder the format's columns into the reference's (x1, x2, y1, y2)
    // block layout, then the geometry math is order-blind
    val (x1, x2, y1, y2) = fmt.geometry match {
      case Point => (in1.cast("double") * sx, lit(0.0),
        in2.cast("double") * sy, lit(0.0))
      case _ if fmt.blockOrder => (in1.cast("double") * sx,
        in2.cast("double") * sx, in3.cast("double") * sy,
        in4.cast("double") * sy)
      case _ => (in1.cast("double") * sx, in3.cast("double") * sx,
        in2.cast("double") * sy, in4.cast("double") * sy)
    }
    val cols = fmt.geometry match {
      case CornerSize => Seq(x1, y1, x2, y2)
      case CenterSize => Seq(x1 - x2 / 2, y1 - y2 / 2, x2, y2)
      case TwoCorner => Seq(x1, y1, x2 - x1, y2 - y1)
      case Point => Seq(x1, y1, lit(0.0), lit(0.0))
    }
    cols.zip(canonical).map { case (e, n) => e.as(n) }
  }

  /** Inverse: canonical columns → format columns (export_bbox,
    * bbox_converter.py:315-445). Returns columns named per
    * [[BoxFormat.columnNames]]. */
  def fromCanonical(fmt: BoxFormat, xMin: Column, yMin: Column,
      w: Column, h: Column,
      width: Column = lit(1), height: Column = lit(1)): Seq[Column] = {
    val (sx, sy) = if (fmt.relative) (width.cast("double"), height.cast("double"))
                   else (lit(1.0), lit(1.0))
    // (x1, x2, y1, y2) in the reference's block layout; the division order
    // matches export_bbox (scale first, then derive) so doubles agree
    // bit-for-bit: xmin/=sx before x_center = xmin + width/2
    val (x1, x2, y1, y2) = fmt.geometry match {
      case CornerSize => (xMin / sx, w / sx, yMin / sy, h / sy)
      case CenterSize =>
        (xMin / sx + (w / sx) / 2, w / sx, yMin / sy + (h / sy) / 2, h / sy)
      case TwoCorner =>
        (xMin / sx, xMin / sx + w / sx, yMin / sy, yMin / sy + h / sy)
      // reference quirk (export_bbox, bbox_converter.py:424-428): a POINT
      // export emits the box CENTER (point formats are center=True), under
      // the box_{x,y}_min column names
      case Point =>
        (xMin / sx + (w / sx) / 2, lit(0.0), yMin / sy + (h / sy) / 2, lit(0.0))
    }
    val cols = fmt.geometry match {
      case Point => Seq(x1, y1)
      case _ if fmt.blockOrder => Seq(x1, x2, y1, y2)
      case _ => Seq(x1, y1, x2, y2)
    }
    cols.zip(fmt.columnNames).map { case (e, n) => e.as(n) }
  }

  /** Rewrite a dataset's annotation box columns from canonical to `fmt` and
    * back — composition convert (bbox_converter.py:448-496). Input columns
    * `inCols` on `annotations` are replaced by the canonical four. Relative
    * formats broadcast-join image dims on the FK. */
  def importBoxes(ds: GraftDataset, fmt: BoxFormat, inCols: Seq[String]): GraftDataset = {
    val ann0 = ds.annotations
    val ann = if (fmt.relative) {
      val dims = GraftDataset.broadcastIfSmall(ds.images.select(col("id").as("__iid"),
        col("width").as("__w"), col("height").as("__h")))
      val j = ann0.join(dims, ann0("image_id") === col("__iid"), "left")
      val boxes = toCanonical(fmt,
        col(s"`${inCols(0)}`"), col(s"`${inCols(1)}`"),
        if (inCols.size > 2) col(s"`${inCols(2)}`") else lit(0.0),
        if (inCols.size > 3) col(s"`${inCols(3)}`") else lit(0.0),
        col("__w"), col("__h"))
      val keep = j.columns.filterNot(c =>
        inCols.contains(c) || Seq("__iid", "__w", "__h").contains(c) || canonical.contains(c))
      j.select(keep.map(c => col(s"`$c`")).toSeq ++ boxes: _*)
    } else {
      val boxes = toCanonical(fmt,
        col(s"`${inCols(0)}`"), col(s"`${inCols(1)}`"),
        if (inCols.size > 2) col(s"`${inCols(2)}`") else lit(0.0),
        if (inCols.size > 3) col(s"`${inCols(3)}`") else lit(0.0))
      val keep = ann0.columns.filterNot(c => inCols.contains(c) || canonical.contains(c))
      ann0.select(keep.map(c => col(s"`$c`")).toSeq ++ boxes: _*)
    }
    ds.copy(annotations = ann).reordered
  }

  /** Add export columns for `fmt` next to (or replacing) the canonical four
    * (export_bbox). Output columns get `prefix` prepended. */
  def exportBoxes(ds: GraftDataset, fmt: BoxFormat, prefix: String = "",
      dropCanonical: Boolean = false): DataFrame = {
    val ann0 = ds.annotations
    val base = if (fmt.relative) {
      val dims = GraftDataset.broadcastIfSmall(ds.images.select(col("id").as("__iid"),
        col("width").as("__w"), col("height").as("__h")))
      ann0.join(dims, ann0("image_id") === col("__iid"), "left")
    } else ann0.withColumn("__w", lit(1)).withColumn("__h", lit(1))
    val outCols = fromCanonical(fmt,
      col("box_x_min"), col("box_y_min"), col("box_width"), col("box_height"),
      col("__w"), col("__h")).map(c => c) // names per format
    val renamed = outCols.zip(fmt.columnNames).map { case (c, n) => c.as(prefix + n) }
    val keep = base.columns.filterNot(c =>
      Seq("__iid", "__w", "__h").contains(c) || (dropCanonical && canonical.contains(c)))
    base.select(keep.map(c => col(s"`$c`")).toSeq ++ renamed: _*)
  }

  /** Clip boxes to their image bounds (cap_bounding_box_coordinates,
    * dataset.py:2919-3008): broadcast dims join + greatest/least arithmetic. */
  def capBoxes(ds: GraftDataset): GraftDataset = {
    val dims = GraftDataset.broadcastIfSmall(ds.images.select(col("id").as("__iid"),
      col("width").as("__w"), col("height").as("__h")))
    val j = ds.annotations.join(dims, col("image_id") === col("__iid"), "left")
    val x0 = greatest(col("box_x_min"), lit(0.0))
    val y0 = greatest(col("box_y_min"), lit(0.0))
    val x1 = least(col("box_x_min") + col("box_width"), col("__w").cast("double"))
    val y1 = least(col("box_y_min") + col("box_height"), col("__h").cast("double"))
    val ann = j
      .withColumn("box_x_min", x0)
      .withColumn("box_y_min", y0)
      .withColumn("box_width", greatest(x1 - x0, lit(0.0)))
      .withColumn("box_height", greatest(y1 - y0, lit(0.0)))
      .drop("__iid", "__w", "__h")
    ds.copy(annotations = ann)
  }

  /** Pairwise IoU of two boxes given as XYWH-pixels columns — pure
    * expression, codegen-friendly (IoU kernel, evaluation/detection/
    * util.py:54-95, re-expressed as column algebra). */
  def iou(x1: Column, y1: Column, w1: Column, h1: Column,
      x2: Column, y2: Column, w2: Column, h2: Column): Column = {
    val ix = greatest(lit(0.0),
      least(x1 + w1, x2 + w2) - greatest(x1, x2))
    val iy = greatest(lit(0.0),
      least(y1 + h1, y2 + h2) - greatest(y1, y2))
    val inter = ix * iy
    val union = w1 * h1 + w2 * h2 - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }
}
