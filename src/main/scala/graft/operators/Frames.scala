package graft.operators

import graft.model.GraftDataset
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Single-frame access + image iteration — reference get_one_frame /
  * iter_images (lours/dataset/dataset.py:1407-1541). Iteration uses
  * `toLocalIterator` over images pre-joined with their grouped annotations,
  * so the driver holds one image's rows at a time regardless of dataset
  * size. */
object Frames {

  /** One image and its annotations (get_one_frame): the n-th image in id
    * order. */
  def getOneFrame(ds: GraftDataset, n: Int = 0): (Row, Seq[Row]) = {
    val img = ds.images.orderBy("id").limit(n + 1).orderBy(desc("id")).limit(1).collect()
    require(img.nonEmpty, s"no image at position $n")
    val row = img.head
    val anns = ds.annotations.filter(col("image_id") === row.getAs[Long]("id")).collect()
    (row, anns.toSeq)
  }

  /** Iterator over (image, grouped annotation structs) — one driver row per
    * image at a time (iter_images). */
  def iterImages(ds: GraftDataset): Iterator[Row] = {
    val annCols = ds.annotations.columns.map(c => col(s"`$c`"))
    val grouped = ds.annotations.groupBy(col("image_id").as("__gid"))
      .agg(sort_array(collect_list(struct(annCols: _*))).as("annotations"))
    ds.images
      .join(grouped, ds.images("id") === col("__gid"), "left")
      .drop("__gid")
      .orderBy("id")
      .toLocalIterator()
      .asInstanceOf[java.util.Iterator[Row]]
      .asScala
  }

  private implicit class JIter[T](it: java.util.Iterator[T]) {
    def asScala: Iterator[T] = new Iterator[T] {
      def hasNext: Boolean = it.hasNext
      def next(): T = it.next()
    }
  }

  /** File-level image validation (remove_invalid_images / get_invalid_images,
    * dataset.py:1154-1231; utils/testing.py:252-404): probe each image file
    * under `imagesRoot` for existence, decodable header, and (optionally)
    * dimension match — executed distributed in mapPartitions. Returns the
    * error-report frame (id, relative_path, missing, undecodable,
    * size_mismatch). */
  def invalidImageReport(ds: GraftDataset, checkDimensions: Boolean = true): DataFrame = {
    val spark = ds.spark
    import spark.implicits._
    val root = ds.imagesRoot
    val probed = ds.images
      .select(col("id").cast("long"), col("relative_path"),
        col("width").cast("int"), col("height").cast("int"))
      .as[(Long, String, Int, Int)]
      .mapPartitions(_.map { case (id, rel, w, h) =>
        val p = java.nio.file.Paths.get(root, rel)
        val missing = !java.nio.file.Files.isRegularFile(p)
        val (dw, dh) =
          if (missing) (0, 0)
          else {
            val head = new Array[Byte](64)
            val in = java.nio.file.Files.newInputStream(p)
            try { in.read(head) } finally { in.close() }
            graft.io.ImagesFolder.probeDims(head)
          }
        val undecodable = !missing && dw == 0 && dh == 0
        val mismatch = checkDimensions && !missing && !undecodable &&
          (dw != w || dh != h)
        (id, rel, missing, undecodable, mismatch)
      })
      .toDF("id", "relative_path", "missing", "undecodable", "size_mismatch")
    probed.filter(col("missing") || col("undecodable") || col("size_mismatch"))
  }

  /** Drop images whose files are missing/undecodable/mismatched, with the
    * standard annotation cascade (remove_invalid_images). */
  def removeInvalidImages(ds: GraftDataset, checkDimensions: Boolean = true): GraftDataset = {
    val bad = invalidImageReport(ds, checkDimensions).select("id")
    val kept = ds.images.join(bad, Seq("id"), "left_anti")
    val ann = ds.annotations.join(kept.select(col("id").as("__kid")),
      col("image_id") === col("__kid"), "left_semi")
    ds.copy(images = kept, annotations = ann)
  }
}

/** Exhaustive folder sweep — the check_exhaustive half of
  * get_invalid_images (utils/testing.py:252-404): files present under the
  * images root that no image row references (orphans), via a distributed
  * binaryFile listing anti-joined to the images table. */
object FolderSweep {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  def orphanFiles(ds: graft.model.GraftDataset,
      pattern: String = "*.{png,jpg,jpeg}"): DataFrame = {
    val spark = ds.spark
    import spark.implicits._
    // strip by the filesystem path, not the URI: Hadoop renders file URIs
    // with a different slash count (file:/x) than java.nio (file:///x)
    val rootPath = java.nio.file.Paths.get(ds.imagesRoot).toAbsolutePath.normalize.toString
    val listing = spark.read.format("binaryFile")
      .option("pathGlobFilter", pattern)
      .option("recursiveFileLookup", "true")
      .load(ds.imagesRoot)
      .select(col("path")).as[String]
      // binaryFile's `path` is a percent-encoded URI: decode it (URI.getPath
      // keeps '+' literal, unlike URLDecoder) so files with spaces or
      // non-ASCII names match images.relative_path, then strip the root by
      // plain prefix — no regex, so a root with metacharacters can't break it
      .map { p =>
        val fsPath =
          try new java.net.URI(p).getPath
          catch { case _: java.net.URISyntaxException => p.stripPrefix("file:") }
        if (fsPath.startsWith(rootPath + "/")) fsPath.substring(rootPath.length + 1)
        else fsPath
      }
      .toDF("relative_path")
    listing.join(ds.images.select("relative_path"), Seq("relative_path"), "left_anti")
      .select("relative_path")
  }
}
