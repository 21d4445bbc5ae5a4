package graft.io

import graft.model.GraftDataset
import org.apache.spark.sql.SparkSession

/** Native persistence: a directory of parquet datasets + a JSON sidecar with
  * the driver-side metadata. Same logical layout as the reference's
  * parquet format (lours/utils/parquet_saver.py:11-75: one file per table +
  * metadata sidecar), but each table is a *partitioned parquet dataset* so a
  * 100 TB annotations table writes/reads in parallel.
  */
object ParquetIO {

  def write(ds: GraftDataset, dir: String, overwrite: Boolean = false): Unit = {
    val mode = if (overwrite) "overwrite" else "errorifexists"
    ds.images.write.mode(mode).parquet(s"$dir/images")
    ds.annotations.write.mode(mode).parquet(s"$dir/annotations")
    val meta = metadataJson(ds)
    // sidecar via the Hadoop FileSystem API: `dir` may be hdfs://, s3a://…
    // (the parquet datasets above already go through it via Spark)
    val conf = ds.images.sparkSession.sparkContext.hadoopConfiguration
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/metadata.json")
    val fs = metaPath.getFileSystem(conf)
    val out = fs.create(metaPath, true)
    try out.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(spark: SparkSession, dir: String): GraftDataset = {
    val images = spark.read.parquet(s"$dir/images")
    val annotations = spark.read.parquet(s"$dir/annotations")
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/metadata.json")
    val fs = metaPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (lm, root, name, booleanized) =
      if (fs.exists(metaPath)) {
        val in = fs.open(metaPath)
        val txt =
          try scala.io.Source.fromInputStream(in, "UTF-8").mkString
          finally in.close()
        parseMetadata(txt)
      }
      else (Map.empty[Int, String], ".", None, Map("images" -> Set.empty[String], "annotations" -> Set.empty[String]))
    GraftDataset(images, annotations, lm, root, name, booleanized)
  }

  /** JSON string-content escaping, shared with the CLI's meta sidecar. */
  private[graft] def escJson(s: String): String = esc(s)

  private def esc(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  private[graft] def metadataJson(ds: GraftDataset): String = {
    val lm = ds.labelMap.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""$k": "${esc(v)}"""" }.mkString("{", ", ", "}")
    val bool = ds.booleanized.toSeq.sortBy(_._1).map { case (t, cols) =>
      s""""${esc(t)}": [${cols.toSeq.sorted.map(c => s""""${esc(c)}"""").mkString(", ")}]"""
    }.mkString("{", ", ", "}")
    val name = ds.datasetName.map(n => s""""${esc(n)}"""").getOrElse("null")
    s"""{
       |  "label_map": $lm,
       |  "images_root": "${esc(ds.imagesRoot)}",
       |  "dataset_name": $name,
       |  "booleanized_columns": $bool
       |}""".stripMargin
  }

  /** Minimal JSON parsing for our own sidecar format (no JSON lib in the
    * dependency budget). Tolerates whitespace; assumes the structure written
    * by [[metadataJson]]. */
  private[graft] def parseMetadata(json: String)
      : (Map[Int, String], String, Option[String], Map[String, Set[String]]) = {
    def strField(name: String): Option[String] = {
      val m = ("\"" + name + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r.findFirstMatchIn(json)
      m.map(g => unesc(g.group(1)))
    }
    def objField(name: String): Option[String] = {
      val m = ("\"" + name + "\"\\s*:\\s*(\\{[^}]*\\})").r.findFirstMatchIn(json)
      m.map(_.group(1))
    }
    val lm = objField("label_map").map { body =>
      "\"(-?\\d+)\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(body)
        .map(m => m.group(1).toInt -> unesc(m.group(2))).toMap
    }.getOrElse(Map.empty)
    val root = strField("images_root").getOrElse(".")
    val name = strField("dataset_name")
    val bool = objField("booleanized_columns").map { body =>
      "\"(\\w+)\"\\s*:\\s*\\[([^\\]]*)\\]".r.findAllMatchIn(body).map { m =>
        val cols = "\"((?:[^\"\\\\]|\\\\.)*)\"".r.findAllMatchIn(m.group(2)).map(g => unesc(g.group(1))).toSet
        m.group(1) -> cols
      }.toMap
    }.getOrElse(Map("images" -> Set.empty[String], "annotations" -> Set.empty[String]))
    (lm, root, name, bool)
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb += '\n'; i += 2
          case 'r' => sb += '\r'; i += 2
          case 't' => sb += '\t'; i += 2
          case 'u' => sb += Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar; i += 6
          case other => sb += other; i += 2
        }
      } else { sb += c; i += 1 }
    }
    sb.toString
  }
}

/** Bucketed persistence — the co-located-join scale path: images bucketed
  * by `id` and annotations by `image_id` into the SAME bucket count land
  * FK-join-aligned on disk, so every images⋈annotations (and any
  * repeated per-image kernel) runs WITHOUT a shuffle exchange on the fact
  * table. This is the 100 TB answer to "the FK join side no longer fits
  * broadcast". Requires a table catalog (saveAsTable), which Spark's
  * default in-memory/derby catalog provides. */
object BucketedIO {
  import org.apache.spark.sql.SparkSession
  import graft.model.GraftDataset

  /** Persist as bucketed tables `<name>_images` / `<name>_annotations`.
    * Overwrites both the catalog entries AND any stale warehouse location
    * left by a previous session (an in-memory catalog forgets tables on
    * restart but their directories survive, which otherwise fails the
    * write with LOCATION_ALREADY_EXISTS). */
  def writeBucketed(ds: GraftDataset, name: String, buckets: Int = 32): Unit = {
    val spark = ds.spark
    Seq(s"${name}_images", s"${name}_annotations").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS `$t`")
      val warehouse = spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:")
      val leftover = java.nio.file.Paths.get(warehouse, t)
      if (java.nio.file.Files.isDirectory(leftover)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(leftover).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.deleteIfExists(_))
      }
    }
    // co-locate each bucket into ONE write task before the bucketed write
    // (the writeMinHashStore discipline): without it every input task
    // writes a sliver into every bucket — tasks × buckets tiny files per
    // table — and the join-side reads pay the small-file tax forever.
    // repartition's hash partitioning and Spark's bucket-id hash are the
    // same Murmur3 function, so the exchange lands each bucket whole in
    // one task → one well-sized file per bucket.
    ds.images.repartition(buckets, ds.images("id"))
      .write.format("parquet")
      .bucketBy(buckets, "id").sortBy("id")
      .mode("overwrite").saveAsTable(s"${name}_images")
    ds.annotations.repartition(buckets, ds.annotations("image_id"))
      .write.format("parquet")
      .bucketBy(buckets, "image_id").sortBy("image_id")
      .mode("overwrite").saveAsTable(s"${name}_annotations")
  }

  /** Reload; joins on images.id = annotations.image_id use the bucket
    * layout (no Exchange on either side when bucket counts match). */
  def readBucketed(spark: SparkSession, name: String,
      labelMap: Map[Int, String] = Map.empty): GraftDataset =
    GraftDataset(
      spark.table(s"${name}_images"),
      spark.table(s"${name}_annotations"),
      labelMap)
}
