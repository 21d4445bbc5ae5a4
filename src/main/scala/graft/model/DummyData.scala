package graft.model

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Seeded synthetic dataset generator — reference dummy_dataset
  * (lours/utils/doc_utils.py:230-748), re-expressed as deterministic
  * hash-derived columns over `spark.range`: identical output for any
  * partitioning/parallelism (the reference relies on a single-threaded
  * numpy RNG stream; we derive every value as xxhash64(id, seed, tag)). */
object DummyData {

  private def u(tag: Int, seed: Long, c: org.apache.spark.sql.Column) =
    pmod(xxhash64(c, lit(seed), lit(tag)), lit(1000003L)).cast("double") / 1000003.0

  /** @param nImages      number of images
    * @param nAnnotations number of annotations (image assignment uniform)
    * @param labelMap     category dimension
    * @param addConfidence add a confidence column (prediction-shaped)
    * @param seed         RNG seed */
  def dummyDataset(spark: SparkSession, nImages: Int = 10, nAnnotations: Int = 100,
      labelMap: Map[Int, String] = Map(0 -> "person", 1 -> "car"),
      addConfidence: Boolean = false, splits: Seq[String] = Seq("train", "valid"),
      seed: Long = 0L): GraftDataset = {
    val catIds = labelMap.keys.toSeq.sorted
    val images = spark.range(nImages).select(
      col("id"),
      (u(1, seed, col("id")) * 1000 + 200).cast("int").as("width"),
      (u(2, seed, col("id")) * 800 + 200).cast("int").as("height"),
      concat(lit("img_"), col("id"), lit(".jpg")).as("relative_path"),
      element_at(array(splits.map(lit): _*),
        (u(3, seed, col("id")) * splits.length).cast("int") + 1).as("split"))
    val dims = GraftDataset.broadcastIfSmall(images.select(col("id").as("__iid"),
      col("width").as("__w"), col("height").as("__h")))
    val ann0 = spark.range(nAnnotations).select(
      col("id"),
      (u(4, seed, col("id")) * nImages).cast("long").as("image_id"),
      element_at(array(catIds.map(lit): _*),
        (u(5, seed, col("id")) * catIds.length).cast("int") + 1).as("category_id"))
    val ann = ann0.join(dims, col("image_id") === col("__iid"))
      .withColumn("box_x_min", u(6, seed, col("id")) * col("__w") * 0.8)
      .withColumn("box_y_min", u(7, seed, col("id")) * col("__h") * 0.8)
      .withColumn("box_width",
        greatest(lit(1.0), u(8, seed, col("id")) * (col("__w") - col("box_x_min"))))
      .withColumn("box_height",
        greatest(lit(1.0), u(9, seed, col("id")) * (col("__h") - col("box_y_min"))))
      .drop("__iid", "__w", "__h")
    val withConf =
      if (addConfidence) ann.withColumn("confidence", u(10, seed, col("id")))
      else ann
    GraftDataset.create(images, withConf, labelMap,
      datasetName = Some(s"dummy_$seed"))
  }
}
