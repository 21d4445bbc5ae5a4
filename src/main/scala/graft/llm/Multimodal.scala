package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media ride as opaque `binary` payload columns next to typed metadata
  * structs; decode / feature-extract steps run as typed `mapPartitions`
  * kernels so a real codec can be dropped in per-partition (amortizing any
  * native-library init across the partition — the Scala analogue of a
  * batched `mapInPandas`). The container has no image/audio codecs, so the
  * decode kernel is a clearly-marked DETERMINISTIC STUB; everything around
  * it — schema, batching, partitioning, output shape — is real and tested.
  */
object Multimodal {

  /** Media row schema: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("media_type", StringType, nullable = false), // image|audio|video
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("format", StringType, nullable = true))), nullable = true)))

  case class MediaFeature(media_id: Long, n_bytes: Int, feature: Array[Float])

  /** ======== STUB ========
    * Deterministic fake decode+feature kernel: a real implementation would
    * decode `payload` with a codec and run a feature extractor; this stub
    * derives an 8-dim feature from byte statistics so the pipeline is
    * end-to-end testable without codecs. Swap the body, keep the signature.
    */
  def decodeFeatureKernel(payload: Array[Byte]): Array[Float] = {
    if (payload == null || payload.isEmpty) return Array.fill(8)(0.0f)
    // accumulate in DOUBLE, per stride, in ascending byte order: each
    // feature's sum is then a fixed-order double reduction that the
    // correctness oracle reproduces bit-for-bit (float32 accumulation
    // would drift from any reimplementation); quantize to float32 once at
    // the end
    val acc = new Array[Double](8)
    var i = 0
    while (i < payload.length) {
      acc(i % 8) += (payload(i) & 0xFF) / 255.0
      i += 1
    }
    val out = new Array[Float](8)
    var j = 0
    while (j < 8) { out(j) = (acc(j) / payload.length * 8).toFloat; j += 1 }
    out
  }

  /** Distributed decode + featurize: repartition by media_id hash (even
    * work distribution for skewed payload sizes), then a per-partition
    * typed kernel. Output is a compact (id, n_bytes, feature) table ready
    * for [[Similarity]] ops. */
  def extractFeatures(media: DataFrame, partitions: Int = 0): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    src.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        MediaFeature(id,
          if (payload == null) 0 else payload.length,
          decodeFeatureKernel(payload))
      })
  }

  /** Frame-sampling plumbing for video rows: emit `n` (media_id, frame_idx,
    * frame_payload) rows per video. The frame extraction itself is the same
    * stub (slices of the payload); the fan-out shape — one row per sampled
    * frame, order-stable — is the real contract. */
  def sampleFrames(media: DataFrame, n: Int = 4): DataFrame = {
    val frames = sequence(lit(0), lit(n - 1))
    media.filter(col("media_type") === "video")
      .select(col("media_id"), explode(frames).as("frame_idx"), col("payload"))
      .withColumn("frame_payload",
        // STUB: a codec would seek+decode; we slice the payload evenly
        expr(s"substring(payload, cast(frame_idx * greatest(length(payload) div $n, 1) + 1 as int), " +
          s"cast(greatest(length(payload) div $n, 1) as int))"))
  }

  /** Image "resize" metadata op: pure plumbing — rewrites the meta struct
    * and tags the payload as needing re-encode (the stub keeps bytes). */
  def resizeMeta(media: DataFrame, width: Int, height: Int): DataFrame =
    media.withColumn("meta",
      struct(lit(width).as("width"), lit(height).as("height"),
        col("meta.duration_ms").as("duration_ms"),
        concat(col("meta.format"), lit("+resized")).as("format")))
}
