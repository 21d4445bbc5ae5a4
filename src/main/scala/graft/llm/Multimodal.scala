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
  * batched `mapInPandas`). Image decode is REAL (`javax.imageio`, JDK
  * built-in JPEG/PNG/GIF/BMP — [[decodeImages]]); audio header decode is
  * REAL (`javax.sound.sampled`, WAV/AIFF/AU — [[decodeAudio]]); multi-frame
  * sampling is REAL for every ImageIO-readable container, which includes
  * animated GIF (`ImageReader.getNumImages(true)`/`read(i)` —
  * [[decodeFrames]]); the 8-dim byte-statistic feature kernel is kept
  * alongside as an oracle-exact plumbing check, and the byte-slicing
  * [[sampleFrames]] stub remains only for genuinely codec-less containers
  * (MP4/WebM — no decoder ships in the JDK).
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

  /** Result of a REAL image decode: dims + band count from the decoded
    * raster (not header sniffing), per-band pixel means as a simple exact
    * feature, and a decode_ok flag. `format` is the container sniffed from
    * magic bytes (available even when decode fails). */
  case class DecodedImage(
      media_id: Long, n_bytes: Int, format: String, decode_ok: Boolean,
      width: Int, height: Int, channels: Int, mean_channel: Array[Double])

  /** Container sniff from magic bytes — JPEG/PNG/GIF/BMP, else "unknown". */
  def sniffFormat(b: Array[Byte]): String =
    if (b == null || b.length < 4) "unknown"
    else if ((b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') "png"
    else if ((b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 && (b(2) & 0xFF) == 0xFF) "jpeg"
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else if (b(0) == 'B' && b(1) == 'M') "bmp"
    else "unknown"

  /** REAL decode kernel: `javax.imageio` (JPEG/PNG/GIF/BMP readers ship in
    * the JDK) decodes the payload; on success we report raster dims, band
    * count, and exact per-band means (integer sample sums in double — PNG
    * being lossless, these reproduce bit-for-bit from the planted pixels).
    * Undecodable/empty payloads yield decode_ok=false with zeroed dims,
    * never an exception — a 100-TB corpus always contains corrupt blobs and
    * one bad row must not kill the stage. Note: palette formats (GIF,
    * indexed PNG) decode to a 1-band indexed raster, so `channels` = 1 and
    * means are palette indices — raster semantics, asserted in spec. */
  def decodeImageKernel(id: Long, payload: Array[Byte]): DecodedImage = {
    val n = if (payload == null) 0 else payload.length
    val fmt = sniffFormat(payload)
    val img =
      if (n == 0) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
    if (img == null) DecodedImage(id, n, fmt, decode_ok = false, 0, 0, 0, Array.empty)
    else {
      val (w, h, c, means) = rasterStats(img)
      DecodedImage(id, n, fmt, decode_ok = true, w, h, c, means)
    }
  }

  /** Distributed REAL image decode over (media_id, payload) rows — the
    * production face of [[decodeImageKernel]]. Same partitioning contract
    * as [[extractFeatures]]: optional hash repartition on media_id evens
    * out skewed payload sizes; the kernel runs per-partition so codec init
    * (ImageIO scans its reader registry once) is amortized. ImageIO's
    * temp-file cache is disabled per-partition — at 32 concurrent tasks the
    * default disk cache turns decode into tmp-dir IO. */
  def decodeImages(media: DataFrame, partitions: Int = 0): Dataset[DecodedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    src.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) => decodeImageKernel(id, payload) }
      }
  }

  /** Deterministic byte-statistic feature kernel — the PLUMBING CHECK
    * companion to the real decoders ([[decodeImageKernel]],
    * [[decodeAudioKernel]]): its 8-dim feature is exactly reproducible in
    * SQL, which lets the q61 gate oracle the mapPartitions pipeline
    * end-to-end (batching, null handling, row preservation) independently
    * of any codec. For real content features use the decoders' outputs
    * (per-band means, audio shape). */
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

  /** Result of a REAL audio header decode (JDK `javax.sound.sampled`,
    * WAV/AIFF/AU built in): container format, PCM shape, frame count and
    * integer-exact duration. */
  case class ImageHash(media_id: Long, decode_ok: Boolean, dhash: Long,
      dhash_bits: String)

  /** dHash (difference hash) kernel — the classic perceptual image
    * fingerprint: sample a 9×8 grayscale grid (nearest-pixel sampling,
    * `gx = x·w/9`, `gy = y·h/8` in integer math — deterministic, no
    * resampling filter to disagree about), set bit `y·8+x` iff
    * `g(x+1,y) > g(x,y)`. Gray images use the raster sample directly;
    * RGB uses the integer luma `(299r + 587g + 114b)/1000`. Near-identical
    * images (recompression, small edits) land within a few bits; the
    * 64-char bit string rides along for oracle-friendly comparison.
    * Fail-closed: undecodable payloads yield decode_ok=false. */
  def dHashKernel(id: Long, payload: Array[Byte]): ImageHash = {
    val img =
      if (payload == null || payload.length == 0) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
    if (img == null) ImageHash(id, decode_ok = false, 0L, "")
    else {
      val raster = img.getRaster
      val w = img.getWidth; val h = img.getHeight
      val bands = raster.getNumBands
      def gray(px: Int, py: Int): Int =
        if (bands >= 3)
          (299 * raster.getSample(px, py, 0) + 587 * raster.getSample(px, py, 1)
            + 114 * raster.getSample(px, py, 2)) / 1000
        else raster.getSample(px, py, 0)
      val g = Array.tabulate(8, 9)((y, x) => gray(x * w / 9, y * h / 8))
      var hash = 0L
      val bits = new StringBuilder(64)
      var y = 0
      while (y < 8) {
        var x = 0
        while (x < 8) {
          val bit = g(y)(x + 1) > g(y)(x)
          if (bit) hash |= 1L << (y * 8 + x)
          bits.append(if (bit) '1' else '0')
          x += 1
        }
        y += 1
      }
      ImageHash(id, decode_ok = true, hash, bits.toString)
    }
  }

  /** Distributed dHash over (media_id, payload) rows — same partitioning
    * and codec-cache contract as [[decodeImages]]. */
  def imageHashes(media: DataFrame, partitions: Int = 0): Dataset[ImageHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    src.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) => dHashKernel(id, payload) }
      }
  }

  /** Perceptual-hash image near-dup pairs: decode → dHash → the shared
    * 64-bit hamming banding pipeline ([[graft.llm.Dedup.hammingNearDups]]
    * — 4×16-bit bands, occupancy guard, exact verify). Pigeonhole-exact
    * recall for `maxHamming ≤ 3` under the bucket cap; undecodable
    * payloads are dropped (they have no visual content to match). */
  def imageNearDups(media: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 256): DataFrame =
    graft.llm.Dedup.hammingNearDups(
      imageHashes(media).toDF().filter(col("decode_ok"))
        .select(col("media_id").as("id"), col("dhash").as("sig")),
      maxHamming, maxBucketSize)

  case class DecodedAudio(media_id: Long, n_bytes: Int, format: String,
      decode_ok: Boolean, sample_rate: Int, channels: Int, bits: Int,
      n_frames: Long, duration_ms: Long)

  /** Container sniff for audio payloads (magic bytes; works even when the
    * full decode fails). */
  def sniffAudioFormat(b: Array[Byte]): String =
    if (b == null || b.length < 12) "unknown"
    else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') "wav"
    else if (b(0) == 'F' && b(1) == 'O' && b(2) == 'R' && b(3) == 'M' &&
      b(8) == 'A' && b(9) == 'I' && b(10) == 'F' && b(11) == 'F') "aiff"
    else if (b(0) == '.' && b(1) == 's' && b(2) == 'n' && b(3) == 'd') "au"
    else "unknown"

  /** REAL audio decode kernel: `AudioSystem.getAudioFileFormat` parses the
    * header (no sample data is read — constant work per blob regardless of
    * payload size, exactly what a 100-TB metadata pass wants). Fail-closed
    * like [[decodeImageKernel]]: corrupt/empty payloads report
    * decode_ok=false, never throw. duration_ms is integer arithmetic
    * (frames·1000 div rate) so it reproduces exactly cross-engine. */
  def decodeAudioKernel(id: Long, payload: Array[Byte]): DecodedAudio = {
    val n = if (payload == null) 0 else payload.length
    val fmt = sniffAudioFormat(payload)
    if (n == 0) return DecodedAudio(id, 0, fmt, decode_ok = false, 0, 0, 0, 0L, 0L)
    try {
      val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(payload))
      val f = aff.getFormat
      val frames = aff.getFrameLength.toLong
      val sr = f.getSampleRate.toLong
      DecodedAudio(id, n, fmt, decode_ok = true, f.getSampleRate.toInt,
        f.getChannels, f.getSampleSizeInBits, frames,
        if (sr > 0 && frames > 0) frames * 1000L / sr else 0L)
    } catch {
      case _: Exception =>
        DecodedAudio(id, n, fmt, decode_ok = false, 0, 0, 0, 0L, 0L)
    }
  }

  case class AudioHash(media_id: Long, decode_ok: Boolean, ahash: Long,
      ahash_bits: String)

  /** Audio envelope hash — the audio face of the dHash idea: decode the
    * PCM sample stream (javax.sound.sampled — REAL decode, not a header
    * parse), split channel 0 into 65 equal windows, sum |sample| per
    * window as EXACT integer energy, set bit `w` iff
    * `energy(w+1) > energy(w)`. Loudness-scale-invariant-ish (the envelope
    * SHAPE is what's hashed) and integer-exact, so a lossless-PCM fixture
    * reproduces the bits from its sample formula in an external oracle.
    * 16-bit PCM only (the lossless interchange format); anything else
    * fails closed. */
  def audioHashKernel(id: Long, payload: Array[Byte]): AudioHash = {
    if (payload == null || payload.length == 0)
      return AudioHash(id, decode_ok = false, 0L, "")
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      val f = ais.getFormat
      if (f.getSampleSizeInBits != 16 ||
        f.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
        return AudioHash(id, decode_ok = false, 0L, "")
      val bytes = ais.readAllBytes()
      val frame = f.getFrameSize // bytes per frame (all channels)
      val n = bytes.length / frame
      if (n < 65) return AudioHash(id, decode_ok = false, 0L, "")
      def sample(i: Int): Int = {
        val off = i * frame // channel 0 = first 2 bytes of the frame
        if (f.isBigEndian) (bytes(off) << 8) | (bytes(off + 1) & 0xFF)
        else (bytes(off + 1) << 8) | (bytes(off) & 0xFF)
      }
      val energy = new Array[Long](65)
      var w = 0
      while (w < 65) {
        var i = w * n / 65
        val end = (w + 1) * n / 65
        var e = 0L
        while (i < end) { e += math.abs(sample(i)); i += 1 }
        energy(w) = e
        w += 1
      }
      var hash = 0L
      val bits = new StringBuilder(64)
      var b = 0
      while (b < 64) {
        val bit = energy(b + 1) > energy(b)
        if (bit) hash |= 1L << b
        bits.append(if (bit) '1' else '0')
        b += 1
      }
      AudioHash(id, decode_ok = true, hash, bits.toString)
    } catch {
      case _: Exception => AudioHash(id, decode_ok = false, 0L, "")
    }
  }

  /** Distributed audio-envelope hashing — same contract as
    * [[imageHashes]]. */
  def audioHashes(media: DataFrame, partitions: Int = 0): Dataset[AudioHash] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    src.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => audioHashKernel(id, payload) })
  }

  /** Audio near-dup pairs: envelope hash → the shared 64-bit hamming
    * banding ([[graft.llm.Dedup.hammingNearDups]]). */
  def audioNearDups(media: DataFrame, maxHamming: Int = 3,
      maxBucketSize: Int = 256): DataFrame =
    graft.llm.Dedup.hammingNearDups(
      audioHashes(media).toDF().filter(col("decode_ok"))
        .select(col("media_id").as("id"), col("ahash").as("sig")),
      maxHamming, maxBucketSize)

  /** Distributed REAL audio decode over (media_id, payload) rows — same
    * partitioning contract as [[decodeImages]]. */
  def decodeAudio(media: DataFrame, partitions: Int = 0): Dataset[DecodedAudio] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    src.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => decodeAudioKernel(id, payload) })
  }

  /** One sampled, decoded frame of a multi-frame payload. `frame_idx` is
    * the frame's index within the container (not the sample ordinal);
    * `n_frames` the container's total frame count. */
  case class DecodedFrame(
      media_id: Long, n_bytes: Int, format: String,
      frame_idx: Int, n_frames: Int, decode_ok: Boolean,
      width: Int, height: Int, channels: Int, mean_channel: Array[Double])

  /** Raster walk shared by the image and frame kernels: dims, band count,
    * exact per-band sample means (double accumulation, one fixed order). */
  private def rasterStats(img: java.awt.image.BufferedImage)
      : (Int, Int, Int, Array[Double]) = {
    val raster = img.getRaster
    val w = img.getWidth; val h = img.getHeight; val c = raster.getNumBands
    val sums = new Array[Double](c)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var b = 0
        while (b < c) { sums(b) += raster.getSample(x, y, b); b += 1 }
        x += 1
      }
      y += 1
    }
    val px = w.toLong * h
    (w, h, c, sums.map(_ / px))
  }

  /** REAL multi-frame decode kernel: ImageIO's reader API is multi-image
    * (`getNumImages(true)` / `read(i)`), so animated GIF — a JDK-decodable
    * multi-frame container — decodes frame by frame with no external codec;
    * single-image containers (PNG/JPEG/BMP) emit one frame. Samples
    * `min(n, total)` frames at evenly spaced indices `k·total/n` (all
    * frames when `total ≤ n`), emitting real dims + per-band means per
    * frame. Fail-closed like [[decodeImageKernel]]: unreadable/empty
    * payloads yield ONE decode_ok=false row, never an exception, so the
    * per-video fan-out stays bounded and a corrupt blob can't kill a
    * 100-TB stage. Palette formats decode to a 1-band indexed raster
    * (means are palette indices — same raster semantics as
    * [[decodeImageKernel]], spec-asserted). */
  def decodeFramesKernel(id: Long, payload: Array[Byte], n: Int): Seq[DecodedFrame] = {
    require(n >= 1, s"n must be positive, got $n")
    val nb = if (payload == null) 0 else payload.length
    val fmt = sniffFormat(payload)
    def fail = Seq(DecodedFrame(id, nb, fmt, 0, 0, decode_ok = false, 0, 0, 0, Array.empty))
    if (nb == 0) fail
    else {
      var iis: javax.imageio.stream.ImageInputStream = null
      try {
        iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) fail
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val total = reader.getNumImages(true)
            if (total <= 0) fail
            else {
              val indices =
                if (total <= n) 0 until total
                else (0 until n).map(k => (k.toLong * total / n).toInt)
              indices.map { idx =>
                val (w, h, c, means) = rasterStats(reader.read(idx))
                DecodedFrame(id, nb, fmt, idx, total, decode_ok = true, w, h, c, means)
              }
            }
          } finally reader.dispose()
        }
      } catch { case _: Exception => fail }
      finally if (iis != null) iis.close()
    }
  }

  /** Distributed REAL frame sampling over (media_id, payload) rows — the
    * production face of [[decodeFramesKernel]], same partitioning contract
    * as [[decodeImages]]. Output is one row per sampled frame (fail-closed
    * rows keep exactly one row per unreadable payload). */
  def decodeFrames(media: DataFrame, n: Int = 4, partitions: Int = 0): Dataset[DecodedFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    src.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.flatMap { case (id, payload) => decodeFramesKernel(id, payload, n) }
      }
  }

  /** Frame-sampling plumbing for video rows: emit `n` (media_id, frame_idx,
    * frame_payload) rows per video. For ImageIO-decodable containers
    * (animated GIF) use [[decodeFrames]] — the REAL kernel. This byte-slice
    * stub remains only for codec-less containers (MP4/WebM: no JDK
    * decoder); the fan-out shape — one row per sampled frame, order-stable
    * — is the real contract it checks. */
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

  /** A REAL resize result: target raster dims, exact per-channel means of
    * the RESIZED pixels, and the re-encoded (lossless PNG) payload. */
  case class ResizedImage(
      media_id: Long, width: Int, height: Int, resize_ok: Boolean,
      mean_r: Double, mean_g: Double, mean_b: Double, png: Array[Byte])

  /** REAL resize kernel — nearest-neighbor resampling hand-rolled over the
    * decoded raster (`srcX = x·srcW / dstW`, integer floor: deterministic
    * on every JVM, unlike Graphics2D interpolation whose rendering hints
    * are implementation-defined), re-encoded as PNG (lossless — the means
    * reproduce bit-for-bit from the resized pixels). Fail-closed like
    * [[decodeImageKernel]]: undecodable payloads yield resize_ok=false,
    * zeroed stats, empty payload — never an exception. */
  def resizeImageKernel(id: Long, payload: Array[Byte], w: Int, h: Int)
      : ResizedImage = {
    require(w > 0 && h > 0, s"target dims must be positive: ${w}x$h")
    val img =
      if (payload == null || payload.length == 0) null
      else
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        catch { case _: Exception => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0)
      ResizedImage(id, 0, 0, resize_ok = false, 0.0, 0.0, 0.0, Array.empty)
    else {
      val out = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        val sy = (y.toLong * img.getHeight / h).toInt
        var x = 0
        while (x < w) {
          val sx = (x.toLong * img.getWidth / w).toInt
          val rgb = img.getRGB(sx, sy)
          out.setRGB(x, y, rgb)
          sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(out, "png", bos)
      ResizedImage(id, w, h, resize_ok = true,
        sr.toDouble / n, sg.toDouble / n, sb.toDouble / n, bos.toByteArray)
    }
  }

  /** Distributed REAL image resize — [[decodeImages]]'s contract (optional
    * repartition, per-partition codec init, ImageIO disk cache off) over
    * [[resizeImageKernel]]. The payload column in/out is the whole row
    * weight, so at 100 TB this is the canonical "byte-heavy map" stage:
    * scan-bound, no shuffle unless `partitions` forces a re-balance. */
  def resizeImages(media: DataFrame, width: Int, height: Int,
      partitions: Int = 0): Dataset[ResizedImage] = {
    val spark = media.sparkSession
    import spark.implicits._
    val src = if (partitions > 0) media.repartition(partitions, col("media_id")) else media
    src.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        javax.imageio.ImageIO.setUseCache(false)
        it.map { case (id, payload) => resizeImageKernel(id, payload, width, height) }
      }
  }
}
