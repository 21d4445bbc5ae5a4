package graft

import graft.llm.Multimodal
import org.apache.spark.sql.functions._

class ImageHashSpec extends SparkFunSuite {
  import spark.implicits._

  private def png(img: java.awt.image.BufferedImage): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def gradient(w: Int, h: Int, shift: Int = 0): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = math.min(255, (x * 255) / w + shift)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    png(img)
  }

  test("dHash: monotone gradient sets every bit; constant image sets none") {
    val grad = Multimodal.dHashKernel(0L, gradient(90, 80))
    assert(grad.decode_ok)
    // strictly increasing left→right at every sampled column step
    assert(grad.dhash_bits.count(_ == '1') == 64)
    val img = new java.awt.image.BufferedImage(9, 8,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 8; x <- 0 until 9) img.getRaster.setSample(x, y, 0, 128)
    val flat = Multimodal.dHashKernel(1L, png(img))
    assert(flat.dhash == 0L && flat.dhash_bits.count(_ == '0') == 64)
  }

  test("dHash is robust to brightness shift and scale; corrupt fails closed") {
    val a = Multimodal.dHashKernel(0L, gradient(90, 80))
    val b = Multimodal.dHashKernel(1L, gradient(90, 80, shift = 10))
    val c = Multimodal.dHashKernel(2L, gradient(45, 40)) // same scene, half size
    assert(graft.llm.Dedup.hammingNearDups(
      Seq((0L, a.dhash), (1L, b.dhash), (2L, c.dhash)).toDF("id", "sig"),
      maxDist = 3).count() == 3) // all three pairwise near-dups
    val bad = Multimodal.dHashKernel(3L, "not an image".getBytes)
    assert(!bad.decode_ok && bad.dhash_bits.isEmpty)
    assert(Multimodal.dHashKernel(4L, null).decode_ok == false)
  }

  private def wav(samples: Array[Int]): Array[Byte] = {
    val pcm = new Array[Byte](samples.length * 2)
    samples.zipWithIndex.foreach { case (v, i) =>
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("audio envelope hash: shape-sensitive, amplitude-invariant, fail-closed") {
    val rising = Array.tabulate(650)(i => i / 4)          // growing envelope
    val a = Multimodal.audioHashKernel(0L, wav(rising))
    assert(a.decode_ok && a.ahash_bits.count(_ == '1') == 64)
    val doubled = Multimodal.audioHashKernel(1L, wav(rising.map(_ * 2)))
    assert(doubled.ahash == a.ahash) // scale-invariant comparisons
    val flat = Multimodal.audioHashKernel(2L, wav(Array.fill(650)(100)))
    assert(flat.ahash == 0L)
    val falling = Multimodal.audioHashKernel(3L, wav(rising.reverse))
    assert(falling.ahash != a.ahash)
    assert(!Multimodal.audioHashKernel(4L, "garbage".getBytes).decode_ok)
    assert(!Multimodal.audioHashKernel(5L, wav(Array.fill(10)(5))).decode_ok) // <65 samples
  }

  test("audioNearDups pairs identical envelopes only") {
    val rising = Array.tabulate(650)(i => i / 4)
    val media = Seq(
      (0L, wav(rising)), (1L, wav(rising)),
      (2L, wav(rising.reverse)), (3L, Array[Byte](9, 9))
    ).toDF("media_id", "payload")
    val pairs = Multimodal.audioNearDups(media, maxHamming = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }

  test("imageNearDups finds planted dups and drops undecodables") {
    val media = Seq(
      (0L, gradient(90, 80)),
      (1L, gradient(90, 80)),          // identical twin
      (2L, {                            // reversed gradient — far away
        val img = new java.awt.image.BufferedImage(90, 80,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        for (y <- 0 until 80; x <- 0 until 90) {
          val v = 255 - (x * 255) / 90
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
        }
        png(img)
      }),
      (3L, Array[Byte](1, 2, 3))       // corrupt
    ).toDF("media_id", "payload")
    val pairs = Multimodal.imageNearDups(media, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((0L, 1L)))
  }
}
