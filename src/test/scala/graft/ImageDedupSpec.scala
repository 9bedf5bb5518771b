package graft

import graft.llm.Multimodal
import java.awt.image.BufferedImage

/** Perceptual image hashing + banded near-dup ([[graft.llm.Multimodal]]
  * aHash64 / imageHashes / nearDuplicateMedia). */
class ImageDedupSpec extends SparkSuite {

  /** Deterministic gradient-with-square test pattern. */
  private def pattern(w: Int, h: Int, bright: Int, squareX: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = math.min(255, x * 255 / w + bright)
      val inSquare = x >= squareX && x < squareX + w / 4 &&
        y >= h / 4 && y < h / 2
      val v = if (inSquare) 255 - base else base
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("aHash is invariant to resize and to uniform brightness shift") {
    val base = pattern(128, 96, 0, 32)
    val resized = Multimodal.resizeImage(pattern(512, 384, 0, 128), 128, 96)
    val brighter = pattern(128, 96, 40, 32)
    val h0 = Multimodal.aHash64(base)
    assert(hamming(h0, Multimodal.aHash64(resized)) <= 4,
      "resize changed the hash too much")
    // aHash thresholds by the image's own mean, so a global shift
    // barely moves it
    assert(hamming(h0, Multimodal.aHash64(brighter)) <= 4)
  }

  test("structurally different images hash beyond the dedup threshold") {
    val a = Multimodal.aHash64(pattern(128, 96, 0, 32))
    val b = Multimodal.aHash64(pattern(128, 96, 0, 96))
    // the moved square flips the bits of the cells it covers — more
    // than the maxDist=4 near-dup threshold, so the pair never flags
    assert(hamming(a, b) > 4, s"hamming ${hamming(a, b)}")
  }

  test("hash is deterministic") {
    val h1 = Multimodal.aHash64(pattern(64, 64, 10, 16))
    val h2 = Multimodal.aHash64(pattern(64, 64, 10, 16))
    assert(h1 == h2)
  }

  test("end to end: decode → hash → banded near-dup flags the clone " +
    "pair and not the different image") {
    val dir = java.nio.file.Files.createTempDirectory("imgdedup")
    java.nio.file.Files.write(dir.resolve("a.png"),
      png(pattern(128, 96, 0, 32)))
    java.nio.file.Files.write(dir.resolve("a_resized.png"),
      png(Multimodal.resizeImage(pattern(512, 384, 0, 128), 128, 96)))
    java.nio.file.Files.write(dir.resolve("other.png"),
      png(pattern(128, 96, 0, 96)))
    java.nio.file.Files.write(dir.resolve("not_an_image.png"),
      Array[Byte](1, 2, 3))
    val hashes = Multimodal.imageHashes(
      Multimodal.readMedia(spark, dir.toString, "*.png"))
    assert(hashes.count() == 3) // corrupt file dropped
    val pairs = Multimodal.nearDuplicateMedia(hashes, maxDist = 4)
      .collect()
      .map(r => (r.getString(0).split('/').last,
        r.getString(1).split('/').last))
      .toSet
    assert(pairs == Set(("a.png", "a_resized.png")), pairs.toString)
  }

  test("maxDist outside the banding guarantee is rejected") {
    import spark.implicits._
    val hashes = Seq(("p", 0L)).toDF("path", "ahash")
    intercept[IllegalArgumentException](
      Multimodal.nearDuplicateMedia(hashes, maxDist = 16))
  }
}
