package graft

import graft.llm.Multimodal

/** Audio fingerprinting + banded near-dup ([[graft.llm.Multimodal]]
  * audioHash64 / audioHashes — the WAV twin of image aHash). */
class AudioDedupSpec extends SparkSuite {

  /** Mono 16-bit PCM WAV: tone bursts at the given strip positions
    * (of 8), amplitude scaled by `gain`. */
  private def wav(burstsAt: Seq[Int], gain: Double, rate: Int = 8000)
  : Array[Byte] = {
    val n = rate
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n) {
      val strip = i * 8 / n
      val v = if (burstsAt.contains(strip))
        (math.sin(2 * math.Pi * 440 * i / rate) * 20000 * gain).toInt
      else 0
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    baos.toByteArray
  }

  private def hashOf(bytes: Array[Byte]): Long =
    Multimodal.decodeWav(bytes)
      .map { case (_, _, _, mono) => Multimodal.audioHash64(mono) }.get

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("fingerprint is gain-invariant (threshold scales with signal)") {
    val loud = hashOf(wav(Seq(1, 4, 6), gain = 1.0))
    val quiet = hashOf(wav(Seq(1, 4, 6), gain = 0.3))
    assert(hamming(loud, quiet) <= 2, s"hamming ${hamming(loud, quiet)}")
  }

  test("different burst patterns hash beyond the dedup threshold") {
    val a = hashOf(wav(Seq(1, 4, 6), gain = 1.0))
    val b = hashOf(wav(Seq(0, 3, 7), gain = 1.0))
    assert(hamming(a, b) > 4, s"hamming ${hamming(a, b)}")
  }

  test("end to end: WAV decode → fingerprint → the image banded " +
    "matcher flags the gain-variant pair only") {
    val dir = java.nio.file.Files.createTempDirectory("audiodedup")
    java.nio.file.Files.write(dir.resolve("a.wav"),
      wav(Seq(1, 4, 6), gain = 1.0))
    java.nio.file.Files.write(dir.resolve("a_quiet.wav"),
      wav(Seq(1, 4, 6), gain = 0.3))
    java.nio.file.Files.write(dir.resolve("other.wav"),
      wav(Seq(0, 3, 7), gain = 1.0))
    java.nio.file.Files.write(dir.resolve("corrupt.wav"),
      Array[Byte](9, 9, 9))
    val hashes = Multimodal.audioHashes(
      Multimodal.readMedia(spark, dir.toString, "*.wav"))
    assert(hashes.count() == 3)
    val pairs = Multimodal.nearDuplicateMedia(hashes, maxDist = 3)
      .collect()
      .map(r => (r.getString(0).split('/').last,
        r.getString(1).split('/').last))
      .toSet
    assert(pairs == Set(("a.wav", "a_quiet.wav")), pairs.toString)
  }
}
