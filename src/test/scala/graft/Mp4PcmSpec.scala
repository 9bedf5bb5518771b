package graft

import graft.llm.{Mp4Pcm, Multimodal}

/** Pins [[Mp4Pcm]] — the real PCM-in-MP4 payload decoder behind the
  * [[Multimodal.MediaDecoder]] seam: exact sample recovery through
  * the full stsd/stsz/stsc/stco(co64) walk, byte-order handling,
  * fail-closed quarantine for compressed codecs and malformed
  * tables, and the end-to-end extractFeatures integration. */
class Mp4PcmSpec extends SparkSuite {

  // ---- ISO BMFF fixture builders (absolute stco offsets computed
  // after the moov is assembled)

  private def u32b(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def u64b(v: Long): Array[Byte] = u32b(v >>> 32) ++ u32b(v)
  private def u16b(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    u32b(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload

  private def mvhd: Array[Byte] =
    box("mvhd", new Array[Byte](12) ++ u32b(8000) ++ u32b(5) ++
      new Array[Byte](76))
  private def pcmEntry(fourcc: String, channels: Int,
                       rate: Int): Array[Byte] =
    box(fourcc, new Array[Byte](16) ++ u16b(channels) ++ u16b(16) ++
      new Array[Byte](4) ++ u16b(rate) ++ u16b(0))
  private def stsz(constSize: Int, n: Int): Array[Byte] =
    box("stsz", u32b(0) ++ u32b(constSize) ++ u32b(n))
  private def stsc(runs: (Int, Int)*): Array[Byte] =
    box("stsc", u32b(0) ++ u32b(runs.length) ++
      runs.flatMap { case (first, spc) =>
        u32b(first) ++ u32b(spc) ++ u32b(1) }.toArray)
  private def stco(offsets: Seq[Long]): Array[Byte] =
    box("stco", u32b(0) ++ u32b(offsets.length) ++
      offsets.flatMap(u32b).toArray)
  private def co64(offsets: Seq[Long]): Array[Byte] =
    box("co64", u32b(0) ++ u32b(offsets.length) ++
      offsets.flatMap(u64b).toArray)

  /** Build a complete MP4 whose audio trak points `chunks` of PCM
    * frames (int16 values per channel) into the mdat via absolute
    * offsets; a junk gap between chunks proves offsets are honored. */
  private def pcmMp4(fourcc: String, channels: Int, rate: Int,
                     chunks: Seq[Seq[Seq[Int]]], big: Boolean,
                     useCo64: Boolean = false): Array[Byte] = {
    val frameBytes = 2 * channels
    val nSamples = chunks.map(_.length).sum
    def pcm(frames: Seq[Seq[Int]]): Array[Byte] =
      frames.flatMap(_.flatMap { v =>
        val b0 = ((v >> 8) & 0xFF).toByte; val b1 = (v & 0xFF).toByte
        if (big) Seq(b0, b1) else Seq(b1, b0)
      }).toArray
    val gap = Array.fill[Byte](7)(0x55) // junk between chunks
    val ftyp = box("ftyp", "isom".getBytes ++ new Array[Byte](8))
    def moov(offsets: Seq[Long]): Array[Byte] = {
      val runs = chunks.zipWithIndex.map { case (c, i) => (i + 1, c.length) }
      val stbl = box("stbl",
        box("stsd", new Array[Byte](8) ++ pcmEntry(fourcc, channels, rate)) ++
          stsz(frameBytes, nSamples) ++ stsc(runs: _*) ++
          (if (useCo64) co64(offsets) else stco(offsets)))
      box("moov", mvhd ++ box("trak", box("mdia",
        box("hdlr", new Array[Byte](8) ++ "soun".getBytes ++
          new Array[Byte](13)) ++
          box("minf", stbl))))
    }
    // two passes: sizes are offset-independent, so pass 1 (zeros)
    // fixes the layout and pass 2 fills real absolute offsets
    val m0 = moov(chunks.map(_ => 0L))
    val mdatStart = ftyp.length + m0.length + 8
    val offsets = chunks.scanLeft(mdatStart.toLong + gap.length) {
      case (off, c) => off + c.length * frameBytes + gap.length
    }.init
    val mdatPayload = gap ++ chunks.flatMap(c => pcm(c) ++ gap)
    ftyp ++ moov(offsets) ++ box("mdat", mdatPayload)
  }

  private val stereoFrames = Seq(
    Seq(Seq(16384, -16384), Seq(8192, 8192), Seq(-32768, 0)),
    Seq(Seq(32767, 32767), Seq(0, -8192)))

  test("sowt (LE) stereo: exact sample recovery through " +
    "stsd/stsz/stsc/stco, channel-averaged, chunk gaps honored") {
    val bytes = pcmMp4("sowt", 2, 8000, stereoFrames, big = false)
    val (rate, ch, n, mono) = Mp4Pcm.decode("video/mp4", bytes).get
    assert(rate === 8000 && ch === 2 && n === 5)
    val expect = stereoFrames.flatten
      .map(f => f.map(_ / 32768.0).sum / 2)
    assert(mono.toSeq === expect)
  }

  test("twos (BE) mono via co64: byte order and 64-bit offsets") {
    val frames = Seq(Seq(Seq(1), Seq(-1), Seq(256)), Seq(Seq(-32768)))
    val bytes = pcmMp4("twos", 1, 44100, frames, big = true,
      useCo64 = true)
    val (rate, ch, n, mono) = Mp4Pcm.decode("video/mp4", bytes).get
    assert(rate === 44100 && ch === 1 && n === 4)
    assert(mono.toSeq === Seq(1 / 32768.0, -1 / 32768.0, 256 / 32768.0,
      -1.0))
  }

  test("fail closed: compressed codec, escaping offsets, bad tables") {
    // mp4a entry: claims but cannot decode -> None (quarantine)
    val mp4a = pcmMp4("mp4a", 2, 44100, stereoFrames, big = false)
    assert(Mp4Pcm.decode("video/mp4", mp4a).isEmpty)
    // chunk offset escaping the file
    val good = pcmMp4("sowt", 2, 8000, stereoFrames, big = false)
    val truncated = good.take(good.length - 6)
    assert(Mp4Pcm.decode("video/mp4", truncated).isEmpty)
    // stsz inconsistent with the PCM frame layout
    val wrongSize = {
      val b = good.clone()
      val i = indexOfBox(b, "stsz")
      // sample_size field at payload+4
      u32b(6L).copyToArray(b, i + 8 + 4); b
    }
    assert(Mp4Pcm.decode("video/mp4", wrongSize).isEmpty)
    // not an mp4 at all
    assert(Mp4Pcm.decode("video/mp4", "junk".getBytes).isEmpty)
  }

  private def indexOfBox(b: Array[Byte], typ: String): Int = {
    val t = typ.getBytes("ISO-8859-1")
    (0 until b.length - 8).find(i =>
      b(i + 4) == t(0) && b(i + 5) == t(1) && b(i + 6) == t(2) &&
        b(i + 7) == t(3)).get
  }

  test("extractFeatures integration: PCM mp4 rows decode for real " +
    "(status=decoded, RMS features), mp4a rows quarantine") {
    import spark.implicits._
    val pcm = pcmMp4("sowt", 2, 8000, stereoFrames, big = false)
    val aac = pcmMp4("mp4a", 2, 44100, stereoFrames, big = false)
    val media = Seq(("/m/a.mp4", pcm.length.toLong, pcm),
      ("/m/b.mp4", aac.length.toLong, aac))
      .toDF("path", "length", "content")
    val out = Multimodal.extractFeatures(media, featureDim = 4,
      decoder = Some(Mp4Pcm)).collect().sortBy(_.path)
    assert(out(0).status === "decoded")
    assert(out(0).width === 8000 && out(0).height === 2 &&
      out(0).nFrames === 5)
    // features are the real RMS strips of the decoded mono signal
    val mono = Mp4Pcm.decode("video/mp4", pcm).get._4
    assert(out(0).feature.toSeq ===
      Multimodal.rmsStripFeature(mono, 4).toSeq)
    assert(out(1).status === "quarantined")
    assert(out(1).feature.forall(_.isNaN))
  }
}
