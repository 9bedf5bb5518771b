package graft

import graft.llm.{Mp4Jpeg, Mp4Pcm, Multimodal}

/** Pins [[Mp4Jpeg]] — the real Motion-JPEG-in-MP4 VIDEO decoder
  * behind the [[Multimodal.MediaDecoder]] seam: per-frame ImageIO
  * decode through the shared sample-table walk with genuinely
  * variable stsz sizes, fail-closed quarantine for inter-frame
  * codecs / corrupt frames / contradicting dimensions, and the
  * composed `MediaDecoder.firstOf(Mp4Pcm, Mp4Jpeg)` integration. */
class Mp4JpegSpec extends SparkSuite {

  private def u32b(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def u16b(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    u32b(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload

  /** A real JPEG bitstream via the JDK encoder: a w×h frame filled
    * with `rgb`, except a contrasting top-left quad so frames carry
    * structure (and compress to DIFFERENT sizes). */
  private def jpegFrame(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        if (x < w / 2 && y < h / 2) ~rgb & 0xFFFFFF else rgb)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    bos.toByteArray
  }

  /** Build a complete MP4 whose video trak points `chunks` of JPEG
    * samples into the mdat via absolute offsets (variable stsz table;
    * junk gaps between chunks prove offsets are honored). */
  private def mjpegMp4(fourcc: String, w: Int, h: Int,
                       chunks: Seq[Seq[Array[Byte]]]): Array[Byte] = {
    val samples = chunks.flatten
    val gap = Array.fill[Byte](5)(0x77)
    val ftyp = box("ftyp", "isom".getBytes ++ new Array[Byte](8))
    val mvhd = box("mvhd", new Array[Byte](12) ++ u32b(600) ++
      u32b(samples.length) ++ new Array[Byte](76))
    def moov(offsets: Seq[Long]): Array[Byte] = {
      // VisualSampleEntry: 8 SampleEntry + 16 pre_defined/reserved,
      // width@24 height@26, then resolutions/frame_count/name/depth
      val entry = box(fourcc, new Array[Byte](24) ++ u16b(w) ++
        u16b(h) ++ new Array[Byte](50))
      val stsz = box("stsz", u32b(0) ++ u32b(0) ++
        u32b(samples.length) ++ samples.flatMap(s => u32b(s.length)))
      val runs = chunks.zipWithIndex.map { case (c, i) => (i + 1, c.length) }
      val stsc = box("stsc", u32b(0) ++ u32b(runs.length) ++
        runs.flatMap { case (first, spc) =>
          u32b(first) ++ u32b(spc) ++ u32b(1) }.toArray)
      val stco = box("stco", u32b(0) ++ u32b(offsets.length) ++
        offsets.flatMap(u32b).toArray)
      val stbl = box("stbl",
        box("stsd", new Array[Byte](8) ++ entry) ++ stsz ++ stsc ++ stco)
      box("moov", mvhd ++ box("trak", box("mdia",
        box("hdlr", new Array[Byte](8) ++ "vide".getBytes ++
          new Array[Byte](13)) ++
          box("minf", stbl))))
    }
    val m0 = moov(chunks.map(_ => 0L))
    val mdatStart = ftyp.length + m0.length + 8
    val offsets = chunks.scanLeft(mdatStart.toLong + gap.length) {
      case (off, c) => off + c.map(_.length).sum + gap.length
    }.init
    val mdatPayload = gap ++ chunks.flatMap(c => c.flatten ++ gap)
    ftyp ++ moov(offsets) ++ box("mdat", mdatPayload)
  }

  private val W = 16; private val H = 12
  private val frames = Seq(0x000000, 0xFFFFFF, 0x808080, 0xFF0000,
    0x00FF00).map(jpegFrame(W, H, _))
  private val chunked = Seq(frames.take(3), frames.drop(3))

  test("jpeg track: every frame ImageIO-decoded through the variable-" +
    "size sample table; per-frame mean luminance recovered exactly") {
    val bytes = mjpegMp4("jpeg", W, H, chunked)
    val (w, h, n, lum) = Mp4Jpeg.decode("video/mp4", bytes).get
    assert(w === W && h === H && n === 5)
    // the expectation decodes the SAME jpeg bytes independently
    val expect = frames.map(fb => Mp4Jpeg.meanLuminance(
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))))
    assert(lum.toSeq === expect)
    // luminance envelope orders dark < grey < white frame
    assert(lum(0) < lum(2) && lum(2) < lum(1))
  }

  test("fail closed: inter-frame codec, corrupt frame, contradicting " +
    "dimensions, truncation, non-mp4") {
    // avc1: claiming type, undecodable without a real H.264 codec
    assert(Mp4Jpeg.decode("video/mp4",
      mjpegMp4("avc1", W, H, chunked)).isEmpty)
    // first sample bytes stomped: ImageIO rejects, whole track closed
    val good = mjpegMp4("jpeg", W, H, chunked)
    val corrupt = good.clone()
    val at = indexOfBytes(good, frames.head)
    java.util.Arrays.fill(corrupt, at, at + frames.head.length, 0x11.toByte)
    assert(Mp4Jpeg.decode("video/mp4", corrupt).isEmpty)
    // sample entry lies about dimensions -> None, never fake metadata
    assert(Mp4Jpeg.decode("video/mp4",
      mjpegMp4("jpeg", W + 2, H, chunked)).isEmpty)
    // chunk range escaping the file
    assert(Mp4Jpeg.decode("video/mp4", good.take(good.length - 9)).isEmpty)
    assert(Mp4Jpeg.decode("video/mp4", "junk".getBytes).isEmpty)
    // lying stsz sample count far beyond the file length: rejected
    // before anything proportional to it is allocated (bomb defense)
    val bomb = good.clone()
    val zi = indexOfBytes(good, "stsz".getBytes("ISO-8859-1"))
    u32b(1 << 25).copyToArray(bomb, zi + 12) // payload+8 = sample_count
    assert(Mp4Jpeg.decode("video/mp4", bomb).isEmpty)
    // entry declaring a multi-GB raster (u16 dims are attacker
    // controlled): the pixel cap rejects before any decode
    assert(Mp4Jpeg.decode("video/mp4",
      mjpegMp4("jpeg", 60000, 60000, chunked)).isEmpty)
    // frame whose SOF contradicts the entry: the header-only probe
    // rejects BEFORE the raster is allocated
    val sofLie = good.clone()
    val sof = (0 until good.length - 1).find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xC0).get
    sofLie(sof + 5) = 0x7F.toByte // height high byte: 12 -> 32524
    assert(Mp4Jpeg.decode("video/mp4", sofLie).isEmpty)
  }

  private def indexOfBytes(hay: Array[Byte], needle: Array[Byte]): Int =
    (0 to hay.length - needle.length).find(i =>
      needle.indices.forall(j => hay(i + j) == needle(j))).get

  test("extractFeatures with firstOf(Mp4Pcm, Mp4Jpeg): audio mp4 " +
    "decodes as PCM, video mp4 as MJPEG frames, mp4a quarantines") {
    import spark.implicits._
    // PCM fixture (same layout Mp4PcmSpec pins)
    def pcmMp4: Array[Byte] = {
      val frames = Seq(Seq(16384, -16384), Seq(8192, 8192))
      val pcm = frames.flatMap(_.flatMap(v =>
        Seq((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte))).toArray
      val entry = box("sowt", new Array[Byte](16) ++ u16b(2) ++
        u16b(16) ++ new Array[Byte](4) ++ u16b(8000) ++ u16b(0))
      def moov(off: Long): Array[Byte] = box("moov",
        box("mvhd", new Array[Byte](12) ++ u32b(8000) ++ u32b(2) ++
          new Array[Byte](76)) ++
          box("trak", box("mdia",
            box("hdlr", new Array[Byte](8) ++ "soun".getBytes ++
              new Array[Byte](13)) ++
              box("minf", box("stbl",
                box("stsd", new Array[Byte](8) ++ entry) ++
                  box("stsz", u32b(0) ++ u32b(4) ++ u32b(2)) ++
                  box("stsc", u32b(0) ++ u32b(1) ++ u32b(1) ++
                    u32b(2) ++ u32b(1)) ++
                  box("stco", u32b(0) ++ u32b(1) ++ u32b(off)))))))
      val ftyp = box("ftyp", "isom".getBytes ++ new Array[Byte](8))
      val m0 = moov(0L)
      ftyp ++ moov(ftyp.length + m0.length + 8L) ++ box("mdat", pcm)
    }
    val video = mjpegMp4("jpeg", W, H, chunked)
    val aac = mjpegMp4("avc1", W, H, chunked)
    val media = Seq(("/m/audio.mp4", pcmMp4), ("/m/clip.mp4", video),
      ("/m/enc.mp4", aac))
      .map { case (p, b) => (p, b.length.toLong, b) }
      .toDF("path", "length", "content")
    val dec = Multimodal.MediaDecoder.firstOf(Mp4Pcm, Mp4Jpeg)
    val out = Multimodal.extractFeatures(media, featureDim = 4,
      decoder = Some(dec)).collect().sortBy(_.path)
    val audio = out(0); val clip = out(1); val enc = out(2)
    assert(audio.status === "decoded" && audio.width === 8000 &&
      audio.height === 2 && audio.nFrames === 2)
    assert(clip.status === "decoded" && clip.width === W &&
      clip.height === H && clip.nFrames === 5)
    val lum = Mp4Jpeg.decode("video/mp4", video).get._4
    assert(clip.feature.toSeq ===
      Multimodal.rmsStripFeature(lum, 4).toSeq)
    assert(enc.status === "quarantined" && enc.feature.forall(_.isNaN))
  }
}
