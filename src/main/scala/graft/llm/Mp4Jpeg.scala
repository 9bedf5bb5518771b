package graft.llm

import graft.llm.MediaMetadata.u16

/** Real Motion-JPEG-in-MP4 VIDEO payload decoder — the second
  * reference implementation of the [[Multimodal.MediaDecoder]] seam,
  * extending the proven [[Mp4Pcm]] audio path to actual video frames
  * with a codec that ships in the JDK (`javax.imageio`'s JPEG
  * reader).
  *
  * Scope: video tracks whose sample entry is `jpeg` (QuickTime
  * Photo-JPEG) or `mjpa` (Motion-JPEG A) — in both, every sample is a
  * self-contained JPEG bitstream, so the decode is exactly the shared
  * [[Mp4Tables]] sample-table walk (here with genuinely VARIABLE
  * per-sample `stsz` sizes — JPEG frames never compress equally)
  * followed by a per-frame ImageIO decode. Compressed inter-frame
  * codecs (avc1/hev1) return None → quarantine.
  *
  * Output shape (the seam's (w, h, frames, signal) contract): width,
  * height from the visual sample entry — verified against every
  * decoded frame — frame count, and the per-frame MEAN LUMINANCE in
  * [0, 1] (BT.601 integer-summed, fully deterministic) as the signal
  * array: the temporal brightness envelope, the video analog of the
  * audio path's mono samples, which downstream
  * [[Multimodal.rmsStripFeature]] turns into a fixed-width temporal
  * feature. Fails closed on any malformed table, undecodable frame,
  * or frame whose dimensions contradict the sample entry — a claiming
  * decoder must never emit fake data. */
object Mp4Jpeg extends Multimodal.MediaDecoder {

  private val JpegFourccs = Set("jpeg", "mjpa")

  override def claims(mediaType: String): Boolean =
    mediaType == "video/mp4"

  /** (width, height, nFrames, per-frame mean luminance in [0, 1]) for
    * the FIRST Motion-JPEG video track, or None (quarantine). */
  override def decode(mediaType: String, bytes: Array[Byte])
  : Option[(Int, Int, Int, Array[Double])] = try {
    Mp4Tables.trackTables(bytes, "vide").iterator
      .flatMap { case (ss, se) => decodeTrack(bytes, ss, se) }
      .nextOption()
  } catch { case scala.util.control.NonFatal(_) => None }

  /** Mean luminance of a frame in [0, 1]: BT.601 milli-luminance
    * summed in integers, divided once — deterministic across JVMs. */
  def meanLuminance(img: java.awt.image.BufferedImage): Double = {
    val w = img.getWidth; val h = img.getHeight
    var sum = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16) & 0xFF) * 299L + ((rgb >> 8) & 0xFF) * 587L +
          (rgb & 0xFF) * 114L
        x += 1
      }
      y += 1
    }
    sum / (255000.0 * w * h)
  }

  /** Decode one JPEG sample with the sample-entry dimensions
    * enforced BEFORE the raster is allocated: the reader's
    * header-only getWidth/getHeight probe rejects a frame whose SOF
    * contradicts the entry, so a hostile bitstream declaring
    * 65500×65500 never allocates its multi-GB raster (the entry dims
    * themselves are capped by the caller). The explicit
    * MemoryCacheImageInputStream keeps ImageIO off its default
    * DISK-backed stream cache — one temp-file create/delete per
    * frame on the hot path, for bytes already in memory. */
  private def decodeFrame(b: Array[Byte], off: Int, sz: Int,
                          w: Int, h: Int)
  : Option[java.awt.image.BufferedImage] = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(b, off, sz))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        if (reader.getWidth(0) != w || reader.getHeight(0) != h) None
        else Option(reader.read(0))
      } finally reader.dispose()
    } finally iis.close()
  }

  private def decodeTrack(b: Array[Byte], ss: Int, se: Int)
  : Option[(Int, Int, Int, Array[Double])] = {
    val (cc, es, de) = Mp4Tables.sampleEntry(b, ss, se)
      .getOrElse(return None)
    if (!JpegFourccs.contains(cc)) return None // inter-frame codec
    // VisualSampleEntry: 8 (SampleEntry) + 16 (pre_defined/reserved),
    // width@24, height@26
    if (es + 28 > de) return None
    val width = u16(b, es + 24)
    val height = u16(b, es + 26)
    // entry dims are attacker-controlled u16s (up to 65535×65535 ≈
    // 17 GB of raster): cap total pixels at 2^25 (~33 MP, beyond 8K
    // video) so a lying entry can never OOM the executor
    if (width <= 0 || height <= 0 ||
      width.toLong * height > (1L << 25)) return None

    val nFrames = Mp4Tables.sampleCount(b, ss, se, maxSamples = 1 << 20)
    if (nFrames < 0) return None
    val lum = new Array[Double](nFrames)
    val walked = Mp4Tables.walkSamples(b, ss, se, maxSamples = 1 << 20) {
      (s, off, sz) =>
        // undecodable frame or one contradicting the sample entry's
        // dimensions: the whole track fails closed
        decodeFrame(b, off.toInt, sz, width, height) match {
          case Some(img) => lum(s) = meanLuminance(img); true
          case None => false
        }
    }
    if (walked != nFrames) return None
    Some((width, height, nFrames, lum))
  }
}
