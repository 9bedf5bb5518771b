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
    if (width <= 0 || height <= 0) return None

    val ranges = Mp4Tables.sampleRanges(b, ss, se, maxSamples = 1 << 20)
      .getOrElse(return None)
    val lum = new Array[Double](ranges.length)
    var f = 0
    while (f < ranges.length) {
      val (off, sz) = ranges(f)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(b, off.toInt, sz))
      // undecodable frame or one contradicting the sample entry's
      // dimensions: the whole track fails closed
      if (img == null || img.getWidth != width || img.getHeight != height)
        return None
      lum(f) = meanLuminance(img)
      f += 1
    }
    Some((width, height, ranges.length, lum))
  }
}
