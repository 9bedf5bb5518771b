package graft.llm

import graft.llm.MediaMetadata.{u16, u32}

/** Real PCM-in-MP4 payload decoder — a reference implementation of
  * the [[Multimodal.MediaDecoder]] seam, proving a production codec
  * plugs in without touching schema, partitioning, or batch shape.
  *
  * Scope: uncompressed 16-bit PCM audio tracks in an ISO BMFF
  * container (QuickTime-style `sowt` little-endian / `twos`
  * big-endian sample entries, the standard fourccs for raw 16-bit in
  * MP4/MOV), with one sample = one PCM frame (constant `stsz` sample
  * size = 2 × channels — how every raw-PCM muxer lays it out). The
  * full sample-table machinery is exercised for real via the shared
  * [[Mp4Tables]] walk (stsd entry probe, stsc run expansion,
  * stco/co64 offsets, constant-or-table stsz) — the identical walk an
  * ffmpeg-backed decoder performs before handing bytes to a codec.
  * Anything else (mp4a/avc1 payloads, exotic layouts) returns None →
  * the caller's quarantine row: a claiming decoder must never emit
  * fake data.
  *
  * Everything fails closed: a malformed box, a sample range escaping
  * the file, or an inconsistent table yields None, exactly like
  * [[MediaMetadata.mp4Metadata]]'s whole-parse quarantine. */
object Mp4Pcm extends Multimodal.MediaDecoder {

  override def claims(mediaType: String): Boolean =
    mediaType == "video/mp4" || mediaType == "audio/mp4"

  /** (sampleRate, channels, nFrames, mono samples in [-1, 1]) for the
    * FIRST PCM audio track, or None (quarantine). */
  override def decode(mediaType: String, bytes: Array[Byte])
  : Option[(Int, Int, Int, Array[Double])] = try {
    Mp4Tables.trackTables(bytes, "soun").iterator
      .flatMap { case (ss, se) => decodeTrack(bytes, ss, se) }
      .nextOption()
  } catch { case scala.util.control.NonFatal(_) => None }

  private def decodeTrack(b: Array[Byte], ss: Int, se: Int)
  : Option[(Int, Int, Int, Array[Double])] = {
    val (cc, es, de) = Mp4Tables.sampleEntry(b, ss, se)
      .getOrElse(return None)
    val bigEndian = cc match {
      case "sowt" => false // QT: 16-bit little-endian PCM
      case "twos" => true  // QT: 16-bit big-endian PCM
      case _ => return None // compressed / unsupported codec
    }
    if (es + 28 > de) return None
    val channels = u16(b, es + 16)
    val sampleBits = u16(b, es + 18)
    val rate = (u32(b, es + 24) >>> 16).toInt
    if (channels < 1 || channels > 8 || sampleBits != 16 || rate <= 0)
      return None
    val frameBytes = 2 * channels

    // one sample = one PCM frame: the raw-PCM layout this decoder
    // supports; anything else is another codec's framing. O(1)
    // reject for constant-size stsz; per-sample sizes abort the walk
    // on the first mismatch.
    val cs = Mp4Tables.constantSize(b, ss, se)
    if (cs < 0 || (cs != 0 && cs != frameBytes)) return None
    val nSamples = Mp4Tables.sampleCount(b, ss, se)
    if (nSamples < 0) return None

    val mono = new Array[Double](nSamples)
    val walked = Mp4Tables.walkSamples(b, ss, se) { (s, off0, sz) =>
      if (sz != frameBytes) false
      else {
        val off = off0.toInt
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val idx = off + 2 * c
          val lo = if (bigEndian) b(idx + 1) else b(idx)
          val hi = if (bigEndian) b(idx) else b(idx + 1)
          acc += ((hi << 8) | (lo & 0xFF)) / 32768.0
          c += 1
        }
        mono(s) = acc / channels
        true
      }
    }
    if (walked != nSamples) return None
    Some((rate, channels, nSamples, mono))
  }
}
