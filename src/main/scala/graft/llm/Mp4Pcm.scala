package graft.llm

import graft.llm.MediaMetadata.{boxes, findBox, fourcc, u16, u32, u64}

/** Real PCM-in-MP4 payload decoder — the reference implementation of
  * the [[Multimodal.MediaDecoder]] seam, proving a production codec
  * plugs in without touching schema, partitioning, or batch shape.
  *
  * Scope: uncompressed 16-bit PCM audio tracks in an ISO BMFF
  * container (ISO/IEC 14496-12 sample tables; QuickTime-style
  * `sowt` little-endian / `twos` big-endian sample entries, the
  * standard fourccs for raw 16-bit in MP4/MOV), with one sample = one
  * PCM frame (constant `stsz` sample size = 2 × channels — how every
  * raw-PCM muxer lays it out). The full sample-table machinery is
  * exercised for real: `stsd` entry probe, `stsc` run expansion
  * (sample-to-chunk), `stco`/`co64` chunk offsets, constant-or-table
  * `stsz` — the identical walk an ffmpeg-backed decoder performs
  * before handing bytes to a codec. Anything else (mp4a/avc1 payloads,
  * exotic layouts) returns None → the caller's quarantine row: a
  * claiming decoder must never emit fake data.
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
    val top = boxes(bytes, 0, bytes.length).toSeq
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    val (ms, me) = top.collectFirst { case ("moov", s, e) => (s, e) }
      .getOrElse(return None)
    val tracks = for {
      ("trak", ts, te) <- boxes(bytes, ms, me).toSeq
      (mds, mde) <- findBox(bytes, ts, te, "mdia")
      (hs, he) <- findBox(bytes, mds, mde, "hdlr")
      if he - hs >= 12 && fourcc(bytes, hs + 8) == "soun"
      (ns, ne) <- findBox(bytes, mds, mde, "minf")
      (ss, se) <- findBox(bytes, ns, ne, "stbl")
    } yield (ss, se)
    tracks.iterator.flatMap { case (ss, se) =>
      decodeTrack(bytes, ss, se)
    }.nextOption()
  } catch { case scala.util.control.NonFatal(_) => None }

  private def decodeTrack(b: Array[Byte], ss: Int, se: Int)
  : Option[(Int, Int, Int, Array[Double])] = {
    val (ds, de) = findBox(b, ss, se, "stsd").getOrElse(return None)
    val (cc, es, _) = boxes(b, ds + 8, de).nextOption().getOrElse(return None)
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

    // stsz: constant sample size or per-sample table
    val (zs, ze) = findBox(b, ss, se, "stsz").getOrElse(return None)
    if (ze - zs < 12) return None
    val constSize = u32(b, zs + 4)
    val nSamples = u32(b, zs + 8).toInt
    if (nSamples <= 0 || nSamples > (1 << 26)) return None
    // one sample = one PCM frame: the raw-PCM layout this decoder
    // supports; anything else is another codec's framing
    if (constSize != 0) {
      if (constSize != frameBytes) return None
    } else {
      if (ze - zs < 12 + 4L * nSamples) return None
      for (i <- 0 until nSamples)
        if (u32(b, zs + 12 + 4 * i) != frameBytes) return None
    }

    // stco / co64: chunk offsets (absolute file positions)
    val chunkOffsets: IndexedSeq[Long] =
      findBox(b, ss, se, "stco") match {
        case Some((cs, ce)) =>
          val n = u32(b, cs + 4).toInt
          if (ce - cs < 8 + 4L * n) return None
          (0 until n).map(i => u32(b, cs + 8 + 4 * i))
        case None => findBox(b, ss, se, "co64") match {
          case Some((cs, ce)) =>
            val n = u32(b, cs + 4).toInt
            if (ce - cs < 8 + 8L * n) return None
            (0 until n).map(i => u64(b, cs + 8 + 8 * i))
          case None => return None
        }
      }

    // stsc: (first_chunk, samples_per_chunk) runs → per-chunk counts
    val (scs, sce) = findBox(b, ss, se, "stsc").getOrElse(return None)
    val nRuns = u32(b, scs + 4).toInt
    if (sce - scs < 8 + 12L * nRuns || nRuns <= 0) return None
    val runs = (0 until nRuns).map { i =>
      (u32(b, scs + 8 + 12 * i).toInt, u32(b, scs + 12 + 12 * i).toInt)
    }
    if (runs.head._1 != 1) return None
    val perChunk = chunkOffsets.indices.map { ci =>
      // last run whose first_chunk (1-based) <= this chunk
      runs.takeWhile(_._1 <= ci + 1).lastOption
        .getOrElse(return None)._2
    }
    if (perChunk.map(_.toLong).sum != nSamples) return None

    // walk chunks, convert frames; any range escaping the file fails
    val mono = new Array[Double](nSamples)
    var f = 0
    for ((off0, ci) <- chunkOffsets.zipWithIndex) {
      var off = off0
      var s = 0
      while (s < perChunk(ci)) {
        if (off < 0 || off + frameBytes > b.length) return None
        var acc = 0.0
        var c = 0
        while (c < channels) {
          val idx = off.toInt + 2 * c
          val lo = if (bigEndian) b(idx + 1) else b(idx)
          val hi = if (bigEndian) b(idx) else b(idx + 1)
          acc += ((hi << 8) | (lo & 0xFF)) / 32768.0
          c += 1
        }
        mono(f) = acc / channels
        f += 1
        s += 1
        off += frameBytes
      }
    }
    Some((rate, channels, nSamples, mono))
  }
}
