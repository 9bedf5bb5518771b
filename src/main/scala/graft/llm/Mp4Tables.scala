package graft.llm

import graft.llm.MediaMetadata.{boxes, findBox, fourcc, u32, u64}

/** Shared ISO BMFF sample-table walk (ISO/IEC 14496-12 §8.5-8.7):
  * resolves the absolute byte range of every sample in a track from
  * its `stbl` — constant-or-table `stsz` sizes, `stsc` run expansion
  * (sample-to-chunk), `stco`/`co64` absolute chunk offsets. This is
  * the identical table walk ANY container demuxer performs before
  * handing sample bytes to a codec; [[Mp4Pcm]] (raw PCM audio) and
  * [[Mp4Jpeg]] (Motion-JPEG video) both consume it, and an
  * ffmpeg-backed production decoder would swap in codec-only.
  *
  * Everything fails closed: a malformed box, an inconsistent table
  * (stsc runs not covering the chunks, size sum mismatch), or a
  * sample range escaping the file yields None — callers quarantine,
  * never fabricate. */
object Mp4Tables {

  /** `stbl` ranges of every track whose `hdlr` handler type matches,
    * in file order (a decoder probes each and takes the first it can
    * decode). Throws on malformed boxes — callers wrap in their
    * whole-parse try. */
  def trackTables(b: Array[Byte], handler: String): Seq[(Int, Int)] = {
    val top = boxes(b, 0, b.length).toSeq
    if (!top.headOption.exists(_._1 == "ftyp")) return Nil
    val (ms, me) = top.collectFirst { case ("moov", s, e) => (s, e) }
      .getOrElse(return Nil)
    for {
      ("trak", ts, te) <- boxes(b, ms, me).toSeq
      (mds, mde) <- findBox(b, ts, te, "mdia")
      (hs, he) <- findBox(b, mds, mde, "hdlr")
      if he - hs >= 12 && fourcc(b, hs + 8) == handler
      (ns, ne) <- findBox(b, mds, mde, "minf")
      (ss, se) <- findBox(b, ns, ne, "stbl")
    } yield (ss, se)
  }

  /** First `stsd` sample entry of a stbl: (fourcc, payloadStart,
    * payloadEnd). */
  def sampleEntry(b: Array[Byte], ss: Int, se: Int)
  : Option[(String, Int, Int)] = {
    val (ds, de) = findBox(b, ss, se, "stsd").getOrElse(return None)
    boxes(b, ds + 8, de).nextOption()
  }

  /** Absolute (fileOffset, byteSize) of every sample of a stbl, in
    * sample order — the full stsz/stsc/stco(co64) resolution. None
    * for any inconsistent or file-escaping layout. `maxSamples`
    * bounds allocation against a hostile header (bomb defense). */
  def sampleRanges(b: Array[Byte], ss: Int, se: Int,
                   maxSamples: Int = 1 << 26)
  : Option[IndexedSeq[(Long, Int)]] = {
    // stsz: constant sample size or per-sample table
    val (zs, ze) = findBox(b, ss, se, "stsz").getOrElse(return None)
    if (ze - zs < 12) return None
    val constSize = u32(b, zs + 4)
    val nSamples = u32(b, zs + 8).toInt
    // every sample occupies >= 1 byte of the file, so a sample count
    // beyond the file length is a lying header — reject BEFORE
    // allocating anything proportional to it (bomb defense)
    if (nSamples <= 0 || nSamples > maxSamples || nSamples > b.length)
      return None
    if (constSize > Int.MaxValue) return None
    val sizes: IndexedSeq[Int] =
      if (constSize != 0) IndexedSeq.fill(nSamples)(constSize.toInt)
      else {
        if (ze - zs < 12 + 4L * nSamples) return None
        (0 until nSamples).map { i =>
          val s = u32(b, zs + 12 + 4 * i)
          if (s <= 0 || s > Int.MaxValue) return None
          s.toInt
        }
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

    // expand: offsets accumulate within a chunk by each sample's size
    val out = IndexedSeq.newBuilder[(Long, Int)]
    var s = 0
    for ((off0, ci) <- chunkOffsets.zipWithIndex) {
      var off = off0
      var i = 0
      while (i < perChunk(ci)) {
        val sz = sizes(s)
        if (off < 0 || off + sz > b.length) return None
        out += ((off, sz))
        off += sz
        s += 1
        i += 1
      }
    }
    Some(out.result())
  }
}
