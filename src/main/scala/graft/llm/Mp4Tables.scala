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
  * The walk is STREAMING: allocation is O(#chunks + #stsc runs),
  * never proportional to the sample count — a 16M-sample PCM track
  * or a hostile header claiming 2^26 samples costs no transient
  * per-sample garbage. Everything fails closed: a malformed box, an
  * inconsistent table (stsc runs not covering the chunks, size sum
  * mismatch), or a sample range escaping the file yields the error
  * sentinel — callers quarantine, never fabricate. */
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

  /** Declared sample count of a stbl's stsz, sanity-bounded (callers
    * size output buffers from it BEFORE walking); -1 when malformed.
    * Every sample occupies >= 1 byte of the file, so a count beyond
    * the file length is a lying header — rejected before anything
    * proportional to it is allocated (bomb defense). */
  def sampleCount(b: Array[Byte], ss: Int, se: Int,
                  maxSamples: Int = 1 << 26): Int = {
    val (zs, ze) = findBox(b, ss, se, "stsz").getOrElse(return -1)
    if (ze - zs < 12) return -1
    val n = u32(b, zs + 8).toInt
    if (n <= 0 || n > maxSamples || n > b.length) return -1
    n
  }

  /** Constant sample size declared by stsz (0 = per-sample table;
    * -1 = malformed). O(1) — lets a fixed-frame decoder reject a
    * wrong layout without touching the table. */
  def constantSize(b: Array[Byte], ss: Int, se: Int): Long = {
    val (zs, ze) = findBox(b, ss, se, "stsz").getOrElse(return -1L)
    if (ze - zs < 12) return -1L
    u32(b, zs + 4)
  }

  /** Stream every sample of a stbl in sample order:
    * `f(sampleIndex, fileOffset, byteSize)`, with `f` returning false
    * to abort. The FULL table shape is validated in a no-emit first
    * pass (stsz/stsc/stco presence and bounds, run coverage, count
    * consistency, every sample range inside the file) before the
    * first callback, so `f` never sees a sample from a table that
    * later turns out inconsistent. Returns the sample count on a
    * complete walk, -1 for a malformed/inconsistent/file-escaping
    * table OR a caller abort — both fail closed. */
  def walkSamples(b: Array[Byte], ss: Int, se: Int,
                  maxSamples: Int = 1 << 26)
                 (f: (Int, Long, Int) => Boolean): Int = {
    val nSamples = sampleCount(b, ss, se, maxSamples)
    if (nSamples < 0) return -1
    val (zs, ze) = findBox(b, ss, se, "stsz").getOrElse(return -1)
    val constSize = u32(b, zs + 4)
    if (constSize > Int.MaxValue) return -1
    if (constSize == 0 && ze - zs < 12 + 4L * nSamples) return -1

    // stco / co64: chunk offsets (absolute file positions)
    val chunkOffsets: IndexedSeq[Long] =
      findBox(b, ss, se, "stco") match {
        case Some((cs, ce)) =>
          val n = u32(b, cs + 4).toInt
          if (ce - cs < 8 + 4L * n) return -1
          (0 until n).map(i => u32(b, cs + 8 + 4 * i))
        case None => findBox(b, ss, se, "co64") match {
          case Some((cs, ce)) =>
            val n = u32(b, cs + 4).toInt
            if (ce - cs < 8 + 8L * n) return -1
            (0 until n).map(i => u64(b, cs + 8 + 8 * i))
          case None => return -1
        }
      }

    // stsc: (first_chunk, samples_per_chunk) runs → per-chunk counts
    val (scs, sce) = findBox(b, ss, se, "stsc").getOrElse(return -1)
    val nRuns = u32(b, scs + 4).toInt
    if (sce - scs < 8 + 12L * nRuns || nRuns <= 0) return -1
    val runs = (0 until nRuns).map { i =>
      (u32(b, scs + 8 + 12 * i).toInt, u32(b, scs + 12 + 12 * i).toInt)
    }
    if (runs.head._1 != 1) return -1
    val perChunk = chunkOffsets.indices.map { ci =>
      // last run whose first_chunk (1-based) <= this chunk
      runs.takeWhile(_._1 <= ci + 1).lastOption
        .getOrElse(return -1)._2
    }
    if (perChunk.exists(_ < 0)) return -1
    if (perChunk.map(_.toLong).sum != nSamples) return -1

    // pass 0 validates every range without emitting; pass 1 emits
    var pass = 0
    while (pass < 2) {
      var s = 0
      var ci = 0
      while (ci < chunkOffsets.length) {
        var off = chunkOffsets(ci)
        var i = 0
        while (i < perChunk(ci)) {
          val sz0 =
            if (constSize != 0) constSize
            else u32(b, zs + 12 + 4 * s)
          if (sz0 <= 0 || sz0 > Int.MaxValue) return -1
          val sz = sz0.toInt
          if (off < 0 || off + sz > b.length) return -1
          if (pass == 1 && !f(s, off, sz)) return -1
          off += sz
          s += 1
          i += 1
        }
        ci += 1
      }
      pass += 1
    }
    nSamples
  }
}
