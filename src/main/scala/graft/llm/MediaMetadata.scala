package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Metadata-only extraction for compressed audio/video — the
  * raster-scan fallback pattern (read the headers, skip the payload;
  * cf. `/root/reference/lambdas/build-stac/utils/stac.py:88-93`, which
  * falls back to filename-derived metadata when a full raster read is
  * impossible) applied to A/V: the JDK ships no mp3/mp4 codecs, so
  * DECODE stays behind the [[Multimodal.MediaDecoder]] seam, but
  * duration / codec / sample rate / channels / dimensions live in the
  * container HEADERS, which are public-spec byte layouts:
  *
  *  - MP3 (MPEG-1/2/2.5 audio): 4-byte frame headers carry version,
  *    layer, bitrate index, sample-rate index, channel mode; frame
  *    length is arithmetic on those, so walking header→header yields
  *    exact frame count and duration without touching a single
  *    payload byte. ID3v2 prefix tags (syncsafe size) and ID3v1
  *    trailers are skipped. VBR is handled by per-frame duration
  *    summation.
  *  - MP4 (ISO base media file format): length-prefixed box tree;
  *    `mvhd` carries movie timescale+duration, each `trak`'s `hdlr`
  *    names the handler (vide/soun) and its `stsd` entry the codec
  *    fourcc plus width/height (video) or channels/sample-rate
  *    (audio).
  *
  * Fail-closed: malformed headers return None (quarantine) — never a
  * guessed row. Pure per-row work, no shuffle: one scan extracts
  * metadata from 100 TB of media. */
object MediaMetadata {

  /** One A/V container's header metadata. Audio-only rows carry
    * width=height=0; duration is in milliseconds. */
  case class AvMetadata(container: String, codec: String,
                        sampleRate: Int, channels: Int,
                        width: Int, height: Int,
                        durationMs: Long, nFrames: Long,
                        bitrateKbps: Int)

  // ---------------------------------------------------------------
  // MP3: MPEG audio frame-header walk
  // ---------------------------------------------------------------

  // bitrate tables in kbps, indexed [versionGroup][layer][idx]:
  // versionGroup 0 = MPEG1, 1 = MPEG2/2.5; layer 1/2/3
  private val BitrateKbps: Array[Array[Array[Int]]] = Array(
    Array(
      Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)),
    Array(
      Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)))

  private val SampleRates: Map[Int, Array[Int]] = Map(
    3 -> Array(44100, 48000, 32000), // MPEG1
    2 -> Array(22050, 24000, 16000), // MPEG2
    0 -> Array(11025, 12000, 8000))  // MPEG2.5

  /** Parsed MP3 frame header: (frameBytes, samplesPerFrame,
    * sampleRate, channels, bitrateKbps), or None when the 4 bytes are
    * not a valid header. Free-format (bitrate index 0) is rejected —
    * its frame length is not derivable from the header. */
  private def mp3FrameHeader(b: Array[Byte], off: Int)
  : Option[(Int, Int, Int, Int, Int)] = {
    if (off + 4 > b.length) return None
    if ((b(off) & 0xFF) != 0xFF || (b(off + 1) & 0xE0) != 0xE0) return None
    val version = (b(off + 1) >> 3) & 3   // 0=2.5, 2=2, 3=1 (1 reserved)
    val layerBits = (b(off + 1) >> 1) & 3 // 3=I, 2=II, 1=III (0 reserved)
    if (version == 1 || layerBits == 0) return None
    val layer = 4 - layerBits             // 1, 2, 3
    val brIdx = (b(off + 2) >> 4) & 0xF
    val srIdx = (b(off + 2) >> 2) & 3
    if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None
    val padding = (b(off + 2) >> 1) & 1
    val channels = if (((b(off + 3) >> 6) & 3) == 3) 1 else 2
    val vGroup = if (version == 3) 0 else 1
    val kbps = BitrateKbps(vGroup)(layer - 1)(brIdx)
    val rate = SampleRates(version)(srIdx)
    val (samples, frameBytes) = layer match {
      case 1 => (384, (12 * kbps * 1000 / rate + padding) * 4)
      case 2 => (1152, 144 * kbps * 1000 / rate + padding)
      case _ => // layer III: 576 samples/frame for MPEG2/2.5
        if (version == 3) (1152, 144 * kbps * 1000 / rate + padding)
        else (576, 72 * kbps * 1000 / rate + padding)
    }
    if (frameBytes <= 4) None
    else Some((frameBytes, samples, rate, channels, kbps))
  }

  /** Header-walk MP3 metadata: skips a leading ID3v2 tag (and any
    * padding / v2.4 footer after it — the first CHAINED frame header
    * is searched within 64 KiB of the tag end), requires at least 2
    * CONSECUTIVE valid frames (a lone sync word appears in random
    * bytes ~1/2^11 per offset — two chained frames make a false
    * positive negligible), walks header to header summing exact
    * per-frame durations (so VBR is exact), and tolerates a trailing
    * 128-byte ID3v1 tag. A leading Xing/Info VBR header frame
    * (the tag at the fixed post-side-info offset) is framing, not
    * audio — skipped from frame/duration/bitrate accounting; a final
    * frame whose payload runs past EOF (truncation) is not counted.
    * A malformed stream (fewer than 2 frames)
    * returns None; so does any out-of-bounds structure (the whole
    * parse fails closed — a corrupt file must never fail the task). */
  def mp3Metadata(bytes: Array[Byte]): Option[AvMetadata] = try {
    var off = 0
    // ID3v2: "ID3" + ver(2) + flags(1) + syncsafe size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
        bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      off = 10 + size
    }
    if (off >= bytes.length) return None
    // scan forward (bounded) for the first frame header that CHAINS —
    // real files pad between tag and audio; an ID3v2.4 footer is just
    // more non-frame bytes to the scan
    val scanEnd = math.min(bytes.length, off + 65536)
    var found = -1
    var s = off
    while (found < 0 && s < scanEnd) {
      mp3FrameHeader(bytes, s) match {
        case Some((fb, _, _, _, _))
          if s + fb >= bytes.length || mp3FrameHeader(bytes, s + fb).isDefined =>
          found = s
        case _ => s += 1
      }
    }
    if (found < 0) return None
    off = found
    var frames = 0L
    var durationUs = 0.0
    var rate = 0
    var channels = 0
    var kbpsSum = 0L
    var walking = true
    var first = true
    while (walking) {
      mp3FrameHeader(bytes, off) match {
        case Some((fb, samples, r, ch, kbps)) =>
          if (off + fb > bytes.length) {
            // final frame's payload runs past EOF (truncated file):
            // chain-walk stops WITHOUT counting it — a partial frame
            // decodes no audio, counting it overstates duration
            walking = false
          } else {
            // a Xing/Info VBR header frame is framing, not audio: it
            // sits first in the stream with the tag right after the
            // side info (whose size is fixed by version/channels) —
            // skip it from the duration/frame counts but keep walking
            val ver = (bytes(off + 1) >> 3) & 3 // 3=MPEG1, 2=MPEG2, 0=2.5
            val side = (ver, ch) match {
              case (3, 2) => 32 // MPEG1 stereo
              case (3, 1) => 17 // MPEG1 mono
              case (_, 2) => 17 // MPEG2/2.5 stereo
              case _ => 9      // MPEG2/2.5 mono
            }
            val tagAt = off + 4 + side
            // the tag must sit INSIDE this frame: a minimal-size frame
            // (e.g. 8 kbps MPEG2.5 stereo, fb=24 < 4+17+4) ends before
            // the probe offset, and reading past it could hit a
            // coincidental 'Xing' in the NEXT frame's bytes and drop a
            // real audio frame from the duration math
            val isVbrHeader = first && tagAt + 4 <= off + fb &&
              tagAt + 4 <= bytes.length && {
              val t = new String(bytes, tagAt, 4,
                java.nio.charset.StandardCharsets.ISO_8859_1)
              t == "Xing" || t == "Info"
            }
            if (!isVbrHeader) {
              frames += 1
              durationUs += samples * 1e6 / r
              rate = r; channels = ch; kbpsSum += kbps
            }
            first = false
            off += fb
          }
        case None =>
          walking = false
      }
      if (off >= bytes.length) walking = false
    }
    if (frames < 2) None
    else Some(AvMetadata("mp3", "mp3", rate, channels, 0, 0,
      math.round(durationUs / 1000.0), frames,
      (kbpsSum / frames).toInt))
  } catch { case _: Exception => None } // malformed → quarantine

  // ---------------------------------------------------------------
  // MP4: ISO BMFF box walk
  // ---------------------------------------------------------------

  private[llm] def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
      ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
  private[llm] def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)
  private[llm] def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 8) | (b(off + 1) & 0xFF)
  private[llm] def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, java.nio.charset.StandardCharsets.ISO_8859_1)

  /** Box iterator over [start, end): (type, payloadStart, payloadEnd).
    * A size that runs past the range or is smaller than the header
    * THROWS — at any nesting level — and the top-level try in
    * [[mp4Metadata]] turns it into None (quarantine): a malformed box
    * must fail the whole parse closed, never yield a partial row. */
  private[llm] def boxes(b: Array[Byte], start: Int, end: Int)
  : Iterator[(String, Int, Int)] = new Iterator[(String, Int, Int)] {
    private var off = start
    def hasNext: Boolean = off + 8 <= end
    def next(): (String, Int, Int) = {
      val size0 = u32(b, off)
      val typ = fourcc(b, off + 4)
      val (size, hdr) =
        if (size0 == 1 && off + 16 <= end) (u64(b, off + 8), 16)
        else if (size0 == 0) ((end - off).toLong, 8)
        else (size0, 8)
      require(size >= hdr && off + size <= end,
        s"box '$typ' size $size escapes [$start, $end)")
      val r = (typ, off + hdr, off + size.toInt)
      off += size.toInt
      r
    }
  }

  private[llm] def findBox(b: Array[Byte], start: Int, end: Int,
                      typ: String): Option[(Int, Int)] =
    boxes(b, start, end).collectFirst { case (t, s, e) if t == typ => (s, e) }

  /** Box-walk MP4 metadata: requires `ftyp` first (the container
    * signature) and a `moov/mvhd` for duration; per-trak `hdlr` +
    * `stbl/stsd` provide the codec fourcc, video width/height and
    * audio channels/sample-rate. Any box whose declared size escapes
    * its parent — at any depth — or any field read past a box's
    * payload fails the WHOLE parse closed (None → quarantine). */
  def mp4Metadata(bytes: Array[Byte]): Option[AvMetadata] = try {
    val top = boxes(bytes, 0, bytes.length).toSeq
    if (!top.headOption.exists(_._1 == "ftyp")) return None
    val moov = top.collectFirst { case ("moov", s, e) => (s, e) }
      .getOrElse(return None)
    val mvhd = findBox(bytes, moov._1, moov._2, "mvhd").getOrElse(return None)
    require(mvhd._2 - mvhd._1 >= 20, "mvhd payload too short")
    val ver = bytes(mvhd._1) & 0xFF
    if (ver == 1) require(mvhd._2 - mvhd._1 >= 32, "mvhd v1 too short")
    val (timescale, duration) =
      if (ver == 1) (u32(bytes, mvhd._1 + 20), u64(bytes, mvhd._1 + 24))
      else (u32(bytes, mvhd._1 + 12), u32(bytes, mvhd._1 + 16))
    if (timescale == 0) return None
    var codecs = List.empty[String]
    var width = 0; var height = 0
    var rate = 0; var channels = 0
    for (("trak", ts, te) <- boxes(bytes, moov._1, moov._2)) {
      for {
        (ms, me) <- findBox(bytes, ts, te, "mdia")
        (hs, he) <- findBox(bytes, ms, me, "hdlr")
        _ = require(he - hs >= 12, "hdlr payload too short")
        handler = fourcc(bytes, hs + 8)
        (ns, ne) <- findBox(bytes, ms, me, "minf")
        (ss, se) <- findBox(bytes, ns, ne, "stbl")
        (ds, de) <- findBox(bytes, ss, se, "stsd")
        // stsd: version/flags(4) + entry_count(4), then sample entries
        (cc, es, _) <- boxes(bytes, ds + 8, de).nextOption()
      } {
        codecs ::= cc
        // sample entry: 6 reserved + 2 data_reference_index = 8 bytes
        if (handler == "vide" && es + 28 <= de) {
          // video entry: +16 predefined/reserved, then width/height
          width = u16(bytes, es + 24)
          height = u16(bytes, es + 26)
        } else if (handler == "soun" && es + 28 <= de) {
          // audio entry: +8 version/revision/vendor, channels(2),
          // samplesize(2), predefined(4), samplerate (16.16 fixed)
          channels = u16(bytes, es + 16)
          rate = (u32(bytes, es + 24) >>> 16).toInt
        }
      }
    }
    val durMs = duration * 1000 / timescale
    Some(AvMetadata("mp4", codecs.reverse.distinct.mkString(","),
      rate, channels, width, height, durMs, 0,
      if (durMs > 0) (bytes.length * 8 / durMs).toInt else 0))
  } catch { case _: Exception => None } // malformed → quarantine

  /** Metadata rows for a binaryFile frame of compressed A/V: one row
    * per file with `status` = "metadata" (headers parsed) or
    * "quarantined" (malformed — fail closed, never guessed values).
    * Pure per-partition map, no shuffle. */
  def avMetadata(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (path, bytes) =>
        val mt = Multimodal.mediaTypeOf(path)
        val meta = mt match {
          case "audio/mpeg" => mp3Metadata(bytes)
          case "video/mp4" => mp4Metadata(bytes)
          case _ => None
        }
        meta match {
          case Some(m) =>
            (path, mt, m.container, m.codec, m.sampleRate, m.channels,
              m.width, m.height, m.durationMs, m.nFrames, m.bitrateKbps,
              "metadata")
          case None =>
            (path, mt, "", "", 0, 0, 0, 0, 0L, 0L, 0, "quarantined")
        }
      }
      .toDF("path", "media_type", "container", "codec", "sample_rate",
        "channels", "width", "height", "duration_ms", "n_frames",
        "bitrate_kbps", "status")
  }
}
