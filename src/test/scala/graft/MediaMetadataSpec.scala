package graft

import graft.llm.MediaMetadata

/** Pins [[MediaMetadata]] — header-only mp3/mp4 metadata extraction
  * (duration, codec, rate, channels, dimensions) from spec-built
  * fixture bytes: valid headers yield exact metadata rows, mangled
  * headers quarantine (fail closed), and decode stays a seam. */
class MediaMetadataSpec extends SparkSuite {

  // ---- MP3 fixture builder (MPEG audio frame headers, zero payload)

  /** One MPEG frame: version 3=MPEG1 / 2=MPEG2, layer III,
    * brIdx into the spec bitrate table, srIdx into the rate table. */
  private def mp3Frame(version: Int, brIdx: Int, srIdx: Int,
                       mono: Boolean): Array[Byte] = {
    val b1 = (0xE0 | (version << 3) | (1 << 1) | 1).toByte // layer III
    val b2 = ((brIdx << 4) | (srIdx << 2)).toByte
    val b3 = (if (mono) 0xC0 else 0x00).toByte
    val rates = Map(3 -> Array(44100, 48000, 32000),
      2 -> Array(22050, 24000, 16000))(version)
    val kbps = (if (version == 3)
      Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
    else
      Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))(brIdx)
    val coeff = if (version == 3) 144 else 72
    val len = coeff * kbps * 1000 / rates(srIdx)
    Array[Byte](0xFF.toByte, b1, b2, b3) ++ new Array[Byte](len - 4)
  }

  private def id3v2(size: Int): Array[Byte] =
    Array[Byte]('I', 'D', '3', 3, 0, 0,
      ((size >> 21) & 0x7F).toByte, ((size >> 14) & 0x7F).toByte,
      ((size >> 7) & 0x7F).toByte, (size & 0x7F).toByte) ++
      new Array[Byte](size)

  test("mp3: CBR stereo MPEG1 Layer III behind an ID3v2 tag") {
    val bytes = id3v2(100) ++
      Array.fill(4)(mp3Frame(3, 9, 0, mono = false)).flatten // 128k 44100
    val m = MediaMetadata.mp3Metadata(bytes).get
    assert(m.container === "mp3" && m.codec === "mp3")
    assert(m.sampleRate === 44100 && m.channels === 2)
    assert(m.nFrames === 4L && m.bitrateKbps === 128)
    // 4 frames x 1152 samples / 44100 Hz = 104.49 ms
    assert(m.durationMs === 104L)
  }

  test("mp3: VBR sums exact per-frame durations; MPEG2 mono halves rate") {
    val vbr = mp3Frame(3, 9, 0, mono = false) ++
      mp3Frame(3, 11, 0, mono = false) ++ mp3Frame(3, 5, 0, mono = false)
    val m = MediaMetadata.mp3Metadata(vbr).get
    assert(m.nFrames === 3L)
    assert(m.durationMs === math.round(3 * 1152 * 1000.0 / 44100)) // 78 ms
    assert(m.bitrateKbps === (128 + 192 + 64) / 3)
    val m2 = MediaMetadata.mp3Metadata(
      Array.fill(3)(mp3Frame(2, 8, 0, mono = true)).flatten).get
    assert(m2.sampleRate === 22050 && m2.channels === 1)
    assert(m2.durationMs === math.round(3 * 576 * 1000.0 / 22050))
  }

  test("mp3: a Xing/Info VBR header frame is framing, not audio — " +
    "excluded from frame count, duration, and bitrate averaging") {
    // MPEG1 stereo: side info is 32 bytes, so the tag sits at
    // frame offset 4 + 32 = 36
    val xingFrame = {
      val f = mp3Frame(3, 9, 0, mono = false)
      "Xing".getBytes("ISO-8859-1").copyToArray(f, 36); f
    }
    val audio = mp3Frame(3, 11, 0, mono = false) ++
      mp3Frame(3, 11, 0, mono = false)
    val m = MediaMetadata.mp3Metadata(xingFrame ++ audio).get
    assert(m.nFrames === 2L) // the Xing frame does not count
    assert(m.durationMs === math.round(2 * 1152 * 1000.0 / 44100))
    assert(m.bitrateKbps === 192) // 128k header frame not averaged in
    // 'Info' (the CBR twin) skips identically
    val infoFrame = {
      val f = mp3Frame(3, 9, 0, mono = false)
      "Info".getBytes("ISO-8859-1").copyToArray(f, 36); f
    }
    assert(MediaMetadata.mp3Metadata(infoFrame ++ audio)
      .exists(_.nFrames == 2L))
    // the tag only shields the FIRST frame: 'Xing' bytes inside a
    // later frame's payload are audio data, still counted
    val laterTag = audio ++ xingFrame
    assert(MediaMetadata.mp3Metadata(laterTag).exists(_.nFrames == 3L))
  }

  test("mp3: minimal-size frames (8 kbps MPEG2 stereo, fb=24) — the " +
    "Xing probe window [off+21, off+25) ends past the frame, so the " +
    "probe must stand down rather than read the next frame's bytes") {
    // fb = 72*8*1000/24000 = 24 < 4 + 17(side) + 4(tag): a probe not
    // bounded by the frame end reads one byte into frame 2. Plant
    // "Xin" at the probe offset in frame 1's payload — with the frame
    // 2 sync byte 0xFF following, an unbounded probe reads "Xin\xFF"
    // (and a coincidental 'g' there would silently drop frame 1);
    // bounded, the probe never fires and every frame counts.
    val tiny = mp3Frame(2, 1, 1, mono = false) // brIdx 1 = 8 kbps, 24 kHz
    assert(tiny.length === 24)
    "Xin".getBytes("ISO-8859-1").copyToArray(tiny, 21)
    val m = MediaMetadata.mp3Metadata(
      tiny ++ mp3Frame(2, 1, 1, mono = false) ++
        mp3Frame(2, 1, 1, mono = false)).get
    assert(m.nFrames === 3L)
    assert(m.durationMs === math.round(3 * 576 * 1000.0 / 24000))
  }

  test("mp3: a final truncated frame (valid header, payload past EOF) " +
    "is not counted at full duration") {
    val full = Array.fill(3)(mp3Frame(3, 9, 0, mono = false)).flatten
    val truncated = full ++ mp3Frame(3, 9, 0, mono = false).take(100)
    val m = MediaMetadata.mp3Metadata(truncated).get
    assert(m.nFrames === 3L)
    assert(m.durationMs === math.round(3 * 1152 * 1000.0 / 44100))
  }

  test("mp3: mangled headers fail closed") {
    // random-ish bytes, a lone sync word, a single valid frame
    assert(MediaMetadata.mp3Metadata("not audio at all".getBytes).isEmpty)
    assert(MediaMetadata.mp3Metadata(
      Array[Byte](0xFF.toByte, 0xFB.toByte) ++ new Array[Byte](100)).isEmpty)
    assert(MediaMetadata.mp3Metadata(mp3Frame(3, 9, 0, mono = false)).isEmpty)
    // ID3 tag claiming to extend past EOF
    assert(MediaMetadata.mp3Metadata(id3v2(100).take(40)).isEmpty)
  }

  // ---- MP4 fixture builder (ISO BMFF boxes)

  private def u32b(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xFF).toByte, ((v >> 16) & 0xFF).toByte,
    ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def u16b(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def box(typ: String, payload: Array[Byte]): Array[Byte] =
    u32b(payload.length + 8L) ++ typ.getBytes("ISO-8859-1") ++ payload

  private def mvhd(timescale: Long, duration: Long): Array[Byte] =
    box("mvhd", new Array[Byte](12) ++ u32b(timescale) ++ u32b(duration) ++
      new Array[Byte](76))

  private def hdlr(handler: String): Array[Byte] =
    box("hdlr", new Array[Byte](8) ++ handler.getBytes("ISO-8859-1") ++
      new Array[Byte](13))

  private def videoEntry(w: Int, h: Int): Array[Byte] =
    box("avc1", new Array[Byte](24) ++ u16b(w) ++ u16b(h) ++
      new Array[Byte](50))

  private def audioEntry(channels: Int, rate: Int): Array[Byte] =
    box("mp4a", new Array[Byte](16) ++ u16b(channels) ++ u16b(16) ++
      new Array[Byte](4) ++ u16b(rate) ++ u16b(0))

  private def trak(handler: String, entry: Array[Byte]): Array[Byte] =
    box("trak", box("mdia", hdlr(handler) ++
      box("minf", box("stbl",
        box("stsd", new Array[Byte](8) ++ entry)))))

  private def mp4(tracks: Array[Byte]*): Array[Byte] =
    box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov", mvhd(1000, 5000) ++ tracks.flatten.toArray) ++
      box("mdat", new Array[Byte](32))

  test("mp4: ftyp/moov walk yields duration, codecs, dims, audio params") {
    val bytes = mp4(trak("vide", videoEntry(640, 360)),
      trak("soun", audioEntry(2, 44100)))
    val m = MediaMetadata.mp4Metadata(bytes).get
    assert(m.container === "mp4")
    assert(m.codec === "avc1,mp4a")
    assert(m.durationMs === 5000L)
    assert(m.width === 640 && m.height === 360)
    assert(m.channels === 2 && m.sampleRate === 44100)
  }

  test("mp3: tag padding and an ID3v2.4 footer are skipped, not " +
    "quarantined") {
    val frames = Array.fill(3)(mp3Frame(3, 9, 0, mono = false)).flatten
    // padding zeros between tag end and first frame
    val padded = id3v2(16) ++ new Array[Byte](37) ++ frames
    assert(MediaMetadata.mp3Metadata(padded).exists(_.nFrames == 3L))
    // v2.4 footer: flag bit 4 set, 10 footer bytes after the tag body
    val hdr = Array[Byte]('I', 'D', '3', 4, 0, 0x10.toByte, 0, 0, 0, 16)
    val footer = "3DI".getBytes ++ new Array[Byte](7)
    val withFooter = hdr ++ new Array[Byte](16) ++ footer ++ frames
    assert(MediaMetadata.mp3Metadata(withFooter).exists(_.nFrames == 3L))
  }

  test("mp4: truncated inner boxes fail closed, never a partial row " +
    "or a crash") {
    // mvhd with an EMPTY payload (size 8): bounds check, not AIOOBE
    val emptyMvhd = box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov", u32b(8) ++ "mvhd".getBytes)
    assert(MediaMetadata.mp4Metadata(emptyMvhd).isEmpty)
    // a second trak whose size escapes moov: the WHOLE parse fails
    // closed instead of returning the first trak's partial metadata
    val goodTrak = trak("vide", videoEntry(640, 360))
    val badTrak = {
      val t = trak("soun", audioEntry(2, 44100))
      val b = u32b(t.length + 400L) ++ t.drop(4) // size escapes parent
      b
    }
    val partial = box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov", mvhd(1000, 5000) ++ goodTrak ++ badTrak)
    assert(MediaMetadata.mp4Metadata(partial).isEmpty)
    // hdlr too short for its handler fourcc
    val shortHdlr = box("ftyp", "isom".getBytes ++ new Array[Byte](8)) ++
      box("moov", mvhd(1000, 5000) ++
        box("trak", box("mdia", box("hdlr", new Array[Byte](8)) ++
          box("minf", box("stbl",
            box("stsd", new Array[Byte](8) ++ videoEntry(1, 1)))))))
    assert(MediaMetadata.mp4Metadata(shortHdlr).isEmpty)
  }

  test("mp4: mangled boxes fail closed") {
    val good = mp4(trak("vide", videoEntry(640, 360)))
    // no ftyp first
    assert(MediaMetadata.mp4Metadata(good.drop(20)).isEmpty)
    // truncated file: moov size escapes EOF
    assert(MediaMetadata.mp4Metadata(good.dropRight(60)).isEmpty)
    // box size smaller than its header
    val broken = good.clone()
    broken(0) = 0; broken(1) = 0; broken(2) = 0; broken(3) = 3
    assert(MediaMetadata.mp4Metadata(broken).isEmpty)
    assert(MediaMetadata.mp4Metadata("??".getBytes).isEmpty)
  }

  test("fuzz: every truncation and seeded bit flips return Option, " +
    "never throw") {
    val goodMp3 = id3v2(10) ++
      Array.fill(4)(mp3Frame(3, 9, 0, mono = false)).flatten
    val goodMp4 = mp4(trak("vide", videoEntry(640, 360)),
      trak("soun", audioEntry(2, 44100)))
    (0 to goodMp3.length).foreach(n =>
      MediaMetadata.mp3Metadata(goodMp3.take(n))) // must not throw
    (0 to goodMp4.length).foreach(n =>
      MediaMetadata.mp4Metadata(goodMp4.take(n)))
    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { _ =>
      val a = goodMp3.clone()
      a(rnd.nextInt(a.length)) = rnd.nextInt().toByte
      MediaMetadata.mp3Metadata(a)
      val v = goodMp4.clone()
      v(rnd.nextInt(v.length)) = rnd.nextInt().toByte
      MediaMetadata.mp4Metadata(v)
    }
  }

  test("avMetadata: binaryFile frame routes metadata vs quarantine") {
    val dir = java.nio.file.Files.createTempDirectory("avmeta")
    java.nio.file.Files.write(dir.resolve("song.mp3"),
      id3v2(10) ++ Array.fill(5)(mp3Frame(3, 9, 0, mono = false)).flatten)
    java.nio.file.Files.write(dir.resolve("clip.mp4"),
      mp4(trak("vide", videoEntry(1920, 1080)),
        trak("soun", audioEntry(1, 48000))))
    java.nio.file.Files.write(dir.resolve("junk.mp3"),
      "zzzzzzzzzzzzzzzz".getBytes)
    val rows = MediaMetadata.avMetadata(
      graft.llm.Multimodal.readMedia(spark, s"file://$dir"))
      .collect()
      .map(r => r.getAs[String]("path").split('/').last ->
        (r.getAs[String]("status"), r.getAs[Long]("duration_ms"),
          r.getAs[String]("codec"), r.getAs[Int]("width"))).toMap
    assert(rows("song.mp3")._1 === "metadata")
    assert(rows("song.mp3")._2 === math.round(5 * 1152 * 1000.0 / 44100))
    assert(rows("clip.mp4") === (("metadata", 5000L, "avc1,mp4a", 1920)))
    assert(rows("junk.mp3")._1 === "quarantined")
  }
}
