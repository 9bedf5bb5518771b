package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.Deflater

/** K3 — minimal cloud-optimized GeoTIFF writer: the inverse of
  * [[GeoTiff]]'s parser, replacing the reference's GDAL
  * `cog_translate` profile (`cogify/handler.py:151-220` /
  * rio-cogeo "deflate" profile: tiled 256×256 or 512×512 blocks,
  * DEFLATE compression, float32 samples, geo tags, nodata).
  *
  * Layout is COG-shaped: header + IFD + tag arrays first, tile data
  * after, so a range-reader gets the full metadata from the first few
  * KB. Pure JVM (java.util.zip.Deflater) — no GDAL. Overview levels
  * are not written (a single-resolution COG is still a valid COG; the
  * reference relies on rio-cogeo defaults for overviews).
  */
object GeoTiffWriter {

  case class Geo(
      /** GDAL geotransform [x0, xres, 0, y0, 0, yres] (yres < 0). */
      transform: Seq[Double],
      epsg: Int = 4326)

  /** Write a single-band float32 tiled GeoTIFF (little-endian).
    *
    * @param data row-major width*height samples
    * @param fill nodata value (GDAL_NODATA tag + edge-tile padding)
    */
  def write(width: Int, height: Int, data: Array[Float],
            geo: Geo, fill: Option[Double] = None,
            tileSize: Int = 256): Array[Byte] = {
    require(data.length == width * height,
      s"${data.length} samples for ${width}x$height")
    val fillF = fill.getOrElse(0.0).toFloat

    // tiles, row-major over the tile grid, edge tiles padded with fill
    val tilesAcross = (width + tileSize - 1) / tileSize
    val tilesDown = (height + tileSize - 1) / tileSize
    val tiles = for {
      ty <- 0 until tilesDown
      tx <- 0 until tilesAcross
    } yield {
      val tb = ByteBuffer.allocate(tileSize * tileSize * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      var y = 0
      while (y < tileSize) {
        var x = 0
        while (x < tileSize) {
          val gx = tx * tileSize + x
          val gy = ty * tileSize + y
          tb.putFloat(
            if (gx < width && gy < height) data(gy * width + gx) else fillF)
          x += 1
        }
        y += 1
      }
      deflate(tb.array())
    }
    assemble(width, height, spp = 1, bits = 32, fmt = 3, photometric = 1,
      tiles, geo, fill, tileSize)
  }

  /** Write a 3-band 8-bit RGB tiled deflate COG (chunky interleaved,
    * photometric RGB) — the browse-imagery output profile: GDAL's
    * `cog_translate` preserves the byte dtype of RGB inputs, so a
    * JPEG/LZW color TIFF re-tiles to uint8, not float32
    * (`cogify/handler.py:186-220`). Band values are clamp-rounded to
    * 0..255; edge tiles pad with `fill` (same clamp). */
  def writeRgb(width: Int, height: Int, bands: Array[Array[Float]],
               geo: Geo, fill: Option[Double] = None,
               tileSize: Int = 256): Array[Byte] = {
    require(bands.length == 3, s"${bands.length} bands (writeRgb is 3)")
    bands.foreach(b => require(b.length == width * height,
      s"${b.length} samples for ${width}x$height"))
    def toByte(v: Float): Byte =
      math.max(0, math.min(255, math.round(v))).toByte
    val fillB = toByte(fill.getOrElse(0.0).toFloat)

    val tilesAcross = (width + tileSize - 1) / tileSize
    val tilesDown = (height + tileSize - 1) / tileSize
    val tiles = for {
      ty <- 0 until tilesDown
      tx <- 0 until tilesAcross
    } yield {
      val tb = new Array[Byte](tileSize * tileSize * 3)
      var y = 0
      while (y < tileSize) {
        var x = 0
        while (x < tileSize) {
          val gx = tx * tileSize + x
          val gy = ty * tileSize + y
          val o = (y * tileSize + x) * 3
          if (gx < width && gy < height) {
            val p = gy * width + gx
            tb(o) = toByte(bands(0)(p))
            tb(o + 1) = toByte(bands(1)(p))
            tb(o + 2) = toByte(bands(2)(p))
          } else { tb(o) = fillB; tb(o + 1) = fillB; tb(o + 2) = fillB }
          x += 1
        }
        y += 1
      }
      deflate(tb)
    }
    assemble(width, height, spp = 3, bits = 8, fmt = 1, photometric = 2,
      tiles, geo, fill, tileSize)
  }

  /** Shared COG assembly: header + IFD + out-of-line tag arrays first,
    * deflated tile payloads after (metadata-first = range-reader
    * friendly). Multi-band emits SHORT[spp] BitsPerSample/SampleFormat
    * arrays (off-slot) and a chunky PlanarConfiguration entry. */
  private def assemble(width: Int, height: Int, spp: Int, bits: Int,
                       fmt: Int, photometric: Int,
                       tiles: Seq[Array[Byte]], geo: Geo,
                       fill: Option[Double], tileSize: Int): Array[Byte] = {
    require(geo.transform.size == 6, "geotransform needs 6 terms")
    // IFD entries (ascending tag order)
    val nTiles = tiles.size
    case class Entry(tag: Int, typ: Int, cnt: Int, value: Long)
    // out-of-line data gets assembled after the IFD; offsets patched
    // GDAL_NODATA is NUL-terminated ASCII; the count includes the NUL
    val nodataAscii = fill.map(f =>
      trimmedDouble(f).getBytes("US-ASCII") :+ 0.toByte)

    val multi = spp > 1
    val entryCount = 14 + nodataAscii.size + (if (multi) 1 else 0)
    val ifdOffset = 8
    val ifdSize = 2 + entryCount * 12 + 4
    var dataOff = ifdOffset + ifdSize

    def alloc(n: Int): Int = { val o = dataOff; dataOff += n; o }
    val tileOffsetsOff = if (nTiles > 1) alloc(nTiles * 4) else 0
    val tileCountsOff = if (nTiles > 1) alloc(nTiles * 4) else 0
    // SHORT[spp] arrays exceed the 4-byte slot for spp == 3
    val bpsOff = if (multi) alloc(spp * 2) else 0
    val fmtOff = if (multi) alloc(spp * 2) else 0
    val scaleOff = alloc(24)
    val tieOff = alloc(48)
    val geoKeysOff = alloc(16)
    // TIFF 6.0: values of count*size <= 4 bytes MUST live inline in
    // the value slot — only longer nodata strings go out of line
    val nodataOff = nodataAscii.filter(_.length > 4)
      .map(b => alloc((b.length + 1) / 2 * 2))
    val tileDataStart = dataOff
    val tileOffsets = tiles.scanLeft(tileDataStart.toLong)(_ + _.length)

    val entries = Seq(
      Entry(256, 4, 1, width),              // ImageWidth
      Entry(257, 4, 1, height),             // ImageLength
      Entry(258, 3, spp,                    // BitsPerSample
        if (multi) bpsOff else bits),
      Entry(259, 3, 1, 8),                  // Compression: DEFLATE
      Entry(262, 3, 1, photometric),        // Photometric
      Entry(277, 3, 1, spp)) ++             // SamplesPerPixel
      (if (multi) Seq(Entry(284, 3, 1, 1))  // PlanarConfig: chunky
       else Nil) ++ Seq(
      Entry(322, 3, 1, tileSize),           // TileWidth
      Entry(323, 3, 1, tileSize),           // TileLength
      Entry(324, 4, nTiles,                 // TileOffsets
        if (nTiles == 1) tileOffsets.head else tileOffsetsOff),
      Entry(325, 4, nTiles,                 // TileByteCounts
        if (nTiles == 1) tiles.head.length else tileCountsOff),
      Entry(339, 3, spp,                    // SampleFormat
        if (multi) fmtOff else fmt),
      Entry(33550, 12, 3, scaleOff),        // ModelPixelScale
      Entry(33922, 12, 6, tieOff),          // ModelTiepoint
      Entry(34735, 3, 8, geoKeysOff)        // GeoKeyDirectory
    ) ++ nodataAscii.map(b =>
      Entry(42113, 2, b.length,
        nodataOff.map(_.toLong).getOrElse(0L))) // GDAL_NODATA

    // classic TIFF carries 32-bit offsets; this writer additionally
    // assembles in one byte array, so fail with a CLEAR message well
    // before an Int wrap turns into a cryptic allocation error (a
    // 100 TB pipeline writes many granule-sized COGs, not one mosaic
    // this large — BigTIFF would be the format for that)
    val totalBytes = tileDataStart.toLong +
      tiles.map(_.length.toLong).sum
    require(totalBytes <= Int.MaxValue - 8,
      s"COG would be $totalBytes bytes — beyond the classic-TIFF " +
        "32-bit offset envelope of this writer; tile the output into " +
        "multiple granule-sized COGs")
    val out = ByteBuffer.allocate(totalBytes.toInt)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte); out.put('I'.toByte)
    out.putShort(2, 42)
    out.putInt(4, ifdOffset)
    out.putShort(ifdOffset, entryCount.toShort)
    entries.zipWithIndex.foreach { case (en, i) =>
      val e = ifdOffset + 2 + i * 12
      out.putShort(e, en.tag.toShort)
      out.putShort(e + 2, en.typ.toShort)
      out.putInt(e + 4, en.cnt)
      if (en.typ == 3 && en.cnt == 1) out.putShort(e + 8, en.value.toShort)
      else out.putInt(e + 8, en.value.toInt)
    }
    out.putInt(ifdOffset + 2 + entryCount * 12, 0) // next IFD: none

    if (nTiles > 1) {
      tileOffsets.init.zipWithIndex.foreach { case (o, i) =>
        out.putInt(tileOffsetsOff + i * 4, o.toInt) }
      tiles.zipWithIndex.foreach { case (t, i) =>
        out.putInt(tileCountsOff + i * 4, t.length) }
    }
    if (multi) (0 until spp).foreach { i =>
      out.putShort(bpsOff + i * 2, bits.toShort)
      out.putShort(fmtOff + i * 2, fmt.toShort)
    }
    // ModelPixelScale (xres, |yres|, 0) + tiepoint (0,0,0 -> x0,y0,0)
    val t = geo.transform
    Seq(t(1), math.abs(t(5)), 0.0).zipWithIndex.foreach { case (v, i) =>
      out.putDouble(scaleOff + i * 8, v) }
    Seq(0.0, 0.0, 0.0, t(0), t(3), 0.0).zipWithIndex.foreach { case (v, i) =>
      out.putDouble(tieOff + i * 8, v) }
    // GeoKeyDirectory: header + Geographic (4xxx) or Projected CS key
    val geoKeyId = if (geo.epsg >= 4000 && geo.epsg <= 4999) 2048 else 3072
    Seq(1, 1, 0, 1, geoKeyId, 0, 1, geo.epsg).zipWithIndex.foreach {
      case (v, i) => out.putShort(geoKeysOff + i * 2, v.toShort) }
    nodataAscii.foreach { b =>
      if (b.length <= 4) {
        // inline: raw ASCII bytes occupy the slot of the LAST entry
        val slot = ifdOffset + 2 + (entryCount - 1) * 12 + 8
        out.position(slot); out.put(b)
      } else { out.position(nodataOff.get); out.put(b) }
    }

    out.position(tileDataStart)
    tiles.foreach(tb => out.put(tb))
    out.array()
  }

  private def trimmedDouble(d: Double): String =
    if (d == d.toLong.toDouble) d.toLong.toString else d.toString

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw); d.finish()
    val out = new ByteArrayOutputStream(raw.length / 2 + 64)
    val chunk = new Array[Byte](8192)
    while (!d.finished()) out.write(chunk, 0, d.deflate(chunk))
    d.end()
    out.toByteArray
  }

  /** Inflate a DEFLATE segment into a buffer of at most `maxLen`
    * bytes. Throws on truncated input (Inflater.inflate returns 0 with
    * needsInput while unfinished) instead of spinning — a partially
    * downloaded file must error, not hang the task. */
  private[sources] def inflateFully(compressed: Array[Byte],
                                    maxLen: Int): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(compressed)
      val raw = new Array[Byte](maxLen)
      var off = 0
      while (!inf.finished() && off < raw.length) {
        val n = inf.inflate(raw, off, raw.length - off)
        if (n == 0) {
          if (inf.needsInput() || inf.needsDictionary())
            throw new java.io.IOException(
              "truncated or malformed DEFLATE stream")
          // else finished flips on the next loop check
        }
        off += n
      }
      raw
    } finally inf.end()
  }

  /** Inflate one tile back to float32 samples (test/verification aid —
    * the read half of the round-trip contract with [[GeoTiff]]). */
  def inflateTile(compressed: Array[Byte], tileSize: Int): Array[Float] = {
    val raw = inflateFully(compressed, tileSize * tileSize * 4)
    val fb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    Array.fill(tileSize * tileSize)(fb.getFloat)
  }
}
