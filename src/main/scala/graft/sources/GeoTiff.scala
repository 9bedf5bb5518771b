package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import java.nio.{ByteBuffer, ByteOrder}

/** S5 — raster metadata scan without GDAL: a minimal GeoTIFF tag
  * parser over `binaryFile` bytes (SURVEY §7.4 hard-part (a)).
  *
  * The reference opens every file with rasterio to derive the STAC
  * `proj:*` / raster fields (`stac.py:53-114`) and falls back to a
  * metadata-only item when the file isn't raster-readable
  * (`stac.py:88-93`). Here the same fields come from parsing the TIFF
  * IFD + GeoTIFF GeoKey directory directly — pure JVM byte-level work,
  * partition-parallel over the binary source, reading only the header
  * bytes it needs. Parse failures yield `Left(reason)` = the
  * reference's fallback path.
  */
object GeoTiff {

  /** STAC projection-extension-ish raster metadata. */
  case class RasterMeta(
      width: Long, height: Long,
      bitsPerSample: Int, samplesPerPixel: Int,
      tileWidth: Option[Long], tileHeight: Option[Long],
      epsg: Option[Int],
      /** GDAL-style geotransform [x0, xres, 0, y0, 0, yres] from
        * ModelTiepoint + ModelPixelScale, when present. */
      transform: Option[Seq[Double]])

  // TIFF tag ids
  private val ImageWidth = 256
  private val ImageLength = 257
  private val BitsPerSample = 258
  private val SamplesPerPixel = 277
  private val TileWidth = 322
  private val TileLength = 323
  private val ModelPixelScale = 33550
  private val ModelTiepoint = 33922
  private val GeoKeyDirectory = 34735
  // GeoKey ids
  private val GeographicTypeGeoKey = 2048
  private val ProjectedCSTypeGeoKey = 3072

  def parse(bytes: Array[Byte]): Either[String, RasterMeta] = try {
    if (bytes.length < 8) return Left("not recognized: too short")
    val order = (bytes(0), bytes(1)) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case _ => return Left("not recognized as a supported file format")
    }
    val buf = ByteBuffer.wrap(bytes).order(order)
    val magic = buf.getShort(2) & 0xFFFF
    if (magic != 42) return Left("not recognized: bad TIFF magic")
    val ifdOffset = buf.getInt(4) & 0xFFFFFFFFL

    val nEntries = buf.getShort(ifdOffset.toInt) & 0xFFFF
    var tags = Map.empty[Int, (Int, Long, Long)] // tag -> (type, count, valueOrOffset)
    (0 until nEntries).foreach { i =>
      val e = ifdOffset.toInt + 2 + i * 12
      val tag = buf.getShort(e) & 0xFFFF
      val typ = buf.getShort(e + 2) & 0xFFFF
      val cnt = buf.getInt(e + 4) & 0xFFFFFFFFL
      val v = buf.getInt(e + 8) & 0xFFFFFFFFL
      tags += tag -> ((typ, cnt, v))
    }

    def scalar(tag: Int): Option[Long] = tags.get(tag).map {
      case (3, 1, v) =>
        // SHORT inline value sits in the first 2 bytes of the slot
        val e = entryOffset(tag); (buf.getShort(e + 8) & 0xFFFF).toLong
      case (_, _, v) => v
    }
    def entryOffset(tag: Int): Int = {
      val idx = (0 until nEntries)
        .find(i => (buf.getShort(ifdOffset.toInt + 2 + i * 12) & 0xFFFF) == tag).get
      ifdOffset.toInt + 2 + idx * 12
    }
    def doubles(tag: Int): Option[Seq[Double]] = tags.get(tag).collect {
      case (12, cnt, off) =>
        (0 until cnt.toInt).map(i => buf.getDouble(off.toInt + i * 8))
    }
    def shorts(tag: Int): Option[Seq[Int]] = tags.get(tag).collect {
      case (3, cnt, off) if cnt > 2 =>
        (0 until cnt.toInt).map(i => buf.getShort(off.toInt + i * 2) & 0xFFFF)
    }

    val w = scalar(ImageWidth).getOrElse(return Left("no ImageWidth"))
    val h = scalar(ImageLength).getOrElse(return Left("no ImageLength"))
    val bits = scalar(BitsPerSample).map(_.toInt).getOrElse(1)
    val spp = scalar(SamplesPerPixel).map(_.toInt).getOrElse(1)

    val epsg = shorts(GeoKeyDirectory).flatMap { keys =>
      // header (4 shorts) then 4-short key entries
      val entries = keys.drop(4).grouped(4).toSeq
      def key(id: Int) = entries.find(e => e.headOption.contains(id))
        .collect { case Seq(_, 0, _, value) => value }
      key(ProjectedCSTypeGeoKey).orElse(key(GeographicTypeGeoKey))
    }

    val transform = for {
      scale <- doubles(ModelPixelScale) if scale.size >= 2
      tie <- doubles(ModelTiepoint) if tie.size >= 6
    } yield Seq(tie(3), scale(0), 0.0, tie(4), 0.0, -scale(1))

    Right(RasterMeta(w, h, bits, spp,
      scalar(TileWidth), scalar(TileLength), epsg, transform))
  } catch {
    case e: Exception => Left(s"not recognized: ${e.getMessage}")
  }

  /** One scanned row: path + either metadata or the fallback reason. */
  case class ScanResult(path: String, ok: Boolean, error: String,
                        width: Long, height: Long, bitsPerSample: Int,
                        samplesPerPixel: Int, epsg: Option[Int],
                        transform: Option[Seq[Double]])

  /** Scan a `binaryFile` DataFrame (path, content) partition-parallel;
    * unparseable files carry the fallback reason instead of failing the
    * job (the reference's metadata-only fallback, `stac.py:88-93`). */
  def scanMetadata(media: DataFrame): Dataset[ScanResult] = {
    val spark = media.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    media.select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .mapPartitions(_.map { case (path, bytes) =>
        parse(bytes) match {
          case Right(m) => ScanResult(path, ok = true, null, m.width,
            m.height, m.bitsPerSample, m.samplesPerPixel, m.epsg,
            m.transform)
          case Left(err) => ScanResult(path, ok = false, err, 0, 0, 0, 0,
            None, None)
        }
      })
  }
}
