package graft

import graft.sources.GeoTiff
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.Files

/** S5 — GeoTIFF header parser against a hand-assembled minimal
  * GeoTIFF (little-endian, tiled, EPSG + tiepoint/scale tags). */
class GeoTiffSpec extends SparkSuite {

  /** Build a minimal valid GeoTIFF: 512x256 uint8, tiles 256x256,
    * EPSG:4326, origin (-180, 90), pixel size 0.1 x 0.05. */
  private def makeGeoTiff(order: ByteOrder): Array[Byte] = {
    val buf = ByteBuffer.allocate(4096).order(order)
    // header
    buf.put(if (order == ByteOrder.LITTLE_ENDIAN) "II".getBytes
            else "MM".getBytes)
    buf.putShort(42)
    buf.putInt(8) // IFD at byte 8
    // IFD: 9 entries
    val entries = 9
    buf.putShort(8, entries.toShort)
    var e = 10
    def entry(tag: Int, typ: Int, cnt: Int, value: Long): Unit = {
      buf.putShort(e, tag.toShort)
      buf.putShort(e + 2, typ.toShort)
      buf.putInt(e + 4, cnt)
      if (typ == 3 && cnt == 1) buf.putShort(e + 8, value.toShort)
      else buf.putInt(e + 8, value.toInt)
      e += 12
    }
    // out-of-line data areas
    val geoKeysOff = 200
    val scaleOff = 260
    val tieOff = 300
    entry(256, 3, 1, 512)        // ImageWidth
    entry(257, 3, 1, 256)        // ImageLength
    entry(258, 3, 1, 8)          // BitsPerSample
    entry(277, 3, 1, 1)          // SamplesPerPixel
    entry(322, 3, 1, 256)        // TileWidth
    entry(323, 3, 1, 256)        // TileLength
    entry(33550, 12, 3, scaleOff)   // ModelPixelScale
    entry(33922, 12, 6, tieOff)     // ModelTiepoint
    entry(34735, 3, 8, geoKeysOff)  // GeoKeyDirectory
    buf.putInt(e, 0) // next IFD = none
    // GeoKeyDirectory: header + 1 key (GeographicTypeGeoKey=4326)
    val keys = Seq(1, 1, 0, 1, 2048, 0, 1, 4326)
    keys.zipWithIndex.foreach { case (v, i) =>
      buf.putShort(geoKeysOff + i * 2, v.toShort)
    }
    // ModelPixelScale: (0.1, 0.05, 0)
    Seq(0.1, 0.05, 0.0).zipWithIndex.foreach { case (v, i) =>
      buf.putDouble(scaleOff + i * 8, v)
    }
    // ModelTiepoint: (0, 0, 0, -180, 90, 0)
    Seq(0.0, 0.0, 0.0, -180.0, 90.0, 0.0).zipWithIndex.foreach {
      case (v, i) => buf.putDouble(tieOff + i * 8, v)
    }
    buf.array()
  }

  test("parses dimensions, tiling, EPSG, geotransform (both endians)") {
    for (order <- Seq(ByteOrder.LITTLE_ENDIAN, ByteOrder.BIG_ENDIAN)) {
      val m = GeoTiff.parse(makeGeoTiff(order))
        .fold(e => fail(s"$order: $e"), identity)
      assert(m.width == 512 && m.height == 256)
      assert(m.bitsPerSample == 8 && m.samplesPerPixel == 1)
      assert(m.tileWidth.contains(256L) && m.tileHeight.contains(256L))
      assert(m.epsg.contains(4326))
      assert(m.transform.contains(Seq(-180.0, 0.1, 0.0, 90.0, 0.0, -0.05)))
    }
  }

  test("non-TIFF bytes hit the metadata-only fallback (stac.py:88-93)") {
    assert(GeoTiff.parse("not a tiff at all".getBytes).isLeft)
    assert(GeoTiff.parse(Array[Byte]()).isLeft)
    assert(GeoTiff.parse("II".getBytes ++ Array[Byte](0, 0, 0, 0, 0, 0))
      .left.exists(_.contains("magic")))
  }

  test("raster metadata enriches item properties; fallback rows untouched") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("rasters-enrich")
    Files.write(dir.resolve("good_2020.tif"),
      makeGeoTiff(ByteOrder.LITTLE_ENDIAN))
    Files.write(dir.resolve("bad_2021.tif"), "not a raster".getBytes)
    val media = graft.llm.Multimodal.readMedia(spark, s"file://$dir",
      glob = "*.tif")
    val urls = media.select("path").collect().map(_.getString(0)).sorted
    import spark.implicits._
    val objs = urls.toSeq.toDF("remote_fileurl")
      .withColumn("collection", lit("c"))
      .withColumn("properties", map(lit("k"), lit("v")))
      .withColumn("product_id", lit(null).cast("string"))
      .withColumn("assets", lit(null).cast("map<string,string>"))
    val ev = graft.model.PipelineEvent(collection = "c",
      assetName = Some("data"))
    val items = graft.operators.StacBuilder.regexItems(objs, ev)
    val enriched = graft.operators.StacBuilder
      .enrichWithRaster(items, GeoTiff.scanMetadata(media))
      .select(col("id"), col("properties")).collect()
      .map(r => r.getString(0) -> r.getMap[String, String](1)).toMap
    val good = enriched("good_2020")
    assert(good("proj:epsg") == "4326")
    assert(good("proj:shape") == "256,512")
    assert(good("proj:transform") == "-180.0,0.1,0.0,90.0,0.0,-0.05")
    assert(good("raster:bits_per_sample") == "8")
    assert(good("k") == "v") // pre-existing properties survive the merge
    val bad = enriched("bad_2021")
    assert(!bad.contains("proj:epsg") && bad("k") == "v")
  }

  test("distributed scan over binaryFile source with fallback rows") {
    val dir = Files.createTempDirectory("rasters")
    Files.write(dir.resolve("good.tif"),
      makeGeoTiff(ByteOrder.LITTLE_ENDIAN))
    Files.write(dir.resolve("bad.tif"), "not a raster".getBytes)
    val media = graft.llm.Multimodal.readMedia(spark, s"file://$dir",
      glob = "*.tif")
    val rows = GeoTiff.scanMetadata(media).collect().sortBy(_.path)
    assert(rows.length == 2)
    val bad = rows.find(_.path.endsWith("bad.tif")).get
    val good = rows.find(_.path.endsWith("good.tif")).get
    assert(!bad.ok && bad.error.contains("not recognized"))
    assert(good.ok && good.width == 512 && good.epsg.contains(4326))
  }
}
