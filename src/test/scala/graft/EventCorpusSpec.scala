package graft

import graft.pipeline.EventJson
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Real-world config-corpus compatibility: every one of the
  * reference's 28 production pipeline configs (the JSON files under
  * `data/step_function_inputs`) must parse into a
  * [[graft.model.PipelineEvent]] with usable fields — the "a user of
  * the reference could switch" check for the event surface. */
class EventCorpusSpec extends SparkSuite {

  private val corpusDir = Paths.get("/root/reference/data/step_function_inputs")

  test("all 28 reference pipeline configs parse and are runnable shapes") {
    assume(Files.isDirectory(corpusDir), "reference corpus not present")
    val files = Files.list(corpusDir).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
    assert(files.size == 28)
    val events = files.flatMap { f =>
      val evs = EventJson.parseAll(Files.readString(f))
      assert(evs.nonEmpty, s"no events parsed from $f")
      evs.map(f.getFileName.toString -> _)
    }
    events.foreach { case (src, ev) =>
      assert(ev.collection.nonEmpty, s"$src: empty collection")
      assert(Set("s3", "cmr", "inventory").contains(ev.discovery),
        s"$src: unknown discovery '${ev.discovery}'")
      // every regex in the config must compile on the JVM
      (ev.filenameRegex.toSeq ++ ev.idRegex.toSeq ++
        ev.dataFileRegex.toSeq).foreach { re =>
        java.util.regex.Pattern.compile(re)
      }
      // discovery-specific requirements the Runner depends on
      ev.discovery match {
        case "inventory" =>
          assert(ev.inventoryUrl.isDefined, s"$src: inventory without url")
        case "s3" =>
          assert(ev.bucket.isDefined || ev.prefix.nonEmpty,
            s"$src: s3 discovery without bucket/prefix")
        case "cmr" =>
          assert(ev.version.isDefined || ev.mode.isDefined ||
            ev.linkRel.isDefined || ev.temporal.nonEmpty,
            s"$src: cmr discovery without query fields")
      }
      // datetime_range, when present, must be a widening the engine knows
      ev.datetimeRange.foreach(r => assert(Set("month", "year").contains(r),
        s"$src: unknown datetime_range '$r'"))
    }
    // the corpus exercises cmr + inventory discovery (no shipped config
    // uses s3 listing — that path is covered by DiscoverySpec) and both
    // union-typed asset config forms
    val evs = events.map(_._2)
    assert(evs.map(_.discovery).toSet == Set("cmr", "inventory"))
    assert(evs.exists(_.assetRolesMap.nonEmpty) ||
      evs.exists(_.assetRolesList.isDefined))
    assert(evs.exists(_.assetMediaTypeMap.nonEmpty) ||
      evs.exists(_.assetMediaTypeScalar.isDefined))
    assert(evs.exists(_.dataFileRegex.isDefined), "no multi-asset config")
  }

  test("cogify-enabled configs run discover -> cogify -> STAC with bytes") {
    // The §3.1 lifecycle with REAL raster IO for the reference's
    // cogify-enabled configs (the four ESACCI year variants): fixture
    // GeoTIFFs on disk, inventory discovery from the real config's
    // shape, the JVM COG writer doing the conversion, and the emitted
    // items' proj/raster fields cross-checked against the independent
    // S5 parser reading the produced COG bytes.
    assume(Files.isDirectory(corpusDir), "reference corpus not present")
    import graft.operators.Cogify
    import graft.pipeline.Runner
    import graft.sources.{GeoTiff, GeoTiffWriter}
    import org.apache.spark.sql.functions.col

    for (year <- Seq("2017", "2020")) {
      val cfgFile = corpusDir.resolve(
        s"ESACCI_Biomass_L4_AGB_V4_100m_$year.json")
      val base = EventJson.parseAll(Files.readString(cfgFile)).head
      assert(base.cogify && base.discovery == "inventory")

      // prefix carries NO digits: the date cascade scans the whole
      // remote_fileurl, and a temp-dir digit run reads as a bad date
      val dir = Files.createTempDirectory("ccie2e")
      val grids = Map(
        s"S50W070_BIOMASS-100m-$year-fv4.0" ->
          ((300, 200, Seq(-70.0, 0.1, 0.0, -50.0, 0.0, -0.1))),
        s"N00E010_BIOMASS-100m-$year-fv4.0" ->
          ((280, 140, Seq(10.0, 0.05, 0.0, 0.0, 0.0, -0.05))))
      val sourceData = grids.map { case (stem, (w, h, transform)) =>
        val data = Array.tabulate(w * h)(i => ((i * 13) % 997).toFloat)
        // source tiles are 64px: the cogify stage must RE-tile to 256
        Files.write(dir.resolve(s"$stem.tif"), GeoTiffWriter.write(
          w, h, data, GeoTiffWriter.Geo(transform, 4326),
          fill = Some(-9999.0), tileSize = 64))
        stem -> data
      }
      val csv = dir.resolve("inventory.csv")
      Files.writeString(csv, "s3_path\n" +
        grids.keys.toSeq.sorted.map(s => s"$dir/$s.tif\n").mkString)

      // the real config, pointed at local fixtures; upload=false keeps
      // the COG path local so the bytes can be independently re-read
      val ev = base.copy(inventoryUrl = Some(csv.toString),
        upload = false)
      val r = Runner.run(spark, ev,
        Runner.RunContext(cogifyTransform = new Cogify.RasterCogTransform()))
      assert(r.quarantined.isEmpty, s"$year: quarantined rows")
      val items = r.items.collect()
      assert(items.length == 2, s"$year: expected 2 items")

      items.foreach { item =>
        val id = item.getString(item.fieldIndex("id"))
        val (w, h, transform) = grids(id)
        val assets = item.getMap[String, org.apache.spark.sql.Row](
          item.fieldIndex("assets"))
        assert(assets.keySet == Set(base.assetName.getOrElse("tif")))
        val cogPath = assets.values.head.getAs[String]("href")
        val cogBytes = Files.readAllBytes(Paths.get(cogPath))
        // independent S5 re-parse of the produced COG
        val m = GeoTiff.parse(cogBytes).fold(e => fail(s"$id: $e"), identity)
        assert(m.width == w && m.height == h)
        assert(m.tileWidth.contains(256L) && m.tileHeight.contains(256L))
        assert(m.epsg.contains(4326))
        assert(m.transform.contains(transform))
        assert(m.nodata.contains(-9999.0))
        // pixel data survives the re-tile bit-exactly
        val (_, decoded) = GeoTiff.readSamples(cogBytes)
          .fold(e => fail(s"$id: $e"), identity)
        assert(decoded.toSeq == sourceData(id).toSeq)
        // filename year -> single datetime (the cascade's exact-year
        // branch), like the reference's extract_dates
        assert(item.getTimestamp(item.fieldIndex("datetime"))
          .toString.startsWith(s"$year-01-01"))
      }

      // STAC enrichment carries the S5-parsed proj fields into items
      // (binaryFile paths are file:-prefixed; hrefs are plain local)
      import spark.implicits._
      val media = graft.llm.Multimodal.readMedia(spark, s"file://$dir",
        glob = "*.tif")
      val scans = GeoTiff.scanMetadata(media)
        .map(s => s.copy(path = s.path.stripPrefix("file:")))
      val enriched = graft.operators.StacBuilder.enrichWithRaster(
        r.items, scans)
      val byId = enriched.select(col("id"), col("properties")).collect()
        .map(x => x.getString(0) -> x.getMap[String, String](1)).toMap
      grids.foreach { case (stem, (w, h, transform)) =>
        val p = byId(stem)
        assert(p("proj:epsg") == "4326")
        assert(p("proj:shape") == s"$h,$w")
        assert(p("proj:transform") ==
          transform.map(_.toString).mkString(","))
        assert(p("raster:bits_per_sample") == "32")
      }
    }
  }

  test("corpus sweep: every shipped config runs end-to-end on fixtures") {
    // Each of the 28 production configs through the FULL Runner with
    // per-config fixture data (the reference's de-facto integration
    // suite, SURVEY §5): inventory configs get a CSV of date-carrying
    // paths; cmr configs get a granule catalog whose filenames satisfy
    // the config's data_file_regex. Asserted per config: zero
    // quarantine, exact item count, and the required STAC fields.
    assume(Files.isDirectory(corpusDir), "reference corpus not present")
    import graft.pipeline.Runner
    import graft.sources.Cmr
    import org.apache.spark.sql.functions.col

    // multi-asset configs: a stem matching the config's
    // data_file_regex + suffixes with exactly ONE data_file row
    val multiAsset: Map[String, (String, Seq[String])] = Map(
      "ABoVE_UAVSAR_PALSAR" ->
        (("padelE_12043_16008_140_160225_L090_CX_01",
          Seq("_hgt.tif", ".ann", ".kmz"))),
      "AfriSAR_UAVSAR_Coreg_SLC" ->
        (("uavsar_AfriSAR_v1_SLC-topo_14043_16008_140_160225_L090",
          Seq("_coreg_HH.slc", ".vrt"))),
      "AfriSAR_UAVSAR_Geocoded_Covariance" ->
        (("uavsar_AfriSAR_v1-geo_14043_16008_140_009_160225",
          Seq("_cov_1-1.hdr", "_cov_1-1.bin"))),
      "AfriSAR_UAVSAR_Geocoded_SLC" ->
        (("uavsar_AfriSAR_v1_topo_14043_16008_140_160225",
          Seq("_L090HH_CX_01_mag_geo.hdr", ".bin"))),
      "AfriSAR_UAVSAR_KZ" ->
        (("uavsar_AfriSAR_v1-coreg_14043_16008_140_009_160225_kz",
          Seq(".hdr", ".bin", ".vrt"))),
      "AfriSAR_UAVSAR_Ungeocoded_Covariance" ->
        (("uavsar_AfriSAR_v1-ungeo_14043_16008_140_009_160225",
          Seq("_cov_1-1.hdr", "_cov_1-1.bin"))),
      "AfriSAR_UAVSAR_Normalization_Area" ->
        (("uavsar_AfriSAR_v1-normFactor_a41_r9",
          Seq(".hdr", ".bin"))))

    def checkItems(src: String, items: Array[org.apache.spark.sql.Row],
                   expected: Int, collection: String): Unit = {
      assert(items.length == expected,
        s"$src: ${items.length} items, expected $expected")
      items.foreach { it =>
        assert(it.getString(it.fieldIndex("id")).nonEmpty, s"$src: empty id")
        assert(it.getString(it.fieldIndex("collection")) == collection,
          s"$src: wrong collection")
        assert(!it.isNullAt(it.fieldIndex("datetime")) ||
          !it.isNullAt(it.fieldIndex("start_datetime")),
          s"$src: no datetime")
        assert(!it.isNullAt(it.fieldIndex("assets")) &&
          it.getMap[String, Any](it.fieldIndex("assets")).nonEmpty,
          s"$src: empty assets")
      }
    }

    def runInventory(src: String, ev: graft.model.PipelineEvent): Unit = {
      val dir = Files.createTempDirectory("corpusinv")
      // ESACCI-shaped names for the cogify configs (proved by the
      // dedicated bytes test above); ISO-dated names elsewhere so the
      // extract_dates cascade lands on its first strategy
      val names =
        if (ev.cogify)
          Seq("S50W070_BIOMASS-100m-2017-fv4.0.tif",
            "N00E010_BIOMASS-100m-2017-fv4.0.tif")
        else Seq("tileA_2019-06-15.tif", "tileB_2019-07-15.tif")
      val metaCol = ev.metadataFileUrlKey
      val header = (Seq(ev.fileUrlKey) ++ metaCol).mkString(",")
      val rows = names.map { n =>
        (Seq(s"$dir/$n") ++
          metaCol.map(_ => s"$dir/$n.meta")).mkString(",")
      }
      val csv = dir.resolve("inventory.csv")
      Files.writeString(csv, header + "\n" + rows.mkString("\n") + "\n")
      val r = Runner.run(spark,
        ev.copy(inventoryUrl = Some(csv.toString), upload = false))
      assert(r.quarantined.isEmpty, s"$src: quarantined rows")
      val items = r.items.collect()
      checkItems(src, items, names.size, ev.collection)
      // configured metadata columns surface as a typed asset
      metaCol.foreach { _ =>
        val t = ev.metadataType.get
        items.foreach(it => assert(
          it.getMap[String, Any](it.fieldIndex("assets")).contains(t),
          s"$src: missing '$t' metadata asset"))
      }
    }

    def runCmr(src: String, ev: graft.model.PipelineEvent): Unit = {
      val (files, expected) = multiAsset.get(src) match {
        case Some((stem, sufs)) => (sufs.map(stem + _), 1)
        case None => (Seq("granuleA.tif", "granuleB.tif"), 2)
      }
      val granuleJson = files.zipWithIndex.map { case (f, i) =>
        s"""{"id": "G$i-$src", "title": "$f",
           |"time_start": "2020-01-15T00:00:00.000Z",
           |"time_end": "2020-01-15T23:59:59.000Z",
           |"updated": "2020-02-01T00:00:00.000Z",
           |"dataset_id": "$src", "data_center": "TEST",
           |"collection_concept_id": "C0-TEST",
           |"boxes": ["-2.0 9.1 0.6 11.8"],
           |"links": [{"rel": "http://esipfed.org/ns/fedsearch/1.1/s3#",
           |"href": "s3://data/corpus/$f", "hreflang": "en-US"}]}"""
          .stripMargin
      }.mkString("[", ",\n", "]")
      val gf = Files.createTempFile("granules", ".json")
      Files.writeString(gf, granuleJson)
      val granules = Cmr.granulesFromJson(spark, gf.toString)
      val r = Runner.run(spark, ev,
        Runner.RunContext(granules = Some(granules)))
      assert(r.quarantined.isEmpty, s"$src: quarantined rows")
      val items = r.items.collect()
      checkItems(src, items, expected, ev.collection)
      // granule time drives datetime on the cmr path
      items.foreach(it => assert(
        it.getTimestamp(it.fieldIndex("datetime"))
          .toString.startsWith("2020-01-15"), s"$src: wrong datetime"))
      // bbox carried from the granule boxes
      items.foreach(it => assert(!it.isNullAt(it.fieldIndex("bbox")),
        s"$src: no bbox"))
    }

    val files = Files.list(corpusDir).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
    assert(files.size == 28)
    files.foreach { f =>
      val src = f.getFileName.toString.stripSuffix(".json")
      EventJson.parseAll(Files.readString(f)).foreach { ev =>
        ev.discovery match {
          case "inventory" => runInventory(src, ev)
          case "cmr" => runCmr(src, ev)
          case other => fail(s"$src: unexpected discovery $other")
        }
      }
    }
  }

  test("all reference collection docs load, validate, and broadcast-join") {
    val dir = Paths.get("/root/reference/data/collections")
    assume(Files.isDirectory(dir), "reference corpus not present")
    val nFiles = Files.list(dir).iterator().asScala
      .count(_.toString.endsWith(".json"))
    val cols = graft.sources.Collections.load(spark, dir.toString)
    assert(cols.count() == nFiles && nFiles >= 31)
    val validity = graft.sources.Collections.withValidity(cols)
    import org.apache.spark.sql.functions.col
    assert(validity.filter(!col("valid")).count() == 0,
      "reference collection doc failed validation")
    // ids unique; the J2 dimension join finds every collection
    assert(cols.select("id").distinct().count() == nFiles)
    import spark.implicits._
    val items = cols.select(col("id").as("collection"))
      .withColumn("item_id", col("collection"))
    val joined = graft.sources.Collections.joinItems(items, cols)
    assert(joined.filter(col("collection_title").isNull).count() == 0)
  }
}
