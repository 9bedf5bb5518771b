package graft

import graft.model.PipelineEvent
import graft.sources.Discovery
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S1/S2/P1/P3/P4 — discovery sources against local fixtures. */
class DiscoverySpec extends SparkSuite {

  test("inventory CSV scan: file_url_key pluck, regex filter, metadata asset") {
    val csv = Files.createTempFile("inv", ".csv")
    Files.writeString(csv,
      """s3_path,md_path,other
        |s3://b/data/file_2020.tif,s3://b/md/file_2020.xml,x
        |s3://b/data/skip_2020.dat,s3://b/md/skip.xml,y
        |s3://b/data/file_2021.tif,s3://b/md/file_2021.xml,z
        |""".stripMargin)
    val ev = PipelineEvent(
      collection = "col1", discovery = "inventory",
      inventoryUrl = Some(csv.toString),
      filenameRegex = Some(".*\\.tif$"),
      metadataFileUrlKey = Some("md_path"),
      metadataType = Some("xml"),
      upload = true, cogify = true)
    val objs = Discovery.inventory(spark, ev).orderBy("remote_fileurl")
    val rows = objs.collect()
    assert(rows.length == 2)
    val r = rows.head
    assert(r.getString(r.fieldIndex("collection")) == "col1")
    assert(r.getString(r.fieldIndex("remote_fileurl")) ==
      "s3://b/data/file_2020.tif")
    assert(r.getBoolean(r.fieldIndex("upload")))
    assert(r.getBoolean(r.fieldIndex("cogify")))
    // product_id = stem (inventory/handler.py:72)
    assert(r.getString(r.fieldIndex("product_id")) == "file_2020")
    assert(r.getMap[String, String](r.fieldIndex("assets")) ==
      Map("xml" -> "s3://b/md/file_2020.xml"))
  }

  test("anchored regex: re.match semantics (anchors at start, not full)") {
    import spark.implicits._
    val df = Seq("abc/file.tif", "xabc/file.tif").toDF("k")
    val got = df.filter(Discovery.anchoredMatch(col("k"), "abc/.*"))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("abc/file.tif")) // no substring match
  }

  test("listing scan: partition-parallel enumeration + key regex filter") {
    val root = Files.createTempDirectory("bucket")
    Files.createDirectories(root.resolve("pre/fix"))
    Files.writeString(root.resolve("pre/fix/a_2020.tif"), "A")
    Files.writeString(root.resolve("pre/fix/b_2020.dat"), "B")
    val ev = PipelineEvent(
      collection = "lcol", discovery = "s3",
      bucket = Some(s"file://$root"), prefix = "pre",
      filenameRegex = Some(".*\\.tif$"))
    val objs = Discovery.listing(spark, ev)
    val rows = objs.collect()
    assert(rows.length == 1)
    assert(rows.head.getString(rows.head.fieldIndex("remote_fileurl"))
      .endsWith("pre/fix/a_2020.tif"))
  }

  test("asset passthrough lands in the extra map (P4)") {
    val ev = PipelineEvent(collection = "c",
      assetName = Some("data"),
      assetMediaTypeScalar = Some("image/tiff"))
    val m = Discovery.assetPassthrough(ev)
    assert(m == Map("asset_name" -> "data",
      "asset_media_type" -> "image/tiff"))
  }

  test("anchoredMatch anchors the WHOLE pattern: a top-level " +
    "alternation must not match mid-string (re.match semantics)") {
    import spark.implicits._
    val got = Seq("foo_x.dat", "data/foo_x.dat", "tif", "a.tif")
      .toDF("k")
      .filter(graft.sources.Discovery.anchoredMatch(col("k"), "tif$|foo_.*"))
      .collect().map(_.getString(0)).toSet
    // bare "^tif$|foo_.*" would anchor only the first branch and let
    // "data/foo_x.dat" through (wrong file discovered and ingested)
    assert(got === Set("foo_x.dat", "tif"))
  }
}
