package graft

import graft.model.PipelineEvent
import graft.sources.Cmr
import graft.sources.dsv2.CmrPagesScan
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** S3 at scale: partition-per-page CMR source + page-limit pruning. */
class CmrPagesSpec extends SparkSuite {

  private def granule(i: Int): String =
    s"""{"id":"G$i","title":"g$i.hdr","time_start":"2020-01-0${i % 9 + 1}T00:00:00Z",
       |"links":[{"rel":"http://esipfed.org/ns/fedsearch/1.1/s3#",
       |"href":"s3://store/g$i.hdr"}]}""".stripMargin.replace("\n", "")

  private def writePages(nPages: Int, perPage: Int): String = {
    val dir = Files.createTempDirectory("cmr-pages").toString
    (1 to nPages).foreach { p =>
      val ids = ((p - 1) * perPage + 1) to (p * perPage)
      Files.writeString(
        java.nio.file.Paths.get(dir, f"page-$p%03d.json"),
        ids.map(granule).mkString("[", ",", "]"))
    }
    dir
  }

  test("every page is one input partition; granules decode in parallel") {
    val dir = writePages(nPages = 3, perPage = 4)
    val raw = spark.read.format("graft-cmr-pages").load(dir)
    assert(raw.rdd.getNumPartitions == 3)
    assert(raw.count() == 12)
    assert(raw.select(countDistinct(col("page"))).collect().head
      .getLong(0) == 3)
    val granules = Cmr.pagedGranules(spark, dir)
    assert(granules.count() == 12)
    val g1 = granules.filter(col("id") === "G5")
      .select(element_at(col("links"), 1).getField("href")).collect()
    assert(g1.head.getString(0) == "s3://store/g5.hdr")
  }

  test("pushed limit prunes whole pages at planning time (W4)") {
    val dir = writePages(nPages = 5, perPage = 2)
    // ceil(3 / 2) = 2 pages + one under-filled-page safety page
    assert(new CmrPagesScan(dir, 2, Some(3)).planInputPartitions()
      .length == 3)
    assert(new CmrPagesScan(dir, 2, None).planInputPartitions()
      .length == 5)
    // and through the SQL layer the limit still holds
    val limited = spark.read.format("graft-cmr-pages")
      .option("page_size", 2).load(dir).limit(3)
    assert(limited.count() == 3)
  }

  test("Runner.run drives cmr discovery straight from the paged source") {
    val dir = writePages(nPages = 2, perPage = 3)
    val ev = PipelineEvent(collection = "c", discovery = "cmr", limit = 3)
    val res = graft.pipeline.Runner.run(spark, ev,
      graft.pipeline.Runner.RunContext(granulePagesDir = Some(dir)))
    assert(res.items.count() == 6)
    assert(res.quarantined.isEmpty)
    assert(res.items.select("id").collect().map(_.getString(0)).sorted
      .head == "g1")
  }

  test("paged granules feed the CMR discovery path end to end") {
    val dir = writePages(nPages = 2, perPage = 3)
    val ev = PipelineEvent(collection = "c", discovery = "cmr")
    val objs = Cmr.discover(Cmr.pagedGranules(spark, dir), ev)
    assert(objs.count() == 6)
    assert(objs.select("remote_fileurl").collect()
      .map(_.getString(0)).forall(_.startsWith("s3://store/g")))
  }
}
