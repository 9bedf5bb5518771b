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

  /** Loopback `search/granules.json` fixture: pages a granule list with
    * `page_num`/`page_size`, reports the total in `CMR-Hits` — the live
    * CMR contract (`cmr-query/handler.py:128-145`). Records every
    * request's Authorization header and page params. */
  private def withCmrServer(total: Int)(
      body: (String, java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, String)]) => Unit)
  : Unit = {
    val requests =
      new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, String)]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/search/granules.json",
      (exchange: com.sun.net.httpserver.HttpExchange) => {
        val q = Option(exchange.getRequestURI.getRawQuery).getOrElse("")
        val params = q.split("&").filter(_.contains("="))
          .map { kv => val a = kv.split("=", 2); a(0) -> a(1) }.toMap
        val ps = params.getOrElse("page_size", "100").toInt
        val pn = params.getOrElse("page_num", "1").toInt
        val auth = Option(
          exchange.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        requests.add((pn, ps, auth))
        val ids = ((pn - 1) * ps + 1) to math.min(pn * ps, total)
        val entries = if (ids.isEmpty) "" else ids.map(granule).mkString(",")
        val bytes = s"""{"feed":{"entry":[$entries]}}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        exchange.getResponseHeaders.add("CMR-Hits", total.toString)
        exchange.sendResponseHeaders(200, bytes.length)
        val os = exchange.getResponseBody
        os.write(bytes); os.close()
      })
    server.start()
    try body(
      s"http://127.0.0.1:${server.getAddress.getPort}/search/granules.json" +
        "?short_name=C1&version=1", requests)
    finally server.stop(0)
  }

  test("HTTP page store: CMR-Hits planning, per-partition GET, auth header") {
    withCmrServer(total = 25) { (url, requests) =>
      val df = spark.read.format("graft-cmr-pages")
        .option("page_size", 10).option("token", "tok123").load(url)
      assert(df.rdd.getNumPartitions == 3) // ceil(25 / 10) via CMR-Hits
      assert(df.count() == 25)
      // every request carried the bearer token (probe + 3 pages)
      import scala.jdk.CollectionConverters._
      assert(requests.asScala.nonEmpty)
      assert(requests.asScala.forall(_._3 == "Bearer tok123"))
      // the hits probe is a page_size=1 request; data pages are size 10
      assert(requests.asScala.exists(r => r._2 == 1 && r._1 == 1))
      assert(requests.asScala.count(_._2 == 10) >= 3)
    }
  }

  test("HTTP page store: granules decode and feed CMR discovery") {
    withCmrServer(total = 7) { (url, _) =>
      val granules = Cmr.pagedGranules(spark, url, pageSize = 3)
      assert(granules.count() == 7)
      val objs = Cmr.discover(granules,
        PipelineEvent(collection = "c", discovery = "cmr"))
      assert(objs.count() == 7)
      assert(objs.select("remote_fileurl").collect()
        .map(_.getString(0)).forall(_.startsWith("s3://store/g")))
    }
  }

  test("HTTP page store: pushed limit prunes page fetches") {
    withCmrServer(total = 50) { (url, requests) =>
      val limited = spark.read.format("graft-cmr-pages")
        .option("page_size", 10).load(url).limit(5)
      assert(limited.count() == 5)
      import scala.jdk.CollectionConverters._
      // ceil(5/10) = 1 page + 1 safety page fetched — never all 5 pages
      val dataPages = requests.asScala.filter(_._2 == 10).map(_._1).toSet
      assert(dataPages == Set(1, 2), s"fetched pages $dataPages")
    }
  }
}
