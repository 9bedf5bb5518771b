package graft

import graft.model.PipelineEvent
import graft.operators.{Publish, StacBuilder}
import graft.streaming.Publication
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** K4/K6/T2/T4 + the micro-batched publication path (T1). */
class PublicationSpec extends SparkSuite {
  import spark.implicits._

  private def objs(urls: String*) = urls.toSeq.toDF("remote_fileurl")
    .withColumn("collection", lit("c"))
    .withColumn("properties", lit(null).cast("map<string,string>"))
    .withColumn("product_id", lit(null).cast("string"))
    .withColumn("assets", lit(null).cast("map<string,string>"))
    .withColumn("upload", lit(false))
    .withColumn("user_shared", lit(false))
    .withColumn("ingest", lit(true))
    .withColumn("cogify", lit(false))
    .withColumn("granule_id", lit(null).cast("string"))
    .withColumn("attempt", lit(0))
    .withColumn("extra", lit(null).cast("map<string,string>"))

  test("api sink: permanent failures don't retry, retryable do (T4)") {
    val ev = PipelineEvent(collection = "c")
    val items = StacBuilder.regexItems(objs("s3://b/f_2020.tif"), ev)
      .drop("datetime_error")
    val attempts = new java.util.concurrent.atomic.AtomicInteger()
    object FlakySubmitter extends Publish.Submitter {
      def submit(j: String): Unit = {
        if (attempts.incrementAndGet() < 3)
          throw new Publish.RetryableFailure("transient")
      }
    }
    val res = Publish.toApi(items, FlakySubmitter, maxAttempts = 3).collect()
    assert(res.forall(_.ok) && res.head.attempts == 3)

    object PermanentSubmitter extends Publish.Submitter {
      def submit(j: String): Unit =
        throw new IllegalStateException("permanent")
    }
    val res2 = Publish.toApi(items, PermanentSubmitter, maxAttempts = 5)
      .collect()
    assert(!res2.head.ok && res2.head.attempts == 1) // no retry burned
  }

  /** Loopback Cognito-style token endpoint + ingestor. The ingestor
    * returns 401 for any token the token endpoint has since superseded
    * — the deterministic stand-in for mid-partition token expiry. */
  private def withOAuthServers(expireAfterUses: Int)(
      body: (Publish.OAuthSubmitter,
             java.util.concurrent.atomic.AtomicInteger,
             java.util.concurrent.atomic.AtomicInteger) => Unit): Unit = {
    val tokenFetches = new java.util.concurrent.atomic.AtomicInteger()
    val ingestPosts = new java.util.concurrent.atomic.AtomicInteger()
    val tokenUses = new java.util.concurrent.atomic.AtomicInteger()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    def respond(x: com.sun.net.httpserver.HttpExchange, status: Int,
                body: String): Unit = {
      val b = body.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      x.sendResponseHeaders(status, b.length)
      val os = x.getResponseBody; os.write(b); os.close()
    }
    server.createContext("/oauth2/token",
      (x: com.sun.net.httpserver.HttpExchange) => {
        val form = new String(x.getRequestBody.readAllBytes())
        val auth = Option(
          x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        val okAuth = auth == "Basic " +
          java.util.Base64.getEncoder.encodeToString("cid:csecret".getBytes)
        if (!okAuth || !form.contains("grant_type=client_credentials"))
          respond(x, 400, """{"error":"invalid_client"}""")
        else {
          val n = tokenFetches.incrementAndGet()
          tokenUses.set(0)
          respond(x, 200,
            s"""{"access_token":"tok-$n","expires_in":3600,"token_type":"Bearer"}""")
        }
      })
    server.createContext("/ingestions",
      (x: com.sun.net.httpserver.HttpExchange) => {
        ingestPosts.incrementAndGet()
        val auth = Option(
          x.getRequestHeaders.getFirst("Authorization")).getOrElse("")
        val current = s"bearer tok-${tokenFetches.get()}"
        if (auth != current) respond(x, 401, """{"detail":"expired"}""")
        else if (tokenUses.incrementAndGet() > expireAfterUses)
          respond(x, 401, """{"detail":"token expired mid-partition"}""")
        else respond(x, 201, """{"status":"queued"}""")
      })
    server.start()
    val base = s"http://127.0.0.1:${server.getAddress.getPort}"
    try body(new Publish.OAuthSubmitter(s"$base/oauth2/token", "cid",
      "csecret", "ingest/write", s"$base/ingestions"),
      tokenFetches, ingestPosts)
    finally server.stop(0)
  }

  test("oauth submitter: one token fetch serves a whole partition (K4)") {
    withOAuthServers(expireAfterUses = Int.MaxValue) {
      (submitter, tokenFetches, _) =>
        val ev = PipelineEvent(collection = "c")
        val items = StacBuilder.regexItems(
          objs((1 to 6).map(i => s"s3://b/f${i}_2020.tif"): _*), ev)
          .drop("datetime_error").repartition(1)
        val res = Publish.toApi(items, submitter, maxAttempts = 2).collect()
        assert(res.length == 6 && res.forall(_.ok))
        // client-credentials flow ran exactly once, not per item
        assert(tokenFetches.get() == 1)
    }
  }

  test("oauth submitter: token expiry mid-partition re-auths and succeeds") {
    withOAuthServers(expireAfterUses = 2) {
      (submitter, tokenFetches, _) =>
        val ev = PipelineEvent(collection = "c")
        val items = StacBuilder.regexItems(
          objs((1 to 5).map(i => s"s3://b/g${i}_2020.tif"): _*), ev)
          .drop("datetime_error").repartition(1)
        val res = Publish.toApi(items, submitter, maxAttempts = 2).collect()
        // every item lands: 401s surface as retryable, the cached token
        // is dropped, and the retry re-authenticates
        assert(res.length == 5 && res.forall(_.ok))
        assert(tokenFetches.get() > 1)
        assert(res.exists(_.attempts == 2)) // at least one re-auth retry
    }
  }

  test("oauth submitter: bad client credentials are a permanent failure") {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/oauth2/token",
      (x: com.sun.net.httpserver.HttpExchange) => {
        val b = """{"error":"invalid_client"}""".getBytes
        x.sendResponseHeaders(400, b.length)
        val os = x.getResponseBody; os.write(b); os.close()
      })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val sub = new Publish.OAuthSubmitter(s"$base/oauth2/token", "cid",
        "wrong", "s", s"$base/ingestions")
      val ev = PipelineEvent(collection = "c")
      val items = StacBuilder.regexItems(objs("s3://b/h_2020.tif"), ev)
        .drop("datetime_error")
      val res = Publish.toApi(items, sub, maxAttempts = 5).collect()
      assert(!res.head.ok && res.head.attempts == 1) // no retry burned
      assert(res.head.error.contains("400"))
    } finally server.stop(0)
  }

  test("dry-run sink submits nothing (K6)") {
    val ev = PipelineEvent(collection = "c")
    val items = StacBuilder.regexItems(objs("s3://b/f_2020.tif"), ev)
      .drop("datetime_error")
    object Exploding extends Publish.Submitter {
      def submit(j: String): Unit = throw new RuntimeException("boom")
    }
    val res = Publish.toApi(items, Exploding, dryRun = true).collect()
    assert(res.forall(_.ok) && res.forall(_.attempts == 0))
  }

  test("publication batch: good rows -> catalog, undateable -> retry -> DLQ (T2)") {
    val ev = PipelineEvent(collection = "c")
    val inDir = Files.createTempDirectory("in").toString
    val catalog = Files.createTempDirectory("cat").toString + "/t"
    val dlq = Files.createTempDirectory("dlq").toString + "/q"
    val batch = objs("s3://b/good_2020.tif", "s3://b/nodate.tif")
    Publication.processBatch(batch, ev, inDir, catalog, dlq,
      maxAttempts = 2)
    // good item landed in the collection-partitioned catalog
    val cat = spark.read.parquet(catalog)
    assert(cat.count() == 1 &&
      cat.select("id").collect().head.getString(0) == "good_2020")
    // bad row re-enqueued with attempt=1
    val retry = spark.read.schema(graft.model.Schemas.fileObj).json(inDir)
    assert(retry.count() == 1 &&
      retry.select("attempt").collect().head.getInt(0) == 1)
    // second failure crosses maxAttempts -> quarantine (a distinct
    // micro-batch: its own batch id, like the streaming path passes)
    Publication.processBatch(retry, ev, inDir, catalog, dlq,
      maxAttempts = 2, batchId = 1L)
    val dead = spark.read.json(dlq)
    assert(dead.count() == 1)
  }

  test("rows missing remote_fileurl route to retry/DLQ, not a crash") {
    // the reference's pydantic ValidationError (events.py:12-53,
    // test_handler.py:92-101) — here the row takes the failure path
    val ev = PipelineEvent(collection = "c")
    val inDir = Files.createTempDirectory("in3").toString
    val catalog = Files.createTempDirectory("cat3").toString + "/t"
    val dlq = Files.createTempDirectory("dlq3").toString + "/q"
    val batch = objs("s3://b/good_2020.tif")
      .unionByName(objs("ignored")
        .withColumn("remote_fileurl", lit(null).cast("string")))
    Publication.processBatch(batch, ev, inDir, catalog, dlq,
      maxAttempts = 2)
    assert(spark.read.parquet(catalog).count() == 1)
    val retry = spark.read.schema(graft.model.Schemas.fileObj).json(inDir)
    val r = retry.collect()
    assert(r.length == 1 &&
      r.head.isNullAt(r.head.fieldIndex("remote_fileurl")))
  }

  test("pre-existing start/end_datetime props are overwritten, not an error") {
    val ev = PipelineEvent(collection = "c")
    val row = objs("s3://b/f_2020-01-01_2020-02-01.tif")
      .withColumn("properties", map(
        lit("start_datetime"), lit("STALE"), lit("other"), lit("kept")))
    val props = StacBuilder.regexItems(row, ev).select("properties")
      .collect().head.getMap[String, String](0)
    assert(props("other") == "kept")
    assert(props("start_datetime") == "2020-01-01T00:00:00Z")
    assert(props("end_datetime") == "2020-02-01T00:00:00Z")
  }

  test("failed rows with NULL item_id still reach retry, not dropped") {
    // id_regex matches nothing -> itemId is NULL for every row; the
    // undateable row must still be re-enqueued (ADVICE r2 regression).
    val ev = PipelineEvent(collection = "c",
      idRegex = Some("NEVER-MATCHES-(\\d{99})"))
    val inDir = Files.createTempDirectory("in2").toString
    val catalog = Files.createTempDirectory("cat2").toString + "/t"
    val dlq = Files.createTempDirectory("dlq2").toString + "/q"
    val batch = objs("s3://b/good_2020.tif", "s3://b/nodate.tif")
    Publication.processBatch(batch, ev, inDir, catalog, dlq,
      maxAttempts = 2)
    // dateable row landed (with NULL id), undateable row re-enqueued
    assert(spark.read.parquet(catalog).count() == 1)
    val retry = spark.read.schema(graft.model.Schemas.fileObj).json(inDir)
    val r = retry.collect()
    assert(r.length == 1 &&
      r.head.getString(r.head.fieldIndex("remote_fileurl"))
        == "s3://b/nodate.tif")
  }

  test("micro-batch replay is idempotent: re-running the same batch id " +
    "rewrites its partitions instead of appending duplicates") {
    val ev = PipelineEvent(collection = "c")
    val inDir = Files.createTempDirectory("in4").toString
    val catalog = Files.createTempDirectory("cat4").toString + "/t"
    val dlq = Files.createTempDirectory("dlq4").toString + "/q"
    val batch = objs("s3://b/good_2020.tif", "s3://b/nodate.tif")
      .withColumn("attempt", org.apache.spark.sql.functions.lit(1))
    // the at-least-once crash-replay: same batch, same id, twice
    Publication.processBatch(batch, ev, inDir, catalog, dlq,
      maxAttempts = 2, batchId = 7L)
    Publication.processBatch(batch, ev, inDir, catalog, dlq,
      maxAttempts = 2, batchId = 7L)
    assert(spark.read.parquet(catalog).count() == 1,
      "replayed batch duplicated catalog items")
    assert(spark.read.json(dlq).count() == 1,
      "replayed batch duplicated quarantine rows")
  }
}
