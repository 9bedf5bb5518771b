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
    // second failure crosses maxAttempts -> quarantine
    Publication.processBatch(retry, ev, inDir, catalog, dlq,
      maxAttempts = 2)
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
}
