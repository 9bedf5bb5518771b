package graft

import graft.llm.{Dedup, Html}
import graft.sources.{Warc, WarcFixtures}
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import java.nio.file.{Files, Paths}

/** End-to-end firehose soak with a mid-stream crash + checkpoint
  * restart: WARC `readStream` → HTML text extraction → near-dup flag
  * against a persisted signature catalog → batch-keyed
  * dynamic-overwrite catalog sink with a quarantine/near-dup DLQ —
  * the full composition whose pieces are individually replay-safe
  * (r12 closed Publication's duplicate-append; this proves the
  * COMPOSITION). The injected failure lands in the worst window:
  * after every sink write of the batch, before the checkpoint
  * commit — so the restart MUST replay the batch, and exactly-once
  * output survives only because both sinks key their writes by
  * `batch=<id>` and dynamic-overwrite their own partitions (the
  * Publication contract). */
class StreamingSoakSpec extends SparkSuite {
  import spark.implicits._

  test("WARC firehose: crash after sink writes, restart from " +
    "checkpoint, exactly-once catalog and DLQ across the replay") {
    val base = Files.createTempDirectory("soak").toString
    val inDir = s"$base/in"
    val outDir = s"$base/catalog"
    val dlqDir = s"$base/dlq"
    val ckpt = s"$base/ckpt"
    Files.createDirectories(Paths.get(inDir))

    val dupText = ("boilerplate fox jumps over the lazy dog " * 8).trim
    // the persisted catalog holds the SAME extracted text the stream
    // will see for doc p2 → p2 must flag as a near-dup of cat-1
    val catSigs = Dedup.signatureCatalog(
      Seq(("cat-1", s"<p>$dupText</p>")).toDF("doc_id", "html")
        .select(col("doc_id"), Html.extractText(col("html")).as("text")),
      "doc_id", "text")
    val buckets = StreamingNearDup.catalogBuckets(catSigs)

    def respWarc(uri: String, body: String): Array[Byte] =
      WarcFixtures.record("response", uri, "2024-01-01T00:00:01Z",
        WarcFixtures.httpBlock(200, "text/html", body))
    def writeFile(name: String, bytes: Array[Byte]): Unit =
      Files.write(Paths.get(inDir, name), bytes)

    @volatile var crashArmed = true
    def sink(batch: DataFrame, batchId: Long): Unit = {
      val docs = batch
        .filter(col("status") === "ok" &&
          col("record_type") === "response")
        .select(col("target_uri").as("doc_id"),
          Html.extractText(col("payload").cast("string")).as("text"))
      val flagged = StreamingNearDup
        .flagAgainstCatalog(docs, "doc_id", "text", buckets,
          threshold = 0.5)
        .select(col("id")).distinct()
      val keep = docs.join(flagged,
        docs("doc_id") === flagged("id"), "left_anti")
      def dynOverwrite[T](w: org.apache.spark.sql.DataFrameWriter[T]) =
        w.mode(SaveMode.Overwrite).option("partitionOverwriteMode", "dynamic")
      if (!keep.isEmpty)
        dynOverwrite(keep.withColumn("batch", lit(batchId)).write)
          .partitionBy("batch").parquet(outDir)
      val dlq = batch.filter(col("status") === "quarantined")
        .select(col("path").as("doc_id"),
          lit("quarantined").as("reason"))
        .unionByName(flagged.select(col("id").as("doc_id"),
          lit("near_dup").as("reason")))
      if (!dlq.isEmpty)
        dynOverwrite(dlq.withColumn("batch", lit(batchId)).write)
          .partitionBy("batch").json(dlqDir)
      if (crashArmed) {
        crashArmed = false
        // the at-least-once window: sinks written, offsets NOT committed
        throw new RuntimeException("injected crash before checkpoint commit")
      }
    }

    def run(): Unit = {
      val q = Warc.readStream(spark, inDir).writeStream
        .trigger(Trigger.AvailableNow())
        .option("checkpointLocation", ckpt)
        .foreachBatch((b: DataFrame, id: Long) => sink(b, id))
        .start()
      q.awaitTermination()
    }

    writeFile("f1.warc", respWarc("https://ex.com/p1",
      "<html><p>alpha unique content one</p></html>"))
    writeFile("f2.warc", respWarc("https://ex.com/p2",
      s"<html><p>$dupText</p></html>"))
    writeFile("fbad.warc", WarcFixtures.brokenWarc())

    // phase A: batch 0 (f1, f2, fbad) writes its outputs, then crashes
    intercept[StreamingQueryException](run())
    // the crashed run DID write: catalog has p1, DLQ has both rows —
    // this is exactly the state a naive append sink would duplicate
    assert(spark.read.parquet(outDir).filter(col("doc_id") ===
      "https://ex.com/p1").count() === 1L)

    // new data arrives while the pipeline is down
    writeFile("f3.warc", respWarc("https://ex.com/p3",
      "<html><p>gamma unique content three</p></html>"))

    // phase B: restart from the checkpoint — batch 0 REPLAYS (same
    // batch id, same files), then f3 processes as the next batch
    run()

    val cat = spark.read.parquet(outDir)
    val byDoc = cat.groupBy("doc_id").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // exactly-once: each kept doc exactly one row, dup never published
    assert(byDoc == Map("https://ex.com/p1" -> 1L,
      "https://ex.com/p3" -> 1L),
      s"catalog rows after replay: $byDoc")
    // the replayed batch kept its original id; f3 landed in a new one
    // partition-column type is re-inferred on read (INT for small ids)
    val batches = cat.select("batch").distinct().collect()
      .map(_.get(0).toString.toLong).toSet
    assert(batches.size == 2, s"expected 2 batch partitions: $batches")

    val dlq = spark.read.json(dlqDir)
    val byReason = dlq.groupBy("reason", "doc_id").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(byReason.keySet ==
      Set(("quarantined", s"file:$inDir/fbad.warc"),
        ("near_dup", "https://ex.com/p2")) ||
      byReason.keySet.map { case (a, b) => (a, b.split("/").last) } ==
        Set(("quarantined", "fbad.warc"), ("near_dup", "p2")),
      s"DLQ contents: ${byReason.keySet}")
    assert(byReason.values.forall(_ == 1L),
      s"DLQ rows duplicated across the replay: $byReason")
  }
}
