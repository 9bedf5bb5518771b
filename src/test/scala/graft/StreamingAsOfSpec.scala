package graft

import graft.streaming.StreamingAsOf
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming as-of enrichment: latest reference row per key carried
  * across micro-batches with O(keys) state. */
class StreamingAsOfSpec extends SparkSuite {

  test("streaming: events enrich with the latest reference seen so " +
    "far; reference updates across batches take effect; unseen keys " +
    "stay null") {
    val inDir = Files.createTempDirectory("sao-in").toString
    val ckpt = Files.createTempDirectory("sao-ckpt").toString
    // batch 1: price for A + trade on A (same batch, price first by
    //          event time) and trade on B (no price yet)
    // batch 2: new price for A, then a later trade on A uses it
    val files = Seq(
      "b1.json" ->
        ("""{"kind":"ref","sym":"A","ts":"2024-01-01T10:00:00Z","px":10.0,"id":0}""" + "\n" +
          """{"kind":"ev","sym":"A","ts":"2024-01-01T10:05:00Z","px":null,"id":1}""" + "\n" +
          """{"kind":"ev","sym":"B","ts":"2024-01-01T10:06:00Z","px":null,"id":2}"""),
      "b2.json" ->
        ("""{"kind":"ref","sym":"A","ts":"2024-01-01T11:00:00Z","px":12.5,"id":0}""" + "\n" +
          """{"kind":"ev","sym":"A","ts":"2024-01-01T11:30:00Z","px":null,"id":3}""" + "\n" +
          """{"kind":"ev","sym":"A","ts":null,"px":null,"id":4}"""))
    files.zipWithIndex.foreach { case ((name, content), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(3000000L + i * 60000))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("kind",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("sym",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("px",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val events = stream.filter(col("kind") === "ev")
      .select(col("sym"), col("ts"), col("id"))
    val reference = stream.filter(col("kind") === "ref")
      .select(col("sym"), col("ts"), col("px"))
    // no stateTtl: processing-time timers keep AvailableNow re-triggering
    val enriched = StreamingAsOf.enrichLatest(events, reference,
      keyCol = "sym", timeCol = "ts")
    succeed(enriched, ckpt)
  }

  private def succeed(enriched: org.apache.spark.sql.DataFrame,
                      ckpt: String) = {
    val q = enriched.writeStream
      .format("memory").queryName("sao_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val rows = spark.sql(
      "SELECT id, px FROM sao_out ORDER BY id")
      .collect().map(r =>
        (r.getLong(0), if (r.isNullAt(1)) -1.0 else r.getDouble(1)))
    // trade 1: A priced 10.0 (same batch, earlier event time);
    // trade 2: B unseen -> null; trade 3: A repriced 12.5 in batch 2;
    // trade 4: null event time never matches despite carried state
    assert(rows.toSeq ==
      Seq((1L, 10.0), (2L, -1.0), (3L, 12.5), (4L, -1.0)))
  }
}
