package graft

import graft.streaming.StreamingUpsert
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming latest-wins upsert view ([[graft.streaming.StreamingUpsert]]). */
class StreamingUpsertSpec extends SparkSuite {

  test("streaming: later versions win across batches, deletes " +
    "tombstone, stale arrivals and duplicates emit nothing") {
    val inDir = Files.createTempDirectory("sup-in").toString
    val ckpt = Files.createTempDirectory("sup-ckpt").toString
    // b1: k1 v=10, k2 v=20
    // b2: k1 upsert v=11 (newer), k2 delete (newer), k3 new
    // b3: k1 STALE v=99 (older ts — must not emit), k2 duplicate of
    //     the b2 delete (same version — must not emit)
    val files = Seq(
      "b1.json" ->
        ("""{"k":"k1","op":"upsert","ts":"2024-01-01T10:00:00Z","seq":1,"v":10.0}""" + "\n" +
          """{"k":"k2","op":"upsert","ts":"2024-01-01T10:00:00Z","seq":2,"v":20.0}"""),
      "b2.json" ->
        ("""{"k":"k1","op":"upsert","ts":"2024-01-01T11:00:00Z","seq":3,"v":11.0}""" + "\n" +
          """{"k":"k2","op":"delete","ts":"2024-01-01T11:00:00Z","seq":4,"v":null}""" + "\n" +
          """{"k":"k3","op":"upsert","ts":"2024-01-01T11:00:00Z","seq":5,"v":30.0}"""),
      "b3.json" ->
        ("""{"k":"k1","op":"upsert","ts":"2024-01-01T09:00:00Z","seq":0,"v":99.0}""" + "\n" +
          """{"k":"k2","op":"delete","ts":"2024-01-01T11:00:00Z","seq":4,"v":null}"""))
    files.zipWithIndex.foreach { case ((name, content), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(3000000L + i * 60000))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("op",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("seq",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val view = StreamingUpsert.currentView(stream, keyCol = "k")
    val q = view.writeStream
      .format("memory").queryName("sup_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val rows = spark.sql("SELECT k, op, v FROM sup_out ORDER BY k, op")
      .collect().map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(2)) -1.0 else r.getDouble(2)))
    // emissions: b1 -> (k1,up,10),(k2,up,20); b2 -> (k1,up,11),
    // (k2,delete),(k3,up,30); b3 -> nothing (stale + duplicate)
    assert(rows.toSeq.sorted == Seq(
      ("k1", "upsert", 10.0), ("k1", "upsert", 11.0),
      ("k2", "delete", -1.0), ("k2", "upsert", 20.0),
      ("k3", "upsert", 30.0)).sorted)
  }

  test("batch-mode fold agrees with the batch Cdc operator") {
    import spark.implicits._
    val base = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "st", "v")
    val chg = Seq(
      (1L, "upsert", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
        1L, Some("a2"), Some(11.0)),
      (2L, "delete", java.sql.Timestamp.valueOf("2025-01-01 00:00:00"),
        2L, None, None),
      (3L, "upsert", java.sql.Timestamp.valueOf("2025-01-02 00:00:00"),
        3L, Some("c"), Some(30.0))
    ).toDF("k", "op", "ts", "seq", "st", "v")
    val batch = graft.operators.Cdc.applyChangelog(base, chg, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap
    assert(batch == Map(1L -> (("a2", 11.0)), 3L -> (("c", 30.0))))
  }
}
