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

  test("batch-mode fold agrees with the batch Cdc operator, " +
    "including full-version ties broken on the payload") {
    import spark.implicits._
    val ts1 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2025-01-02 00:00:00")
    // key 4: two upserts with IDENTICAL (ts, seq) but different
    // payloads — both operators must pick the greater payload ("zz")
    val chg = Seq(
      (1L, "upsert", ts1, 1L, Some("a2"), Some(11.0)),
      (2L, "delete", ts1, 2L, None, None),
      (3L, "upsert", ts2, 3L, Some("c"), Some(30.0)),
      (4L, "upsert", ts1, 7L, Some("aa"), Some(1.0)),
      (4L, "upsert", ts1, 7L, Some("zz"), Some(2.0))
    ).toDF("k", "op", "ts", "seq", "st", "v")

    for (parts <- Seq(1, 5)) {
      val c = chg.repartition(parts)
      // streaming operator run in BATCH mode (state starts empty, one
      // invocation per key): emits the folded current row per key
      val stream = StreamingUpsert.currentView(c, keyCol = "k")
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1),
          if (r.isNullAt(2)) null else r.getString(2),
          if (r.isNullAt(3)) -1.0 else r.getDouble(3))))
        .toMap
      val emptyBase = Seq.empty[(Long, String, Double)].toDF("k", "st", "v")
      val batch = graft.operators.Cdc.applyChangelog(emptyBase, c, Seq("k"))
        .collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
        .toMap
      // surviving keys agree on values; deleted keys are tombstones
      assert(batch == Map(1L -> (("a2", 11.0)), 3L -> (("c", 30.0)),
        4L -> (("zz", 2.0))))
      assert(stream(1L) == (("upsert", "a2", 11.0)))
      assert(stream(2L) == (("delete", null, -1.0)))
      assert(stream(3L) == (("upsert", "c", 30.0)))
      assert(stream(4L) == (("upsert", "zz", 2.0)), s"parts=$parts")
    }
  }

  test("null op folds as a tombstone instead of poisoning the stream") {
    import spark.implicits._
    val ts1 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2025-01-02 00:00:00")
    val chg = Seq(
      (1L, Some("upsert"), ts1, 1L, Some(1.0)),
      (1L, None, ts2, 2L, Some(2.0)), // later null op wins -> tombstone
      (2L, Some("upsert"), ts1, 3L, Some(3.0))
    ).toDF("k", "op", "ts", "seq", "v")
    val out = StreamingUpsert.currentView(chg, keyCol = "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "delete", 2L -> "upsert"))
  }

  test("array-valued payloads break full-version ties deterministically") {
    import spark.implicits._
    val ts1 = java.sql.Timestamp.valueOf("2025-01-01 00:00:00")
    val chg = Seq(
      (1L, "upsert", ts1, 1L, Seq(1.0f, 9.0f)),
      (1L, "upsert", ts1, 1L, Seq(2.0f, 0.0f)) // greater first element wins
    ).toDF("k", "op", "ts", "seq", "emb")
    for (parts <- Seq(1, 4)) {
      val out = StreamingUpsert.currentView(chg.repartition(parts), "k")
        .collect()
      assert(out.length == 1 &&
        out.head.getAs[scala.collection.Seq[Float]](2).head == 2.0f,
        s"parts=$parts")
    }
  }
}
