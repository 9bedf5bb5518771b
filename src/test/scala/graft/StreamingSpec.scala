package graft

import graft.model.PipelineEvent
import graft.streaming.Publication
import java.nio.file.Files

/** T1 — the real readStream publication path, run with a processing
  * trigger against a file-drop directory. */
class StreamingSpec extends SparkSuite {

  test("readStream drop-dir -> micro-batch -> partitioned catalog") {
    val ev = PipelineEvent(collection = "sc")
    val inDir = Files.createTempDirectory("q-in").toString
    val catalog = Files.createTempDirectory("q-cat").toString + "/t"
    val dlq = Files.createTempDirectory("q-dlq").toString + "/d"
    val ckpt = Files.createTempDirectory("q-ckpt").toString
    Files.writeString(java.nio.file.Paths.get(inDir, "batch1.json"),
      """{"collection":"sc","remote_fileurl":"s3://b/a_2021.tif","upload":false,"user_shared":false,"ingest":true,"cogify":false,"attempt":0}
        |{"collection":"sc","remote_fileurl":"s3://b/b_2022.tif","upload":false,"user_shared":false,"ingest":true,"cogify":false,"attempt":0}
        |""".stripMargin)
    val q = Publication.start(spark, ev, inDir, catalog, dlq, ckpt,
      maxAttempts = 2, triggerInterval = "1 second")
    try {
      val deadline = System.currentTimeMillis() + 60000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        done = try spark.read.parquet(catalog).count() == 2
          catch { case _: Exception => false }
      }
      assert(done, "streamed items did not reach the catalog in time")
      val ids = spark.read.parquet(catalog)
        .select("id").collect().map(_.getString(0)).sorted
      assert(ids.toSeq == Seq("a_2021", "b_2022"))
      // catalog is partitioned by collection (T7)
      assert(Files.exists(java.nio.file.Paths.get(catalog, "collection=sc")))
    } finally q.stop()
  }

  test("streaming inventory discovery: CSV drops become file_obj batches") {
    import org.apache.spark.sql.types._
    val inDir = Files.createTempDirectory("inv-in").toString
    val ckpt = Files.createTempDirectory("inv-ckpt").toString
    Files.writeString(java.nio.file.Paths.get(inDir, "inv1.csv"),
      "s3_path,size\ns3://b/match_a.tif,1\ns3://b/skip_b.tif,2\n")
    Files.writeString(java.nio.file.Paths.get(inDir, "inv2.csv"),
      "s3_path,size\ns3://b/match_c.tif,3\n")
    val ev = PipelineEvent(collection = "sc",
      filenameRegex = Some("s3://b/match_.*"))
    val schema = StructType(Seq(StructField("s3_path", StringType),
      StructField("size", StringType)))
    val stream = graft.sources.Discovery.inventoryStream(spark, ev,
      inDir, schema, maxFilesPerTrigger = 1)
    assert(stream.isStreaming)
    val q = stream.writeStream.format("memory").queryName("inv_objs")
      .outputMode("append").option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val urls = spark.sql("SELECT remote_fileurl FROM inv_objs")
      .collect().map(_.getString(0)).sorted
    assert(urls.toSeq == Seq("s3://b/match_a.tif", "s3://b/match_c.tif"))
  }

  test("watermarked tumbling windows over a streaming event source") {
    import graft.streaming.EventWindows
    import org.apache.spark.sql.types._
    val inDir = Files.createTempDirectory("ev-in").toString
    val outCkpt = Files.createTempDirectory("ev-ckpt").toString
    // three files -> three micro-batches (maxFilesPerTrigger=1): the
    // watermark a batch uses comes from the PREVIOUS batch, so the
    // 10:00-11:00 click window is emitted while processing batch 3
    // (batch 2's 11:20 event advanced the watermark past 11:00)
    val files = Seq(
      "ev1.json" ->
        """{"ts":"2024-01-01T10:05:00Z","event_type":"click","value":2.0}
          |{"ts":"2024-01-01T10:55:00Z","event_type":"click","value":3.0}
          |""".stripMargin,
      "ev2.json" ->
        """{"ts":"2024-01-01T11:20:00Z","event_type":"view","value":1.0}
          |""".stripMargin,
      "ev3.json" ->
        """{"ts":"2024-01-01T12:30:00Z","event_type":"view","value":1.0}
          |""".stripMargin)
    files.zipWithIndex.foreach { case ((name, content), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000))
    }
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    assert(stream.isStreaming)
    val windowed = EventWindows.tumbling(stream, "1 hour", "10 minutes")
    val q = windowed.writeStream
      .format("memory").queryName("ev_windows")
      .outputMode("append")
      .option("checkpointLocation", outCkpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    // append mode emits only watermark-closed windows: the click
    // 10:00-11:00 window (n=2, total=5) and the view 11:00-12:00
    // window (n=1); the 12:00 window holding the 12:30 event is still
    // open and therefore absent
    val rows = spark.sql(
      "SELECT event_type, n, total FROM ev_windows ORDER BY event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSeq == Seq(("click", 2L, 5.0), ("view", 1L, 1.0)))
  }

  test("watermarked session windows: close-together events merge, a " +
    ">gap pause closes the session") {
    import graft.streaming.EventWindows
    import org.apache.spark.sql.types._
    val inDir = Files.createTempDirectory("sess-in").toString
    val ckpt = Files.createTempDirectory("sess-ckpt").toString
    // user u1: 10:00 + 10:10 (one session), then 11:30 (new session —
    // 80 min gap > 30 min). The 13:00 event in the last batch advances
    // the watermark far enough to close and emit both u1 sessions.
    val files = Seq(
      "s1.json" ->
        """{"ts":"2024-01-01T10:00:00Z","user":"u1"}
          |{"ts":"2024-01-01T10:10:00Z","user":"u1"}
          |""".stripMargin,
      "s2.json" ->
        """{"ts":"2024-01-01T11:30:00Z","user":"u1"}
          |""".stripMargin,
      "s3.json" ->
        """{"ts":"2024-01-01T13:00:00Z","user":"u2"}
          |""".stripMargin)
    files.zipWithIndex.foreach { case ((name, content), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(2000000L + i * 60000))
    }
    val schema = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("user", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val sessions = EventWindows.sessions(stream, "user",
      gap = "30 minutes", watermark = "10 minutes")
    val q = sessions.writeStream
      .format("memory").queryName("ev_sessions")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val rows = spark.sql(
      """SELECT user, CAST(session_start AS STRING) s, n_events
        |FROM ev_sessions ORDER BY user, s""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // u1's merged 2-event session ends 10:40 (last event + gap); the
    // 11:30 singleton ends 12:00; u2's 13:00 session is still open
    assert(rows.toSeq == Seq(
      ("u1", "2024-01-01 10:00:00", 2L),
      ("u1", "2024-01-01 11:30:00", 1L)))
  }
}
