package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Watermarked stream-stream interval join ([[graft.streaming.StreamJoin]])
  * and the deflate-ratio quality signal ([[graft.expr.DeflateRatioExpr]]). */
class StreamJoinSpec extends SparkSuite {

  test("streaming: clicks join impressions within the window, " +
    "across micro-batches; out-of-window clicks don't") {
    val inDir = Files.createTempDirectory("ssj-in").toString
    val ckpt = Files.createTempDirectory("ssj-ckpt").toString
    // impressions (side i) and clicks (side c); click 21 lands in a
    // LATER batch than its impression; click 32 is 2h late (outside
    // the 10-minute window)
    val files = Seq(
      "b1.json" ->
        ("""{"side":"i","k":"u1","ts":"2024-01-01T10:00:00Z","id":1}""" + "\n" +
          """{"side":"i","k":"u2","ts":"2024-01-01T10:00:00Z","id":2}""" + "\n" +
          """{"side":"c","k":"u1","ts":"2024-01-01T10:05:00Z","id":11}"""),
      "b2.json" ->
        ("""{"side":"c","k":"u2","ts":"2024-01-01T10:09:00Z","id":21}""" + "\n" +
          """{"side":"c","k":"u2","ts":"2024-01-01T12:00:00Z","id":32}""" + "\n" +
          """{"side":"c","k":"u9","ts":"2024-01-01T10:01:00Z","id":41}"""))
    files.zipWithIndex.foreach { case ((name, content), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(3000000L + i * 60000))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("side",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val impressions = stream.filter(col("side") === "i")
      .select(col("k"), col("ts").as("imp_ts"), col("id").as("imp_id"))
    val clicks = stream.filter(col("side") === "c")
      .select(col("k"), col("ts").as("click_ts"), col("id").as("click_id"))
    val joined = StreamJoin.within(impressions, clicks, "k",
      "imp_ts", "click_ts", watermarkDelay = "1 minute",
      maxDelay = "10 minutes")
    val q = joined.writeStream
      .format("memory").queryName("ssj_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val pairs = spark.sql("SELECT imp_id, click_id FROM ssj_out")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // u1: 10:05 click in window; u2: 10:09 click (cross-batch) in
    // window, 12:00 click out; u9 click has no impression
    assert(pairs == Set((1L, 11L), (2L, 21L)), pairs.toString)
  }

  test("deflate_ratio: repetitive text compresses far below prose; " +
    "high-entropy text doesn't; empty is 0") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = Seq(
      ("rep", "spam spam spam " * 200),
      ("prose", (1 to 200).map(i => s"word$i unique$i").mkString(" ")),
      ("noise", (1 to 3000).map(_ => rnd.nextPrintableChar()).mkString),
      ("empty", "")
    ).toDF("kind", "text")
    val m = rows.select(col("kind"), expr("deflate_ratio(text)").as("r"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("rep") < 0.05, s"repetitive ${m("rep")}")
    assert(m("prose") > 0.2 && m("prose") < 0.8, s"prose ${m("prose")}")
    assert(m("noise") > 0.7, s"noise ${m("noise")}")
    assert(m("empty") == 0.0)
  }

  test("deflate_ratio is deterministic and type-checked") {
    import spark.implicits._
    val d = Seq("hello world hello world").toDF("t")
    val a = d.select(expr("deflate_ratio(t)")).head().getDouble(0)
    val b = d.select(expr("deflate_ratio(t)")).head().getDouble(0)
    assert(a == b)
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq(1).toDF("t").select(expr("deflate_ratio(t)"))
        .queryExecution.analyzed
    }
  }
}
