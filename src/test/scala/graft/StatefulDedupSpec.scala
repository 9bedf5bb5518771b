package graft

import graft.streaming.StatefulDedup
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Cross-batch keyed-state dedup (flatMapGroupsWithState). */
class StatefulDedupSpec extends SparkSuite {
  import spark.implicits._

  test("streaming: a key re-delivered in a later micro-batch is suppressed") {
    val inDir = Files.createTempDirectory("sd-in").toString
    val ckpt = Files.createTempDirectory("sd-ckpt").toString
    // batch 1: items a, b; batch 2: b re-delivered + new c
    val files = Seq(
      "b1.json" ->
        """{"id":"a","payload":"a1"}
          |{"id":"b","payload":"b1"}
          |""".stripMargin,
      "b2.json" ->
        """{"id":"b","payload":"b2-redelivered"}
          |{"id":"c","payload":"c1"}
          |""".stripMargin)
    files.zipWithIndex.foreach { case ((name, content), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("payload",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    // no stateTtl: a ProcessingTimeTimeout keeps AvailableNow
    // re-triggering empty batches to fire timers, so the query never
    // terminates within the await window (TTL is for unbounded runs)
    val deduped = StatefulDedup.firstOccurrence(stream, "id")
    val q = deduped.writeStream
      .format("memory").queryName("sd_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val rows = spark.sql("SELECT id, payload FROM sd_out ORDER BY id")
      .collect().map(r => (r.getString(0), r.getString(1)))
    // b's re-delivery is suppressed; its FIRST payload survives
    assert(rows.toSeq == Seq(("a", "a1"), ("b", "b1"), ("c", "c1")))
  }

  test("batch mode: first occurrence per key within the frame") {
    val df = Seq(("x", 1), ("x", 2), ("y", 3)).toDF("id", "v")
    val out = StatefulDedup.firstOccurrence(df, "id")
      .orderBy("id").collect().map(r => r.getString(0))
    assert(out.toSeq == Seq("x", "y"))
  }
}
