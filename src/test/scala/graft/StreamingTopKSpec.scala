package graft

import graft.streaming.StreamingTopK
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingTopKSpec extends SparkSuite {
  import spark.implicits._

  test("batch mode: exact when capacity exceeds distinct items") {
    val df = (Seq.fill(50)("hot") ++ Seq.fill(20)("warm") ++
      Seq("a", "b", "c")).toDF("item")
    val got = StreamingTopK.heavyHitters(df, "item",
      nBuckets = 4, capacity = 16)
      .as[(String, Long, Long)].collect()
      .map { case (i, c, e) => i -> (c, e) }.toMap
    assert(got("hot") === (50L, 0L))
    assert(got("warm") === (20L, 0L))
    assert(got("a") === (1L, 0L))
  }

  test("eviction: heavy item survives, counts bound the truth") {
    // one bucket, many distinct cold items plus a hot one. Space-saving
    // guarantees any item with true count > N/capacity survives:
    // N = 70, capacity 4 -> threshold 17.5 < 30, so hot must be kept,
    // with count - err <= true <= count.
    val items = (1 to 40).map(i => s"cold$i") ++ Seq.fill(30)("hot")
    val df = items.toDF("item")
    val got = StreamingTopK.heavyHitters(df, "item",
      nBuckets = 1, capacity = 4, topPerBucket = 4)
      .as[(String, Long, Long)].collect()
      .map { case (i, c, e) => i -> (c, e) }.toMap
    assert(got.contains("hot"), s"hot item evicted: $got")
    val (c, e) = got("hot")
    assert(c >= 30L, s"count $c underestimates truth 30")
    assert(c - e <= 30L, s"count-err ${c - e} exceeds truth 30")
    // the summary's counts always sum to the number of processed items
    assert(got.values.map(_._1).sum === 70L)
  }

  test("streaming: counts accumulate across micro-batches") {
    val inDir = Files.createTempDirectory("tk-in").toString
    val ckpt = Files.createTempDirectory("tk-ckpt").toString
    val files = Seq(
      "b1.json" -> (Seq.fill(5)("""{"item":"x"}""") ++
        Seq("""{"item":"y"}""")).mkString("\n"),
      "b2.json" -> (Seq.fill(7)("""{"item":"x"}""") ++
        Seq("""{"item":"z"}""")).mkString("\n"))
    files.zipWithIndex.foreach { case ((name, content), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("item",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    // no stateTtl here: a ProcessingTimeTimeout keeps AvailableNow
    // re-triggering (empty) batches to evaluate timers, so the query
    // never terminates — TTL is for genuinely unbounded deployments
    val hh = StreamingTopK.heavyHitters(stream, "item",
      nBuckets = 4, capacity = 8)
    val q = hh.writeStream.format("memory").queryName("tk_out")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    // the memory sink accumulates every trigger's emission; the final
    // count per item is the max across triggers
    val finalCounts = spark.table("tk_out")
      .groupBy("item").agg(max("count").as("count"))
      .as[(String, Long)].collect().toMap
    assert(finalCounts("x") === 12L) // 5 + 7 across batches
    assert(finalCounts("y") === 1L)
    assert(finalCounts("z") === 1L)
  }
}
