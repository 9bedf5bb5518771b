package graft

import graft.streaming.StreamingDistinct
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingDistinctSpec extends SparkSuite {
  import spark.implicits._

  test("batch mode: estimates equal the batch hll_sketch aggregate") {
    val df = spark.range(5000).select(
      (col("id") % 3).cast("string").as("k"),
      (col("id") % 1700).as("v"))
    val streaming = StreamingDistinct.distinctPerKey(df, "k", "v")
      .as[(String, Long)].collect().toMap
    val batch = df.groupBy("k")
      .agg(expr("hll_estimate(hll_sketch(cast(v as string)))").as("e"))
      .as[(String, Long)].collect().toMap
    assert(streaming == batch, s"$streaming vs $batch")
    // and the estimates are near-exact at this cardinality
    val exact = df.groupBy("k").agg(countDistinct("v")).as[(String, Long)]
      .collect().toMap
    streaming.foreach { case (k, est) =>
      assert(math.abs(est - exact(k)).toDouble / exact(k) < 0.05,
        s"key $k: est $est vs exact ${exact(k)}")
    }
  }

  test("duplicate values never move the estimate (max-fold state)") {
    val once = StreamingDistinct.distinctPerKey(
      Seq(("a", "x"), ("a", "y")).toDF("k", "v"), "k", "v")
      .as[(String, Long)].collect().toMap
    val dup = StreamingDistinct.distinctPerKey(
      (Seq.fill(500)(("a", "x")) ++ Seq.fill(500)(("a", "y")))
        .toDF("k", "v"), "k", "v")
      .as[(String, Long)].collect().toMap
    assert(once("a") == 2L && dup("a") == 2L)
  }

  test("streaming: distinct accumulates across micro-batches; replay-safe") {
    val inDir = Files.createTempDirectory("sd-in").toString
    val ckpt = Files.createTempDirectory("sd-ckpt").toString
    // batch 2 re-delivers u1/u2 (at-least-once replay) and adds u3
    val files = Seq(
      "b1.json" -> Seq("""{"k":"a","v":"u1"}""", """{"k":"a","v":"u2"}""",
        """{"k":"b","v":"u1"}""").mkString("\n"),
      "b2.json" -> Seq("""{"k":"a","v":"u1"}""", """{"k":"a","v":"u2"}""",
        """{"k":"a","v":"u3"}""").mkString("\n"))
    files.zipWithIndex.foreach { case ((name, content), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val est = StreamingDistinct.distinctPerKey(stream, "k", "v")
    val q = est.writeStream.format("memory").queryName("sd_out")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val finalEst = spark.table("sd_out")
      .groupBy("key").agg(max("distinct_est").as("d"))
      .as[(String, Long)].collect().toMap
    assert(finalEst("a") == 3L, s"replayed values double-counted: $finalEst")
    assert(finalEst("b") == 1L)
  }
}
