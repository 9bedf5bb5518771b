package graft

import graft.streaming.StreamingFrequency
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingFrequencySpec extends SparkSuite {
  import spark.implicits._

  test("batch mode: estimates equal the batch cms_sketch aggregate") {
    val df = spark.range(6000).select(
      (col("id") % 3).cast("string").as("k"),
      (col("id") % 11).cast("string").as("v"))
    val streaming = StreamingFrequency.frequencyPerKey(df, "k", "v")
      .as[(String, String, Long)].collect()
      .map { case (k, v, e) => (k, v) -> e }.toMap
    val batch = df.groupBy("k").agg(expr("cms_sketch(v)").as("sk"))
      .join(df.groupBy("k", "v").agg(count(lit(1)).as("n")), "k")
      .select(col("k"), col("v"), expr("cms_estimate(sk, v)").as("e"),
        col("n"))
      .as[(String, String, Long, Long)].collect()
    assert(batch.nonEmpty)
    batch.foreach { case (k, v, e, n) =>
      assert(streaming((k, v)) == e, s"($k,$v): ${streaming((k, v))} vs $e")
      assert(e == n, s"($k,$v): est $e != exact $n (few keys, wide sketch)")
    }
  }

  test("streaming: counts accumulate across micro-batches per key") {
    val inDir = Files.createTempDirectory("sf-in").toString
    val ckpt = Files.createTempDirectory("sf-ckpt").toString
    val files = Seq(
      "b1.json" -> Seq("""{"k":"a","v":"x"}""", """{"k":"a","v":"x"}""",
        """{"k":"b","v":"x"}""").mkString("\n"),
      "b2.json" -> Seq("""{"k":"a","v":"x"}""", """{"k":"a","v":"y"}""")
        .mkString("\n"))
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
    val est = StreamingFrequency.frequencyPerKey(stream, "k", "v")
    val q = est.writeStream.format("memory").queryName("sf_out")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val finalEst = spark.table("sf_out")
      .groupBy("key", "item").agg(max("freq_est").as("n"))
      .as[(String, String, Long)].collect()
      .map { case (k, v, n) => (k, v) -> n }.toMap
    assert(finalEst(("a", "x")) == 3L, s"x under a: $finalEst")
    assert(finalEst(("a", "y")) == 1L)
    assert(finalEst(("b", "x")) == 1L)
  }
}
