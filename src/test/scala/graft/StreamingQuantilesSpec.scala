package graft

import graft.streaming.StreamingQuantiles
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingQuantilesSpec extends SparkSuite {
  import spark.implicits._

  test("batch mode: rank accuracy matches the kll contract per key") {
    val df = spark.range(40000).select(
      (col("id") % 2).cast("string").as("k"),
      (col("id") * 7919 % 20000).cast("double").as("v"))
    val got = StreamingQuantiles.quantilesPerKey(df, "k", "v")
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.length == 2)
    got.foreach { case (k, n, p50, p90, p99) =>
      assert(n == 20000L, s"key $k count $n")
      // values are a permutation of 0..19999 per key
      assert(math.abs(p50 / 20000.0 - 0.5) < 0.03, s"$k p50=$p50")
      assert(math.abs(p90 / 20000.0 - 0.9) < 0.03, s"$k p90=$p90")
      assert(math.abs(p99 / 20000.0 - 0.99) < 0.03, s"$k p99=$p99")
    }
  }

  test("streaming: sketch accumulates across micro-batches") {
    val inDir = Files.createTempDirectory("sq-in").toString
    val ckpt = Files.createTempDirectory("sq-ckpt").toString
    // batch 1: values 0..99; batch 2: values 100..199 → running median
    // after batch 2 must reflect ALL 200 values (~100), not batch 2 alone
    def rows(lo: Int, hi: Int) =
      (lo until hi).map(i => s"""{"k":"a","v":$i.0}""").mkString("\n")
    val files = Seq("b1.json" -> rows(0, 100), "b2.json" -> rows(100, 200))
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
        org.apache.spark.sql.types.DoubleType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val est = StreamingQuantiles.quantilesPerKey(stream, "k", "v")
    val q = est.writeStream.format("memory").queryName("sq_out")
      .outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val last = spark.table("sq_out").orderBy(desc("n"))
      .as[(String, Long, Double, Double, Double)].head()
    assert(last._2 == 200L)
    assert(math.abs(last._3 - 100.0) < 10.0, s"running median ${last._3}")
    assert(last._5 > 180.0, s"running p99 ${last._5}")
  }
}
