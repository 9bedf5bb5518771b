package graft

import graft.llm.{Packing, Text}
import graft.operators.{Layout, Prefix}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the round-6 continuation ops: documents cloned 20x
  * (~100k docs from sf0.1) through chunking/packing/prefix-sum, and
  * events (~1M rows) through the z-order + skip-index path.
  * Run: sbt "Test/runMain graft.ScratchScaleR6b". */
object ScratchScaleR6b {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r
    }

    val d0 = Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "lang", "text")
    val factor = 20
    val docs = (0 until factor).map(i =>
      d0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("lang"), col("text")))
      .reduce(_ unionByName _).persist()
    println(s"docs: ${docs.count()} rows")

    time("chunkWindows") {
      Packing.chunkWindows(docs, "doc_id", "text", 16, 8).count()
    }
    val withTokens = docs.select(col("lang"), col("doc_id"),
      Text.tokenCount(col("text")).cast("long").as("n_tokens"))
    time("prefix runningSum") {
      Prefix.runningSum(withTokens, "doc_id", "n_tokens", "cum").count()
    }
    time("packConcat") {
      Packing.packConcat(withTokens, "doc_id", "n_tokens", 2048)
        .groupBy("seq_id").count().count()
    }
    time("packGreedy") {
      Packing.packGreedy(withTokens, "lang", "doc_id", "n_tokens", 2048)
        .groupBy("lang", "bin").count().count()
    }

    val events = Tables.t(spark, "/root/testdata/sf0.1", "events")
      .select("event_id", "user_id", "value")
    println(s"events: ${events.count()} rows")
    val zdir = java.nio.file.Files.createTempDirectory("scale-z")
      .toFile.getAbsolutePath
    time("zorderWrite 64f") {
      Layout.zorderWrite(events, Seq("user_id", "value"), zdir,
        numFiles = 64, bitsPerDim = 8)
    }
    time("skipIndex") {
      Layout.buildSkipIndex(spark, zdir, Seq("user_id", "value"))
    }
    val pruned = Layout.prunedFiles(spark, zdir, "user_id", 0L, 50L)
    println(s"pruned to ${pruned.length}/64 files for a 1/30 user slice")
    val prunedV = Layout.prunedFiles(spark, zdir, "value", 0.0, 3.0)
    println(s"pruned to ${prunedV.length}/64 files for a narrow value slice")
    spark.stop()
  }
}
