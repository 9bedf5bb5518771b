package graft

import graft.llm.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev scratchpad for profiling individual pipeline stages. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val d = Tables.t(spark, dir, "documents").select("doc_id", "text")
    val docs = d.unionByName(d.select((col("doc_id") + 100000L).as("doc_id"),
      col("text")))
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s  n=$n")
    }
    time("shingles")(docs.select(Dedup.shingles(col("text"), 5).as("sh"))
      .agg(sum(size(col("sh")))).collect().head.getLong(0))
    time("shingleHashes")(docs.select(
      Dedup.shingleHashes(col("text"), 5).as("h"))
      .agg(sum(size(col("h")))).collect().head.getLong(0))
    time("signature")(docs.select(
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 5), 64).as("s"))
      .agg(sum(size(col("s")))).collect().head.getLong(0))
    time("candidates")(Dedup.minhashCandidates(docs, "doc_id", "text",
      5, 64, 16).count())
    time("nearDuplicates")(Dedup.nearDuplicates(docs, "doc_id", "text",
      0.9, 5, 64, 16).count())
    spark.stop()
  }
}
