package graft

import graft.llm.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-sanity experiment: replicate the sf0.1 corpus N-fold with
  * perturbed ids/text and push it through the minhash near-dup
  * pipeline — checks wall-clock growth and shuffle behavior well past
  * the bench SF (usage: runMain graft.ScratchScale [replicas]). */
object ScratchScale {
  def main(args: Array[String]): Unit = {
    val replicas = args.headOption.map(_.toInt).getOrElse(20)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    // each replica perturbs the text with a replica-specific token so
    // replicas are near-dups of the original, not exact dups
    val big = spark.range(replicas).crossJoin(d)
      .select((col("doc_id") + col("id") * 1000000L).as("doc_id"),
        concat(col("text"), lit(" r"), col("id")).as("text"))
    val t0 = System.nanoTime()
    val n = big.count()
    println(f"corpus rows: $n (${(System.nanoTime() - t0) / 1e9}%.1f s)")
    val t1 = System.nanoTime()
    val pairs = Dedup.nearDuplicates(big, "doc_id", "text",
      threshold = 0.9, k = 5, numHashes = 64, bands = 16)
    val np = pairs.count()
    println(f"near-dup pairs: $np (${(System.nanoTime() - t1) / 1e9}%.1f s)")
    spark.stop()
  }
}
