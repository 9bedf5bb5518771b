package graft

import graft.llm.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the minhash-LSH near-dup pipeline. */
object ScratchMinhash {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  n=$n")
    }
    val d = Tables.t(spark, dir, "documents").select("doc_id", "text")
    val docs = d.unionByName(d.select((col("doc_id") + 100000L).as("doc_id"),
      col("text")))
    time("text scan")(docs.count())
    time("docs total chars")(docs.agg(sum(length(col("text"))))
      .collect().head.getLong(0))
    time("words")(docs.select(graft.llm.Text.words(
      graft.llm.Text.normalize(col("text"))).as("w"))
      .agg(sum(size(col("w")))).collect().head.getLong(0))
    time("shingleHashes")(docs.select(
      Dedup.shingleHashes(col("text"), 5).as("h"))
      .agg(sum(size(col("h")))).collect().head.getLong(0))
    time("signature")(docs.select(
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 5), 64).as("s"))
      .agg(sum(size(col("s")))).collect().head.getLong(0))
    val withSig = docs.select(col("doc_id").as("doc_id"),
      Dedup.minhashSignature(Dedup.shingleHashes(col("text"), 5), 64)
        .as("sig"))
    time("candidates")(Dedup.candidatesFromSignatures(
      withSig, 64, 16, 1000).count())
    time("candidates again")(Dedup.candidatesFromSignatures(
      withSig, 64, 16, 1000).count())
    time("nearDuplicates e2e")(Dedup.nearDuplicates(docs, "doc_id", "text",
      0.9, 5, 64, 16).count())
    time("nearDuplicates again")(Dedup.nearDuplicates(docs, "doc_id", "text",
      0.9, 5, 64, 16).count())
    time("nearDup nh=32")(Dedup.nearDuplicates(docs, "doc_id", "text",
      0.9, 5, 32, 16).count())
    time("dedup_keep e2e")(Dedup.dropNearDuplicates(
      Tables.t(spark, dir, "documents"), "doc_id", "text",
      0.9, 5, 64, 16).count())
    spark.stop()
  }
}
