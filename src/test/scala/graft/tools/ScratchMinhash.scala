package graft

import graft.llm.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cold-path breakdown of the minhash-LSH near-dup pipeline. */
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
    // mirror Bench warmup
    spark.range(1000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$dir/region.parquet").count()
    val d = Tables.t(spark, dir, "documents").select("doc_id", "text")
    val docs = d.unionByName(d.select((col("doc_id") + 100000L).as("doc_id"),
      col("text")))
    val sh = docs.select(col("doc_id").as("jid"),
      Dedup.shingleHashes(col("text"), 5).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("sh persist+count")(sh.count())
    val withSig = sh.select(col("jid").as("doc_id"),
      Dedup.minhashSignature(col("sh"), 64).as("sig"))
    time("sig from cache")(withSig.count())
    val pairs = Dedup.candidatesFromSignatures(withSig, 64, 16, 1000,
      withEst = false)
    time("candidates")(pairs.count())
    val verified = pairs
      .join(sh.select(col("jid").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("jid").as("id_b"), col("sh").as("sh_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))))
      .filter(col("jaccard") >= 0.9)
      .select("id_a", "id_b", "jaccard")
    time("verify join")(verified.count())
    time("localCheckpoint")(verified.localCheckpoint(true).count())
    sh.unpersist()
    time("full query again")(LlmQueries.minhashNearDups(spark, dir).count())
    spark.stop()
  }
}
