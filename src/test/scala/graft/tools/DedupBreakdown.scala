package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Stage breakdown of the q_dedup_keep pipeline at sf0.1 (noop sink
  * per stage, guide §1.4/§1.5): where do the remaining seconds go —
  * the shingle kernel, the signature kernel, the LSH banding, or the
  * verify join? */
object DedupBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.llm.Dedup
    val docs = graft.Tables.t(spark, dir, "documents")
      .select("doc_id", "text")
    def time(label: String)(f: => Unit): Unit = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      spark.sparkContext.setJobDescription(null)
    }
    for (round <- 1 to 3) {
      println(s"--- round $round")
      time("scan-only")(docs.write.format("noop").mode("overwrite").save())
      val sh = docs.select(col("doc_id").as("jid"),
        Dedup.shingleHashes(col("text"), 5).as("sh"))
      time("shingles")(sh.write.format("noop").mode("overwrite").save())
      val shP = sh.persist(StorageLevel.MEMORY_AND_DISK)
      time("shingles-persist")(shP.write.format("noop").mode("overwrite").save())
      val sig = shP.select(col("jid").as("doc_id"),
        Dedup.minhashSignature(col("sh"), 64).as("sig"))
      time("signatures")(sig.write.format("noop").mode("overwrite").save())
      // construction INSIDE the timed block: nearDuplicates eagerly
      // checkpoints its pair set at build time, so timing only the
      // write would miss the whole pipeline
      time("nearDuplicates-full")(
        Dedup.nearDuplicates(docs, "doc_id", "text",
          threshold = 0.9, k = 5, numHashes = 64, bands = 16)
          .write.format("noop").mode("overwrite").save())
      time("dropNearDuplicates")(
        Dedup.dropNearDuplicates(docs, "doc_id", "text", 0.9, 5, 64, 16)
          .write.format("noop").mode("overwrite").save())
      shP.unpersist(true)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
