package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Inside-the-checkpoint plan + A/B probe for Dedup.nearDuplicates:
  * reconstructs the internal pipeline (sh persist -> candidates ->
  * verify joins) so the executed join strategy is visible, and
  * interleaves "as-is" vs "sh pre-populated by a count" to measure the
  * concurrent-broadcast-builds-racing-the-persist effect. */
object R16DedupProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)
    import graft.llm.Dedup

    val d0 = graft.Tables.t(spark, sfDir, "documents").select("doc_id", "text")
    val d = d0.unionByName(d0.select((col("doc_id") + 100000L).as("doc_id"),
      col("text")))

    // reconstruct nearDuplicates internals (threshold .9, k 5, 64/16)
    def pairsPlan(prePopulate: Boolean): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      val out = Dedup.nearDuplicates(d, "doc_id", "text",
        threshold = 0.9, k = 5, numHashes = 64, bands = 16)
      out.count()
      (System.nanoTime() - t0) / 1e9
    }
    // explain of the INTERNAL verify join (reconstructed)
    {
      val sh = Dedup.spread(d, col("doc_id")).select(col("doc_id").as("jid"),
        graft.llm.Dedup.shingleHashes(col("text"), 5).as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val withSig = sh.select(col("jid").as("doc_id"),
        Dedup.minhashSignature(col("sh"), 64).as("sig"))
      val candidates = Dedup.candidatesFromSignatures(withSig, 64, 16,
        maxBucketSize = 1000, withEst = false)
      val verify = candidates
        .join(sh.select(col("jid").as("id_a"), col("sh").as("sh_a")), "id_a")
        .join(sh.select(col("jid").as("id_b"), col("sh").as("sh_b")), "id_b")
        .withColumn("jaccard",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))))
        .filter(col("jaccard") >= 0.9)
      verify.write.format("noop").mode("overwrite").save()
      // executed plan AFTER AQE re-optimization
      println("=== executed verify plan (AQE final) ===")
      println(verify.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Scan") || l.contains("Aggregate"))
        .map(_.take(120)).mkString("\n"))
      sh.unpersist()
    }
    for (r <- 1 to 3) println(f"nearDuplicates as-is    r$r ${pairsPlan(false)}%6.2f s")
    spark.stop()
  }
}
