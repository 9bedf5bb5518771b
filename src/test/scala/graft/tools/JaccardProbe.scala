package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for q_set_jaccard: times the trigram
  * aggregation, the sketch branch, and the exact-pair branch
  * separately so plan work targets the real bottleneck. */
object JaccardProbe {
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
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val d = graft.Tables.t(spark, sfDir, "documents")
    for (round <- 1 to 2) {
      println(s"--- round $round")
      val bySh = time("bySh agg+checkpoint") {
        graft.llm.Dedup.spread(d, col("doc_id"))
          .select(col("lang"),
            explode(graft.LlmQueries.wordTrigrams(col("text"))).as("sh"))
          .groupBy("sh")
          .agg(sort_array(collect_set(col("lang"))).as("langs"))
          .localCheckpoint(true)
      }
      val tri = bySh.select(explode(col("langs")).as("lang"), col("sh"))
      time("sketch branch") {
        graft.llm.GroupSimilarity
          .setJaccard(tri, "lang", "sh", numHashes = 128).count()
      }
      time("exact-pair branch") {
        val pairs = flatten(transform(col("langs"), (a, i) =>
          transform(
            slice(col("langs"), i + lit(2), size(col("langs")) - i - 1),
            b => struct(a.as("group_a"), b.as("group_b")))))
        bySh.select(explode(pairs).as("p"))
          .groupBy(col("p.group_a"), col("p.group_b"))
          .agg(count(lit(1))).count()
      }
      bySh.unpersist(true)
    }
    spark.stop()
  }
}
