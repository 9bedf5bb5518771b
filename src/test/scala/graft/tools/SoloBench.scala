package graft
import org.apache.spark.sql.SparkSession
object SoloBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet("/root/testdata/sf0.1/region.parquet").count()
    for (name <- Seq("q_semdedup", "q_clean_corpus", "q_dup_clusters",
      "q_curate_pipeline", "q_dedup_incremental", "q_winnow_pairs",
      "q_edit_distance", "q_pagerank")) {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, "/root/testdata/sf0.1").count()
        println(f"$name run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
