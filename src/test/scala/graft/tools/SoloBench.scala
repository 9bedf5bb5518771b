package graft.tools

import org.apache.spark.sql.SparkSession

/** One-command re-verification of the bench's expensive head:
  * `sbt "Test/runMain graft.tools.SoloBench [query...]"` runs the
  * heavy queries (default: the judge's heavy-head list + the ANN
  * family) twice each — cold then warm — against
  * `SPARK_GRAFT_SF_DIR` (default sf0.1), printing per-run seconds.
  * Pass query names to restrict. Lives in test scope so production
  * source stays exactly the engine. */
object SoloBench {
  private val HeavyHead = Seq(
    "q_pagerank", "q_semdedup", "q_dup_clusters", "q_clean_corpus",
    "q_dedup_incremental", "q_curate_pipeline", "q_winnow_pairs",
    "q_edit_distance", "q_triangles", "q_quality_classifier",
    "q_dedup_keep", "q_dedup_best", "q_bigram_backoff",
    // ANN family: plan-size/codegen regressions show up here first
    "q_ann_top1", "q_ann_lsh", "q_ann_pq", "q_ann_ivf", "q_ann_ivfpq")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    val names = if (args.nonEmpty) args.toSeq else HeavyHead
    val unknown = names.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    graft.SparkEntry.benchSetup.foreach(f => f(spark, sfDir))
    for (name <- names) {
      for (i <- 1 to 2) {
        // untimed, same hygiene as Bench: a run must not pay for (or
        // be GC-poisoned by) the previous run's checkpoint blocks
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir).count()
        val label = if (i == 1) "cold" else "warm"
        println(f"$name $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      System.gc()
    }
    spark.stop()
  }
}
