package graft.tools

import org.apache.spark.sql.SparkSession

/** sf10 spot-certification (r13): the heavy head at sf1 AND sf10 in
  * ONE session, same order, cold-first per (dir, query) — the same
  * noop-write harness as [[SkewProbe]]. Criterion: sf10/sf1 ≤ ~12×
  * at 10× data (sublinear-with-overhead); any superlinear offender
  * gets named and fixed. Generate the data first:
  * `SPARK_GRAFT_COPIES=100 SPARK_GRAFT_OUT=/tmp/graft_sf10
  *  sbt "Test/runMain graft.tools.Sf1Gen"`. */
object Sf10Probe {

  private val Heavy = Seq(
    "q_pagerank", "q_clean_corpus", "q_semdedup", "q_dsir_scores",
    "q_dsir_resample", "q_dup_clusters", "q_dedup_best",
    "q_winnow_pairs", "q_j1_multi_asset", "q_curate_pipeline")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.isEmpty) Heavy else args.toSeq
    val dirs = Seq("/tmp/graft_sf1", "/tmp/graft_sf10")
    val results = collection.mutable.Map[(String, String), Double]()
    for (name <- names; dir <- dirs) {
      val t0 = System.nanoTime()
      try {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        results((name, dir)) = s
        println(f"$name @ $dir: $s%.2f s")
      } catch {
        case e: Throwable =>
          println(s"$name @ $dir: FAILED ${e.getClass.getSimpleName} " +
            e.getMessage.take(200))
      }
      System.gc()
    }
    println("== ratios (sf10 / sf1 at 10x data) ==")
    for (name <- names;
         a <- results.get((name, dirs(0)));
         b <- results.get((name, dirs(1))))
      println(f"$name: sf1 $a%.2f s, sf10 $b%.2f s, ratio ${b / a}%.2f")
    spark.stop()
  }
}
