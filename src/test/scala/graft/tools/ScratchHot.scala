package graft

import org.apache.spark.sql.SparkSession

/** Times the bench outliers standalone (driver-style session) to
  * separate real plan cost from bench-session interference.
  * Run: sbt "Test/runMain graft.ScratchHot [queryName...]" */
object ScratchHot {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_clean_corpus", "q_decontaminate")
    val cpus = math.min(Runtime.getRuntime.availableProcessors, 32)
    new java.io.File("/tmp/graft-eventlog").mkdirs()
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.eventLog.enabled", "true")
      .config("spark.eventLog.dir", "/tmp/graft-eventlog")
      .config("spark.eventLog.compress", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names.foreach { n =>
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = SparkEntry.queries(n)(spark, dir).count()
        println(f"$n run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($c rows)")
      }
    }
    spark.stop()
  }
}
