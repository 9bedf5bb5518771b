package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable.ArrayBuffer

/** Round-16 stage-level breakdown for the two queries that read flat
  * across 8 vs 32 cores in BENCH_r15 (q_j1_multi_asset 2.60/2.60,
  * q_pagerank 4.14/3.97) — flat scaling means a serialized bottleneck
  * or fixed per-job cost, and this measures which, per stage. */
object R16Probe {

  private final class StageLog extends SparkListener {
    val rows = ArrayBuffer[(Int, String, Long, Int)]()
    override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
      val i = s.stageInfo
      val ms = (for {a <- i.completionTime; b <- i.submissionTime}
        yield a - b).getOrElse(-1L)
      rows += ((i.stageId, i.name.takeWhile(_ != '\n').take(60), ms,
        i.numTasks))
    }
  }

  private def noop(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

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
    val log = new StageLog
    spark.sparkContext.addSparkListener(log)

    def timed(label: String, stages: Boolean = false)(f: => Unit): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      log.rows.clear()
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-40s $s%7.2f s")
      if (stages) log.rows.sortBy(-_._3).take(12).foreach { case (id, n, ms, nt) =>
        println(f"    stage $id%4d $ms%7d ms  tasks=$nt%3d  $n")
      }
    }

    // ---- J1 ----------------------------------------------------------
    def urls: DataFrame = graft.Tables.t(spark, sfDir, "lineitem").select(
      concat(lit("s3://store/prod"), col("l_orderkey").cast("string"),
        lit("_f"), col("l_linenumber").cast("string"), lit(".bin"))
        .as("remote_fileurl"))
    for (r <- 1 to 3) {
      timed(s"j1 scan-only r$r") { noop(urls) }
      timed(s"j1 map-side (expr+filter) r$r") {
        noop(urls.select(call_function("multi_asset_parts",
          col("remote_fileurl"), lit("prod\\d+"), lit("f1\\.bin"))
          .as("__ma")).filter(col("__ma").isNotNull))
      }
      timed(s"j1 full r$r", stages = r == 3) {
        graft.SparkEntry.queries("q_j1_multi_asset")(spark, sfDir).count()
      }
    }
    // single-thread core microbench
    {
      val us = urls.collect().map(_.getString(0))
      val core = new graft.expr.MultiAssetCore("prod\\d+", "f1\\.bin")
      for (r <- 1 to 3) {
        val t0 = System.nanoTime()
        var i = 0; var live = 0L
        while (i < us.length) {
          val p = core.parts(org.apache.spark.unsafe.types.UTF8String
            .fromString(us(i)))
          if (p != null) live += 1
          i += 1
        }
        println(f"j1 core.parts 1-thread r$r ${(System.nanoTime()-t0)/1e9}%7.2f s over ${us.length} rows (live=$live)")
      }
    }

    // ---- PageRank ----------------------------------------------------
    for (r <- 1 to 3) {
      timed(s"pagerank full r$r", stages = r == 3) {
        graft.SparkEntry.queries("q_pagerank")(spark, sfDir).count()
      }
    }
    timed("pagerank edge-build only") {
      val li = graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val ord = graft.Tables.t(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
      val ck2 = col("ck").cast("long") * 2
      val sk2 = col("sk").cast("long") * 2 + 1
      noop(pairs.select(ck2.as("src"), sk2.as("dst"))
        .unionByName(pairs.select(sk2.as("src"), ck2.as("dst"))))
    }
    spark.stop()
  }
}
