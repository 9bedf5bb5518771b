package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Job-level breakdown for the remaining bench head: which scheduled
  * jobs (eager checkpoints, persists, counts, collects) each query
  * pays for, and what each costs at sf0.1. */
object R16JobProbe {

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

    val starts = mutable.Map[Int, (Long, String, Int)]()
    val done = mutable.ArrayBuffer[(Int, Long, String, Int)]()
    val stageTasks = mutable.Map[Int, Int]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val cs = j.stageInfos.map(_.name.takeWhile(_ != '\n').take(44))
          .mkString(" | ")
        starts(j.jobId) = (j.time, cs, j.stageInfos.size)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.remove(j.jobId).foreach { case (t0, cs, ns) =>
          done += ((j.jobId, j.time - t0, cs, ns))
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stageTasks(s.stageInfo.stageId) = s.stageInfo.numTasks
    })

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_dup_clusters", "q_dedup_incremental", "q_dedup_best",
        "q_dedup_keep", "q_clean_corpus", "q_minhash_near_dups",
        "q_edit_distance", "q_semdedup_hier", "q_winnow_pairs",
        "q_dsir_resample")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    for (name <- names; r <- 1 to 2) {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      done.clear()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$name r$r total $s%6.2f s, jobs=${done.size}")
      if (r == 2) done.foreach { case (id, ms, cs, ns) =>
        println(f"    job $id%4d $ms%6d ms  stages=$ns%2d  $cs")
      }
    }
    spark.stop()
  }
}
