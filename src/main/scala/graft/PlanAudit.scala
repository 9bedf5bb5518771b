package graft

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans for EVERY registered query so scan
  * pruning / join strategies / shuffle counts can be audited
  * (`sbt "runMain graft.PlanAudit" > plans.txt`). Pass query names to
  * restrict; default is the full registry, sorted. */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    val targets =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    targets.foreach { name =>
      println(s"\n========== $name ==========")
      try println(SparkEntry.queries(name)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      catch { case e: Throwable =>
        println(s"PLAN FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
