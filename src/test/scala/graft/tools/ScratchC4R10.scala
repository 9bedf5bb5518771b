package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 scratch: prove C4.clean evaluates the report struct once per
  * row (generator barrier) and the curate/clean exact dedups carry no
  * text-hash window. */
object ScratchC4R10 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    val cleaned = graft.llm.C4.clean(docs, "text")
    val plan = cleaned.queryExecution.executedPlan.toString
    // the report struct builds clean_text exactly once if the Filter
    // did not re-inline it: count the alias marker
    val evals = "lorem ipsum".r.findAllIn(plan).size
    println(s"C4 plan 'lorem ipsum' occurrences: $evals")
    println(s"C4 plan has Generate: ${plan.contains("Generate")}")
    println(s"C4 rows: ${cleaned.count()}")

    // user column named __c4 must survive
    import spark.implicits._
    val pass = "this line has plenty of words and ends properly.\n" * 3
    val clash = graft.llm.C4.clean(
      Seq((1, pass)).toDF("doc_id", "text").withColumn("__c4", lit(7)),
      "text")
    println(s"__c4 column preserved: ${clash.columns.contains("__c4")} " +
      s"value ok: ${clash.select("__c4").head.getInt(0) == 7}")

    val cur = graft.llm.Curate.pipeline(
      docs.withColumn("source", pmod(col("doc_id"), lit(5)))
        .withColumn("label", pmod(col("doc_id"), lit(3)) === 0),
      "doc_id", "text", "source", "label")
    val curPlan = cur.queryExecution.executedPlan.toString
    val winMd5 = curPlan.linesIterator
      .filter(l => l.contains("Window") && l.contains("md5")).toSeq
    println(s"curate windows partitioned by md5: ${winMd5.size}")
    println(s"curate rows: ${cur.count()}")
    spark.stop()
  }
}
