package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.llm.Dsir

/** Stage timings for q_dsir_scores. */
object DsirProbe {
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
      time("buckets explode+count") {
        d.select(graft.llm.LangModel.tokens(col("text")).as("ws"))
          .select(explode(Dsir.ngramBucketsFromTokens(col("ws"), 1024))
            .as("bucket")).groupBy("bucket").count().count()
      }
      val w = time("train") {
        val t = Dsir.train(d, d.filter(col("lang") === "en"), "text", 1024)
        t.count(); t
      }
      time("score") {
        Dsir.score(d, w, "doc_id", "text", 1024).count()
      }
      time("full") {
        graft.LlmQueries.dsirScores(spark, sfDir).count()
      }
    }
    spark.stop()
  }
}
