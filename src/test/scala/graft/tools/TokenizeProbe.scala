package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Interleaved A/B probe of the native alpha_tokens / ws_token_count
  * kernels against their declarative twins, through the full Spark
  * execution path (codegen + explode), on the real sf0.1 corpus —
  * J1Probe methodology. */
object TokenizeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables
      .t(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text").localCheckpoint(true)
    def time(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$label%-12s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    for (round <- 1 to 4) {
      println(s"--- round $round")
      time("tok-native")(docs.select(col("doc_id"),
        explode(graft.expr.AlphaTokens(col("text"))).as("w")))
      time("tok-regex")(docs.select(col("doc_id"),
        explode(regexp_extract_all(lower(col("text")), lit("[a-z]+"),
          lit(0))).as("w")))
      time("cnt-native")(docs.select(col("doc_id"),
        graft.expr.WsTokenCount(col("text")).as("n")))
      time("cnt-split")(docs.select(col("doc_id"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))).as("n")))
    }
    spark.stop()
  }
}
