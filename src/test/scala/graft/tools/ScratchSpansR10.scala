package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** r10 scratch: isolate the q_repeated_spans slowdown. */
object ScratchSpansR10 {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    val wins = graft.llm.Dedup.sampledSpanWindows(docs, "doc_id", "text", 64, 31)
    time("wins alone")(wins.count())
    time("wins alone again")(wins.count())
    val rep = wins.groupBy("span_key")
      .agg(count(lit(1)).as("__n_sites"),
        countDistinct(col("doc_id")).as("__n_docs"))
      .filter(col("__n_sites") >= 2)
    time("agg alone")(rep.count())
    val joined = wins.join(rep, Seq("span_key"), "left")
    time("left join")(joined.count())
    val full = graft.llm.Dedup.repeatedSpans(docs, "doc_id", "text", 64, 31)
    time("full detector")(full.count())
    full.groupBy("doc_id").agg(count(lit(1))).explain("formatted")
    spark.stop()
  }
}
