package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the round-4 ops: documents cloned 20x (~100k docs
  * at sf0.1) through decontamination and repeated-span detection —
  * verifies the keyed-shuffle shapes hold when the corpus no longer
  * fits a broadcast. Run: sbt "Test/runMain graft.ScratchScaleR4". */
object ScratchScaleR4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d0 = Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text")
    val factor = 20
    val big = (0 until factor).map(i =>
      d0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        col("text"))).reduce(_ unionByName _)
      .persist()
    println(s"corpus: ${big.count()} docs")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r
    }
    time("decontaminate") {
      graft.llm.Clean.decontaminate(big,
        big.filter(pmod(col("doc_id"), lit(101)) === 0),
        "doc_id", "text", k = 8).count()
    }
    time("repeatedSpans") {
      graft.llm.Dedup.repeatedSpans(big, "doc_id", "text", 64, 16)
        .filter(col("n_sites") > 1).count()
    }
    time("dropNearDuplicates") {
      graft.llm.Dedup.dropNearDuplicates(big, "doc_id", "text",
        0.9, 5, 64, 16).count()
    }
    spark.stop()
  }
}
