package graft

import graft.llm.{Mixing, Retrieval}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the round-6 retrieval/mixture/sketch ops:
  * documents cloned 20x (~100k docs from sf0.1) through BM25 and
  * mixture materialization; events (~1M rows) through grouped HLL
  * sketch + union. Run: sbt "Test/runMain graft.ScratchScaleR6c". */
object ScratchScaleR6c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r
    }

    val d0 = Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "source", "text")
    val factor = 20
    val docs = (0 until factor).map(i =>
      d0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("source"), col("text")))
      .reduce(_ unionByName _).persist()
    println(s"docs: ${docs.count()} rows")

    time("bm25TopK") {
      Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("join", "hash", "vector", "scan"), k = 100).count()
    }
    time("materializeMixture") {
      Mixing.materializeMixture(docs, "doc_id", "source",
        Map("src0" -> 3.0, "src1" -> 2.0, "src2" -> 1.5, "src3" -> 1.0),
        targetRows = 200000).count()
    }
    docs.unpersist()

    val events = Tables.t(spark, "/root/testdata/sf0.1", "events")
    time("hll sketch+union") {
      events.groupBy("event_type")
        .agg(expr("hll_sketch(user_id)").as("sk"))
        .agg(expr("hll_estimate(graft_hll_union(sk))")).collect()
    }
    spark.stop()
  }
}
