package graft

import graft.llm.{LineDedup, Masking}
import graft.operators.AsOfJoin
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the last operator batch: 20x documents (100k)
  * through line dedup / masking / inverted index / centroid aggregate,
  * and 2M events through the broadcast as-of path. Run:
  * sbt "Test/runMain graft.ScratchScaleR6i". */
object ScratchScaleR6i {
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
      println(f"$name%-24s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }

    val factor = 20
    val dir = "/root/testdata/sf0.1"
    val d0 = Tables.t(spark, dir, "documents").select("doc_id", "text")
    val docs = (0 until factor).map(i =>
      d0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).persist()
    println(s"docs: ${docs.count()}")

    time("line dedup 100k docs") {
      // every doc gets the planted boilerplate, clones share content
      val planted = docs.select(col("doc_id"),
        concat(lit("all rights reserved. "), col("text")).as("text"))
      println(s"  rows: ${
        LineDedup.dropSharedLines(planted, "doc_id", "text").count()}")
    }

    time("mask tokens 100k docs") {
      println(s"  rows: ${
        Masking.maskTokens(docs, "doc_id", "text").count()}")
    }

    time("inverted index 100k docs") {
      println(s"  terms: ${graft.llm.Retrieval.invertedIndex(
        docs, "doc_id", "text", maxPostings = 5).count()}")
    }

    val emb = Tables.t(spark, dir, "embeddings")
    val vecs = (0 until factor).map(i =>
      emb.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        col("embedding"), col("label")))
      .reduce(_ unionByName _).persist()
    println(s"vecs: ${vecs.count()}")
    time("centroids 40k vecs") {
      println(s"  rows: ${vecs.groupBy("label")
        .agg(expr("vec_sum_micros(embedding)")).count()}")
    }

    val e0 = Tables.t(spark, dir, "events")
    val events = (0 until factor).map(i =>
      e0.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
        col("ts"), col("user_id"), col("event_type"), col("value")))
      .reduce(_ unionByName _).persist()
    println(s"events: ${events.count()}")
    time("broadcast as-of 2M facts") {
      // reference = ALL base-slice clicks (~50k rows at sf0.1 — well
      // under the maxRightRows guard); the fact side is 20x
      val ref = e0.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("ref_ts"),
          col("event_id").as("ref_id"))
      val out = AsOfJoin.broadcastJoin(
        events.filter(col("event_type") === "purchase"), ref,
        keys = Seq("user_id"), leftTime = "ts", rightTime = "ref_ts")
      println(s"  rows: ${out.count()}")
    }

    spark.stop()
  }
}
