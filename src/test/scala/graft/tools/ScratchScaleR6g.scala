package graft

import graft.llm.{Pq, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the PQ ANN path: sf0.1 embeddings cloned 20x
  * (40k vectors) — codebooks still train on the bounded sample, the
  * full corpus only pays the encode map pass and ADC scoring. Also
  * re-times PageRank at 20x edges (the layout-reuse path). Run:
  * sbt "Test/runMain graft.ScratchScaleR6g". */
object ScratchScaleR6g {
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
      println(f"$name%-18s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }

    val factor = 20
    val e0 = Tables.t(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding")
    val vecs = (0 until factor).map(i =>
      e0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _).persist()
    println(s"vecs: ${vecs.count()}")

    val cb = time("pq train") {
      Pq.train(vecs, dim = 64, m = 16, k = 16, iters = 3)
    }
    val codes = time("pq encode 40k") {
      val c = Pq.encode(vecs, cb).localCheckpoint(true); c.count(); c
    }
    time("pq search 25q") {
      val r = Pq.searchTopK(codes, vecs,
        vecs.filter(col("vec_id") < 25), cb, kTop = 1, shortlist = 128)
      println(s"  rows: ${r.count()}")
    }
    // recall sanity at scale: every query's clone (exact cosine 1)
    // must be its reported top-1
    time("pq clone recall") {
      val r = Pq.searchTopK(codes, vecs,
        vecs.filter(col("vec_id") < 25), cb, kTop = 1, shortlist = 128)
        .filter(col("nn_id") === col("query_id") + 10000000L)
      println(s"  clone-top1: ${r.count()} of 25")
    }

    val li = Tables.t(spark, "/root/testdata/sf0.1", "lineitem")
      .select("l_orderkey", "l_suppkey")
    val ord = Tables.t(spark, "/root/testdata/sf0.1", "orders")
      .select("o_orderkey", "o_custkey")
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(concat(lit("c"), col("o_custkey")).as("a"),
        concat(lit("s"), col("l_suppkey")).as("b")).distinct()
    val edges = (0 until factor).map(i =>
      pairs.select(concat(lit(i.toString), col("a")).as("src"),
        concat(lit(i.toString), col("b")).as("dst")))
      .reduce(_ unionByName _)
      .unionByName(pairs.select(col("b").as("src"), col("a").as("dst")))
    time("pagerank 20x edges") {
      val r = graft.graph.PageRank.run(edges, iterations = 5)
      println(s"  nodes: ${r.count()}")
    }
    spark.stop()
  }
}
