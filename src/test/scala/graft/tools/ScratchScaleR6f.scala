package graft

import graft.llm.{Classifier, Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the round-6 continuation ops: NB quality
  * classifier and cross-doc spans on sf0.1 documents cloned 20x
  * (100k docs); semantic dedup on sf0.1 embeddings cloned 20x (100k
  * vectors, 128 cells — cells sized ~800 so in-cell pairwise stays
  * bounded). Run: sbt "Test/runMain graft.ScratchScaleR6f". */
object ScratchScaleR6f {
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

    val factor = 20
    val d0 = Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select("doc_id", "text", "lang")
    val docs = (0 until factor).map(i =>
      d0.select((col("doc_id") + lit(i * 10000000L)).as("doc_id"),
        col("text"), col("lang")))
      .reduce(_ unionByName _).persist()
    println(s"docs: ${docs.count()} rows")

    time("nb train+score") {
      val n = Classifier.nbTrainScore(
        docs.withColumn("is_en", col("lang") === "en"),
        "doc_id", "text", "is_en")
        .filter(col("pred")).count()
      println(s"  predicted positive: $n")
    }
    time("cross-doc spans") {
      // clones make every doc's full text a shared span; df cap 50
      // drops the 20-copy boilerplate grams? No — 20 copies < 50, so
      // spans survive; the cap bounds the hash-join fan-out
      val n = Dedup.crossDocSpans(docs, "doc_id", "text",
        k = 5, maxDocFreq = 50).count()
      println(s"  spans: $n")
    }

    val e0 = Tables.t(spark, "/root/testdata/sf0.1", "embeddings")
      .select("vec_id", "embedding")
    val vecs = (0 until factor).map(i =>
      e0.select((col("vec_id") + lit(i * 10000000L)).as("vec_id"),
        col("embedding")))
      .reduce(_ unionByName _).persist()
    println(s"vecs: ${vecs.count()} rows")
    time("semantic dedup") {
      // every vector has 19 exact clones → 5000 clusters of 20; 128
      // cells over 100k vecs (×2 dual assign) ≈ 1.6k rows/cell →
      // ~1.2M in-cell pairs/cell, ~150M verified pairs total
      val out = Similarity.semanticDedup(vecs, threshold = 0.999,
        nCentroids = 128, assignTop = 2)
      println(s"  kept: ${out.filter(col("keep")).count()} of 100000")
    }
    spark.stop()
  }
}
