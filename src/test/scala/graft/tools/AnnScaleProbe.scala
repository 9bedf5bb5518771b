package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Recall-vs-shortlist probe for the PQ ANN paths at scale: computes
  * the exact cosine top-1 for the 25 fixed queries over a given
  * embeddings table, then sweeps PQ / IVF-PQ shortlist depths until
  * both recover it — the evidence behind the corpus-scaled recall
  * knobs in LlmQueries (fixed knobs tuned at 2k vectors miss at 20k).
  * Run: `sbt "Test/runMain graft.tools.AnnScaleProbe [dir]"`. */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    println(s"n vectors: $n")
    val exact = graft.llm.Similarity.bruteForceTopK(
      e, e.filter(col("vec_id") < 25), k = 1)
      .select(col("query_id"), col("nn_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cb = graft.llm.Pq.train(e, dim = 64, m = 16, k = 16, iters = 3)
    val codes = graft.llm.Pq.encode(e, cb)
    // always include the registry queries' own corpus-scaled depth so
    // the probe certifies the knobs the gates actually run with
    val sReg = math.max(192, (n / 16).toInt)
    for (s <- (Seq(128, 256, 512, 1024, 2048) :+ sReg).distinct.sorted) {
      val got = graft.llm.Pq.searchTopK(codes, e,
        e.filter(col("vec_id") < 25), cb, kTop = 1, shortlist = s)
        .select(col("query_id"), col("nn_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hits = exact.count { case (q, nn) => got.get(q).contains(nn) }
      println(s"pq shortlist $s: $hits/25 exact top-1")
    }
    val (coarse, rcb) = graft.llm.IvfPq.train(e, nCells = 16, m = 16,
      k = 16, iters = 3)
    val icodes = graft.llm.IvfPq.encode(e, coarse, rcb)
    for (np <- Seq(14, 15, 16);
         s <- (Seq(192, 512, 1024, 2048) :+ sReg).distinct.sorted) {
      val got = graft.llm.IvfPq.searchTopK(icodes, e,
        e.filter(col("vec_id") < 25), coarse, rcb, kTop = 1,
        nProbe = np, shortlist = s)
        .select(col("query_id"), col("nn_id"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val hits = exact.count { case (q, nn) => got.get(q).contains(nn) }
      println(s"ivfpq shortlist $s (nProbe $np): $hits/25 exact top-1")
    }
    spark.stop()
  }
}
