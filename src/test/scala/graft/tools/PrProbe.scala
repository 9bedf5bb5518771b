package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r14-judge watch-item probe: q_pagerank judge-solo moved
  * 3.41s → 4.08s across the round that refactored PageRank.run into
  * runWithStats (+ tolL1 early-exit, never armed in the registry
  * query). At tolL1=0 the executed plan is verbatim identical — the
  * diff adds one reference assignment and one boolean test per
  * iteration — so the expectation is "noise"; this probe measures it
  * instead of arguing it. The r13 body is reconstructed VERBATIM as
  * `runOld` and interleaved old/new in one session (J1Probe
  * methodology: JIT, page-cache and GC warmth cancel out), driving
  * the full q_pagerank query shape including the edge build and the
  * string-label reattach. q_winnow_incremental (NOT touched in r14,
  * judge-solo 1.26s → 2.04s) rides along as a pure repeatability
  * series in the same session. */
object PrProbe {

  /** The r13 PageRank.run body, verbatim (PageRank.scala @ 88ae683)
    * minus the stats plumbing r14 added. */
  private def runOld(edges: DataFrame, iterations: Int = 5): DataFrame = {
    require(iterations >= 0, s"iterations must be >= 0: $iterations")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val par = edges.sparkSession.sessionState.conf.numShufflePartitions
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val degEdges = e.join(outDeg, "src")
      .repartition(par, col("src"))
      .localCheckpoint(true)
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0L))
    val Scale = 1000000000000L
    var ranks = nodes.withColumn("rank", lit(Scale / n)).localCheckpoint(true)
    val teleport = (3L * Scale) / (20L * n)
    var iter = 0
    while (iter < iterations) {
      val contrib = degEdges
        .join(ranks.hint("SHUFFLE_HASH"),
          degEdges("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contrib.hint("SHUFFLE_HASH"),
          nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr("17 * coalesce(in_mass, 0L) div 20")).as("rank"))
        .localCheckpoint(false)
      iter += 1
    }
    ranks
  }

  /** q_pagerank's exact shape (Queries.pageRank) with the PageRank
    * engine pluggable. */
  private def pageRankQuery(s: SparkSession, dir: String,
                            run: DataFrame => DataFrame): DataFrame = {
    val li = graft.Tables.t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val ord = graft.Tables.t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
      .distinct()
    val ck2 = col("ck").cast("long") * 2
    val sk2 = col("sk").cast("long") * 2 + 1
    val edges = pairs
      .select(ck2.as("src"), sk2.as("dst"))
      .unionByName(pairs.select(sk2.as("src"), ck2.as("dst")))
    run(edges)
      .select(concat(
          when(col("node") % 2 === 0, lit("c")).otherwise(lit("s")),
          shiftright(col("node"), 1).cast("string")).as("node"),
        col("rank").as("rank_e12"))
      .orderBy("node")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def cool(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(100)
    }
    def time(label: String)(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label: $s%.2f s"); cool(); s
    }
    // untimed warm round (codegen + page cache), then interleave
    time("warm old")(pageRankQuery(spark, dir, runOld(_)))
    time("warm new")(pageRankQuery(spark, dir,
      graft.graph.PageRank.run(_)))
    time("warm winnow")(graft.LlmQueries.winnowIncremental(spark, dir))
    val (olds, news, wins) = (Seq.newBuilder[Double],
      Seq.newBuilder[Double], Seq.newBuilder[Double])
    for (round <- 1 to 6) {
      olds += time(s"round $round pagerank OLD(r13)")(
        pageRankQuery(spark, dir, runOld(_)))
      news += time(s"round $round pagerank NEW(r14)")(
        pageRankQuery(spark, dir, graft.graph.PageRank.run(_)))
      wins += time(s"round $round winnow_incremental")(
        graft.LlmQueries.winnowIncremental(spark, dir))
    }
    def stats(name: String, xs: Seq[Double]): Unit =
      println(f"$name: min ${xs.min}%.2f  median " +
        f"${xs.sorted.apply(xs.size / 2)}%.2f  max ${xs.max}%.2f")
    stats("pagerank OLD", olds.result())
    stats("pagerank NEW", news.result())
    stats("winnow_incr ", wins.result())
    spark.stop()
  }
}
