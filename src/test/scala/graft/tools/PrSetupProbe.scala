package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B probe: r14 PageRank setup (eager localCheckpoints
  * for nodes/outDeg/ranks0) vs the r15 lazy-setup variant, both driving
  * the full q_pagerank edge construction at sf0.1 — J1Probe
  * methodology (alternating in one session so JIT/host noise cancels).
  * The iteration loop is byte-identical between the two. */
object PrSetupProbe {

  private def body(edges: DataFrame, eager: Boolean): Long = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val par = edges.sparkSession.sessionState.conf.numShufflePartitions
    val nodes0 = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
    val nodes = nodes0.localCheckpoint(eager)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(eager)
    val degEdges = e.join(outDeg, "src")
      .repartition(par, col("src"))
      .localCheckpoint(true)
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(graft.graph.PageRank.Scale / n))
      .localCheckpoint(eager)
    val teleport = (3L * graft.graph.PageRank.Scale) / (20L * n)
    for (_ <- 1 to 5) {
      val contrib = degEdges
        .join(ranks.hint("SHUFFLE_HASH"), degEdges("src") === ranks("node"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes
        .join(contrib.hint("SHUFFLE_HASH"),
          nodes("node") === contrib("dst"), "left")
        .select(col("node"),
          (lit(teleport) + expr("17 * coalesce(in_mass, 0L) div 20"))
            .as("rank"))
        .localCheckpoint(false)
    }
    ranks.count()
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def edges: DataFrame = {
      val li = graft.Tables.t(spark, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val ord = graft.Tables.t(spark, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
      val ck2 = col("ck").cast("long") * 2
      val sk2 = col("sk").cast("long") * 2 + 1
      pairs.select(ck2.as("src"), sk2.as("dst"))
        .unionByName(pairs.select(sk2.as("src"), ck2.as("dst")))
    }
    def drop(): Unit = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      System.gc()
    }
    for (round <- 1 to 5) {
      drop()
      val t0 = System.nanoTime()
      body(edges, eager = true)
      val t1 = System.nanoTime()
      drop()
      val t2 = System.nanoTime()
      body(edges, eager = false)
      val t3 = System.nanoTime()
      println(f"round $round: eager ${(t1 - t0) / 1e9}%5.2f s   lazy ${(t3 - t2) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
