package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B: PageRank with the r15 EAGER edge checkpoint vs the
  * r16 LAZY one (degEdges' eager populate computes it in-job).
  * Both run the full q_pagerank shape; values are identical. */
object R16PrE {
  private def run(edges: DataFrame, eagerE: Boolean): DataFrame = {
    val Scale = 1000000000000L
    val e = edges.select(col("src"), col("dst")).localCheckpoint(eagerE)
    val par = edges.sparkSession.sessionState.conf.numShufflePartitions
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(false)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(false)
    val degEdges = e.join(outDeg, "src")
      .repartition(par, col("src"))
      .localCheckpoint(true)
    val n = nodes.count()
    var ranks = nodes.withColumn("rank", lit(Scale / n)).localCheckpoint(false)
    val teleport = (3L * Scale) / (20L * n)
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
    ranks
  }

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
    def edges: DataFrame = {
      val li = graft.Tables.t(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val ord = graft.Tables.t(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val pairs = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .select(col("o_custkey").as("ck"), col("l_suppkey").as("sk"))
        .distinct()
      val ck2 = col("ck").cast("long") * 2
      val sk2 = col("sk").cast("long") * 2 + 1
      pairs.select(ck2.as("src"), sk2.as("dst"))
        .unionByName(pairs.select(sk2.as("src"), ck2.as("dst")))
    }
    def timed(eagerE: Boolean): Double = {
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = true))
      val t0 = System.nanoTime()
      run(edges, eagerE).count()
      (System.nanoTime() - t0) / 1e9
    }
    for (r <- 1 to 5)
      println(f"round $r  eagerE ${timed(true)}%5.2f s   lazyE ${timed(false)}%5.2f s")
    spark.stop()
  }
}
