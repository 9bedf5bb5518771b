package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B of q_semdedup's cell count at a given SF: fixed 16 cells vs
  * corpus-scaled — prints timing and whether the KEEP SETS agree
  * exactly (they must: exact-clone pairs co-cell by construction at
  * any k, and near-clone recall is what assignTop=2 exists for). */
object SemScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.t(spark, sfDir, "embeddings")
      .select("vec_id", "embedding")
    val near = e.filter(pmod(col("vec_id"), lit(3)) === 0)
      .select((col("vec_id") + 200000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.02f)),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
          .as("embedding"))
    val all = e
      .unionByName(e.select((col("vec_id") + graft.LlmQueries.CloneOffset)
        .as("vec_id"), col("embedding")))
      .unionByName(near)
      .localCheckpoint(true)
    val n = all.count()
    println(s"n=$n")
    def run(k: Int): (Long, Set[Long], Double) = {
      val t0 = System.nanoTime()
      val keep = graft.llm.Similarity.semanticDedup(all,
        threshold = 0.999, nCentroids = k, assignTop = 2)
        .select("vec_id").collect().map(_.getLong(0)).toSet
      (keep.size.toLong, keep, (System.nanoTime() - t0) / 1e9)
    }
    val kScaled = math.max(16, (n / 300L).toInt)
    for ((label, k) <- Seq(("fixed16", 16), ("fixed16b", 16),
      (s"scaled$kScaled", kScaled), (s"scaled${kScaled}b", kScaled))) {
      val (sz, _, t) = run(k)
      println(f"$label k=$k keep=$sz time=$t%.2f s")
    }
    val a = run(16)._2
    val b = run(kScaled)._2
    println(s"keep sets equal: ${a == b} (|a|=${a.size}, |b|=${b.size}, " +
      s"diff=${(a diff b).size + (b diff a).size})")
    spark.stop()
  }
}
