package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object CcProf {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[cc] $n%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s"); r }
    val dir = "/root/testdata/sf0.1"
    val d = Tables.t(spark, dir, "documents")
    for (round <- 1 to 2) {
      // mirror q_dup_clusters stages
      val pairs = time("lsh-pairs") {
        val p = graft.llm.Dedup.nearDuplicates(d, "doc_id", "text")
          .localCheckpoint(true)
        println("  pairs: " + p.count()); p }
      val cc = time("connected-components") {
        val c = graft.llm.Dedup.connectedComponentsStars(
          pairs.select(col("id_a"), col("id_b"))).localCheckpoint(true)
        println("  nodes: " + c.count()); c }
      time("semdedup-full") {
        println("  rows: " + graft.llm.Similarity.semanticDedup(
          Tables.t(spark, dir, "embeddings"), threshold = 0.97,
          nCentroids = 16, assignTop = 2).count())
      }
    }
    spark.stop()
  }
}
