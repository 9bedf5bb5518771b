package graft
import graft.llm.IvfPq
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object IvfPqProf {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfpq] $n%-8s ${(System.nanoTime()-t0)/1e9}%6.1f s"); r }
    val e = Tables.t(spark, "/root/testdata/sf0.1", "embeddings")
    for (round <- 1 to 2) {
      val (coarse, rcb) = time("train") {
        IvfPq.train(e, nCells = 16, m = 16, k = 16, iters = 3) }
      val codes = time("encode") {
        val c = IvfPq.encode(e, coarse, rcb).localCheckpoint(true)
        c.count(); c }
      time("search") {
        println("  rows: " + IvfPq.searchTopK(codes, e,
          e.filter(col("vec_id") < 25), coarse, rcb,
          kTop = 1, nProbe = 14, shortlist = 192).count())
      }
    }
    spark.stop()
  }
}
