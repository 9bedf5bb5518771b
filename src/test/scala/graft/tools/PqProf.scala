package graft
import graft.llm.Pq
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PqProf {
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
      println(f"[pq] $n%-10s ${(System.nanoTime()-t0)/1e9}%7.1f s"); r }
    val e = Tables.t(spark, "/root/testdata/sf0.1", "embeddings")
    val cb = time("train") { Pq.train(e, dim = 64, m = 16, k = 16, iters = 3) }
    val codes = time("encode") { val c = Pq.encode(e, cb).localCheckpoint(true); c.count(); c }
    time("search") {
      println("rows: " + Pq.searchTopK(codes, e, e.filter(col("vec_id") < 25), cb,
        kTop = 1, shortlist = 128).count())
    }
    spark.stop()
  }
}
