package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B: MultiAsset.attach WITH the spread widener (current)
  * vs the pre-r16 shape (no spread — map side at scan width),
  * alternating in one JVM so JIT/host noise cancels. */
object R16J1Spread {

  private def attachNoSpread(objs: DataFrame, dataFile: String,
                             dataFileRegex: String): DataFrame = {
    graft.GraftFunctions.register(objs.sparkSession)
    val payload = objs.columns
      .filterNot(c => c == "assets" || c == "product_id").toSeq
    val matched = objs
      .select(
        call_function("multi_asset_parts", col("remote_fileurl"),
          lit(dataFileRegex), lit(dataFile)).as("__ma"),
        struct(payload.map(col): _*).as("__row"))
      .filter(col("__ma").isNotNull)
    val grouped = matched
      .select(col("__ma.product_id").as("product_id"),
        struct(col("__ma.asset_name").as("asset_name"),
          col("__row.remote_fileurl").as("href")).as("__e"),
        when(col("__ma.is_data"), col("__row")).as("__d"))
      .groupBy("product_id")
      .agg(sort_array(collect_list(col("__e"))).as("__es"),
        collect_list(col("__d")).as("__ds"))
    val deduped = filter(col("__es"), (e, i) =>
      (i === size(col("__es")) - 1) ||
        element_at(col("__es"), (i + lit(2)).cast("int"))
          .getField("asset_name") =!= e.getField("asset_name"))
    grouped
      .select(col("product_id"), map_from_entries(deduped).as("assets"),
        explode(col("__ds")).as("__row"))
      .select(col("product_id") +:
        payload.map(c => col("__row").getField(c).as(c)) :+
        col("assets"): _*)
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
    graft.GraftFunctions.register(spark)
    def urls = graft.Tables.t(spark, sfDir, "lineitem").select(
      concat(lit("s3://store/prod"), col("l_orderkey").cast("string"),
        lit("_f"), col("l_linenumber").cast("string"), lit(".bin"))
        .as("remote_fileurl"))
    def run(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.count()
      (System.nanoTime() - t0) / 1e9
    }
    for (r <- 1 to 5) {
      val n = run(attachNoSpread(urls, "f1\\.bin", "prod\\d+"))
      val w = run(graft.operators.MultiAsset
        .attach(urls, "f1\\.bin", "prod\\d+"))
      println(f"round $r  no-spread $n%5.2f s   spread $w%5.2f s")
    }
    spark.stop()
  }
}
