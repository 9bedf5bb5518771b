package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level profile of the J1 multi-asset pipeline. */
object ScratchJ1 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  n=$n")
    }
    val objs = Tables.t(spark, dir, "lineitem").select(
      concat(lit("s3://store/prod"), col("l_orderkey").cast("string"),
        lit("_f"), col("l_linenumber").cast("string"), lit(".bin"))
        .as("remote_fileurl"))
    val dataFileRegex = "prod\\d+"
    val dataFile = "f1\\.bin"
    val pid = regexp_extract(col("remote_fileurl"), dataFileRegex, 0)
    val withPid = objs.withColumn("product_id", when(pid =!= "", pid))
    val matched = withPid.filter(col("product_id").isNotNull)
    time("matched scan")(matched.count())
    val assetName = regexp_replace(col("remote_fileurl"),
      s".*$dataFileRegex[-_.]?", "")
    time("assetName proj")(matched.select(assetName.as("a")).filter(col("a") =!= "zzz").count())
    val dedup = matched
      .select(col("product_id"), assetName.as("asset_name"),
        col("remote_fileurl").as("href"))
      .groupBy("product_id", "asset_name").agg(max("href").as("href"))
    time("groupBy pid+asset")(dedup.count())
    val groups = dedup.groupBy("product_id")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("asset_name"), col("href"))))).as("sibling_assets"))
    time("groupBy pid -> map")(groups.count())
    val joined = matched.join(groups.hint("shuffle_hash"), "product_id")
    time("join")(joined.count())
    val filtered = joined
      .filter(col("remote_fileurl").rlike(s".*$dataFileRegex.*$dataFile"))
    time("rlike filter")(filtered.count())
    time("full attach")(graft.operators.MultiAsset.attach(objs, dataFile, dataFileRegex).count())
    time("full query")(Queries.j1MultiAsset(spark, dir).count())
    spark.stop()
  }
}
