package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Old-vs-new J1 shape probe: the r12 two-branch join-back plan
  * (reconstructed here) against the r13 single-agg MultiAsset.attach,
  * interleaved in one session so JIT/IO warmth cancels out. */
object J1Probe {

  /** The r12 shape, verbatim (minus the operator object): extract →
    * groupBy building the map → shuffle-hash join back. */
  private def attachOld(objs: DataFrame, dataFile: String,
                        dataFileRegex: String): DataFrame = {
    val pid = regexp_extract(col("remote_fileurl"), dataFileRegex, 0)
    val withPid = objs.withColumn("product_id", when(pid =!= "", pid))
    val matched = withPid.filter(col("product_id").isNotNull)
    val assetName = regexp_replace(col("remote_fileurl"),
      s".*$dataFileRegex[-_.]?", "")
    val groups = matched
      .select(col("product_id"), assetName.as("asset_name"),
        col("remote_fileurl").as("href"))
      .groupBy("product_id", "asset_name").agg(max("href").as("href"))
      .groupBy("product_id")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("asset_name"), col("href"))))).as("sibling_assets"))
    val residual = col("remote_fileurl").rlike(s"$dataFileRegex.*$dataFile")
    val dataFilter = col("remote_fileurl").contains("f1.bin") && residual
    matched.drop("assets")
      .filter(dataFilter)
      .join(groups.hint("shuffle_hash"), "product_id")
      .withColumnRenamed("sibling_assets", "assets")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftFunctions.register(spark)
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/graft_sf1")
    for (dir <- dirs; round <- 1 to 3) {
      def objs: DataFrame = graft.Tables.t(spark, dir, "lineitem").select(
        concat(lit("s3://store/prod"), col("l_orderkey").cast("string"),
          lit("_f"), col("l_linenumber").cast("string"), lit(".bin"))
          .as("remote_fileurl"))
      def time(label: String)(df: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"$dir round $round $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("old")(attachOld(objs, "f1\\.bin", "prod\\d+"))
      time("new")(graft.operators.MultiAsset.attach(objs, "f1\\.bin", "prod\\d+"))
    }
    spark.stop()
  }
}
