package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the round-6 temporal joins: events cloned 20x
  * (~2M rows from sf0.1) through the as-of join and binned range
  * join — verifies the one-shuffle merge shape and the binned
  * equi-join hold when the sides are far beyond broadcast size.
  * Run: sbt "Test/runMain graft.ScratchScaleR6". */
object ScratchScaleR6 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e0 = Tables.t(spark, "/root/testdata/sf0.1", "events")
      .select("event_id", "user_id", "event_type", "ts", "value")
    val factor = 20
    // clones get distinct users so key cardinality scales with data
    // (30k users, ~67 events each — the realistic shape)
    val big = (0 until factor).map(i =>
      e0.select((col("event_id") + lit(i * 10000000L)).as("event_id"),
        (col("user_id") + lit(i * 100000L)).as("user_id"),
        col("event_type"), col("ts"), col("value")))
      .reduce(_ unionByName _)
      .persist()
    println(s"events: ${big.count()} rows")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.1f s"); r
    }
    val purchases = big.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"), col("value"))
    val clicks = big.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    time("asofJoin") {
      graft.operators.AsOfJoin.join(purchases, clicks,
        "user_id", "ts", "click_ts").count()
    }
    val errors = big.filter(col("event_type") === "error")
      .select(col("event_id").as("error_id"), col("user_id"),
        col("ts").as("error_ts"),
        (col("ts") + expr("INTERVAL 1 DAY")).as("error_end"))
    time("rangeJoin") {
      graft.operators.RangeJoin.pointInInterval(
        clicks, "click_ts", errors, "error_ts", "error_end",
        Seq("user_id"), 86400L * 1000000L).count()
    }
    time("sessionize-shape") {
      // the q_sessionize window+group shape at 20x
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
      val gapUs = unix_micros(col("ts")) -
        unix_micros(lag(col("ts"), 1).over(w))
      big.withColumn("sess",
          sum(when(gapUs.isNull || gapUs > 1800000000L, 1L).otherwise(0L))
            .over(w))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n")).count()
    }
    spark.stop()
  }
}
