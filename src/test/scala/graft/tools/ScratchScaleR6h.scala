package graft

import graft.llm.Phrases
import graft.operators.{Cdc, Resample, SpatialJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale sanity for the round-6 continuation batch: events cloned 20x
  * (2M rows) for CDC apply / resample / rolling-DAU shapes, documents
  * cloned 20x (100k docs) for PMI, a 10k-node circulant graph for
  * triangles, and 20x points vs boxes for the spatial grid join. Run:
  * sbt "Test/runMain graft.ScratchScaleR6h". */
object ScratchScaleR6h {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%7.1f s"); r
    }

    val factor = 20
    val dir = "/root/testdata/sf0.1"

    val e0 = Tables.t(spark, dir, "events")
    val events = (0 until factor).map(i =>
      e0.select((col("event_id") + lit(i * 100000000L)).as("event_id"),
        col("ts"), (col("user_id") + lit(i * 10000L)).as("user_id"),
        col("event_type"), col("value")))
      .reduce(_ unionByName _).persist()
    println(s"events: ${events.count()}")

    time("cdc apply 2M") {
      val base = events.select(col("event_id").as("k"), col("event_type"),
        col("value"))
      val chg = events.filter(pmod(col("event_id"), lit(3)) === 0)
        .select(col("event_id").as("k"),
          when(pmod(col("event_id"), lit(9)) === 0, lit("delete"))
            .otherwise(lit("upsert")).as("op"),
          col("ts"), col("event_id").as("seq"), col("event_type"),
          (col("value") + 1).as("value"))
      println(s"  rows: ${Cdc.applyChangelog(base, chg, Seq("k")).count()}")
    }

    time("resample ffill 2M") {
      val r = Resample.ffill(events.filter(col("user_id") % 100 === 0),
        "user_id", "ts", "value", 86400L, "event_id")
      println(s"  rows: ${r.count()}")
    }

    val d0 = Tables.t(spark, dir, "documents").select("doc_id", "text")
    val docs = (0 until factor).map(i =>
      d0.select((col("doc_id") + lit(i * 1000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _).persist()
    println(s"docs: ${docs.count()}")

    time("pmi bigrams 100k docs") {
      println(s"  rows: ${
        Phrases.pmiBigrams(docs, "doc_id", "text", minCount = 50L).count()}")
    }

    time("triangles 10k nodes") {
      val n = 10000
      val ids = spark.range(n).select(col("id").as("node"))
      // same topology family as q_triangles: +1, +2, and 7k+3 edges
      val raw = Seq(
        ids.select(col("node").as("src"),
          pmod(col("node") + 1, lit(n.toLong)).as("dst")),
        ids.select(col("node").as("src"),
          pmod(col("node") + 2, lit(n.toLong)).as("dst")),
        ids.select(col("node").as("src"),
          pmod(col("node") * 7 + 3, lit(n.toLong)).as("dst")))
        .reduce(_ unionAll _)
      println(s"  triangles: ${
        graft.graph.Triangles.count(raw).collect().head.getLong(0)}")
    }

    time("spatial join 30k x 40k") {
      val pts = Tables.t(spark, dir, "customer").select(
        col("c_custkey").as("point_id"),
        (pmod(col("c_custkey") * 37, lit(360)) - 180 + lit(0.5)).as("px"),
        (pmod(col("c_custkey") * 53, lit(170)) - 85 + lit(0.5)).as("py"))
      val boxes = Tables.t(spark, dir, "part").select(
        col("p_partkey").as("box_id"),
        (pmod(col("p_partkey") * 41, lit(340)) - 170).cast("double").as("xmin"),
        (pmod(col("p_partkey") * 59, lit(150)) - 75).cast("double").as("ymin"))
        .withColumn("xmax", col("xmin") + 1 + pmod(col("box_id"), lit(7)))
        .withColumn("ymax", col("ymin") + 1 + pmod(col("box_id"), lit(5)))
      println(s"  pairs: ${SpatialJoin.pointInBox(pts, boxes,
        "px", "py", "xmin", "ymin", "xmax", "ymax", 8.0).count()}")
    }

    spark.stop()
  }
}
