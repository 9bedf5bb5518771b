package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage breakdown for q_semdedup at a given dir: codebook training
  * vs assignment vs the rest. */
object SemBreakdown {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf10")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = graft.Tables.t(spark, dir, "embeddings")
      .select("vec_id", "embedding")
    val near = e.filter(pmod(col("vec_id"), lit(3)) === 0)
      .select((col("vec_id") + 200000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.02f)),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
          .as("embedding"))
    val all = e
      .unionByName(e.select((col("vec_id") + 100000000L).as("vec_id"),
        col("embedding")))
      .unionByName(near)
    val ne = e.count()
    val k = math.max(16, ((2 * ne + (ne + 2) / 3) / 300L).toInt)
    println(s"n_base=$ne k=$k")
    var t0 = System.nanoTime()
    val cb = graft.llm.Pq.train(all, m = 1, k = k, iters = 5,
      sampleSize = math.max(2048, 32 * k),
      idCol = "vec_id", vecCol = "embedding").head
    println(f"train: ${(System.nanoTime() - t0) / 1e9}%.2f s (centroids ${cb.length})")
    t0 = System.nanoTime()
    graft.GraftFunctions.register(spark)
    val cbLit = typedlit(cb.zipWithIndex.map { case (v, i) => (i, v) })
    val c0 = all.select(col("vec_id").as("id"),
      transform(col("embedding"), _.cast("double")).as("vec"))
    // the EXACT assignment shape semanticDedup runs (native vec_dot
    // inside the interpreted transform-over-codebook HOF)
    val scoredCells = transform(cbLit, el => struct(
      (lit(0.0) - call_function("vec_dot", col("vec"),
        el.getField("_2"))).as("d"),
      el.getField("_1").as("cid")))
    val assigned = c0.select(col("id"), col("vec"),
      explode(transform(slice(array_sort(scoredCells), 1, 2),
        _.getField("cid"))).as("cell"))
    assigned.select("id", "cell").write.format("noop")
      .mode("overwrite").save()
    println(f"assign: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val cellSizes = assigned.groupBy("cell").count()
      .agg(max("count"), expr("percentile(count, 0.99)"),
        avg("count")).head()
    println(s"cell sizes: max=${cellSizes.get(0)} " +
      s"p99=${cellSizes.get(1)} avg=${cellSizes.get(2)}")
    val aa = assigned.select(col("cell"), col("id").as("id_a"),
      col("vec").as("vec_a"))
    val bb = assigned.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vec_b"))
    val edges = aa.join(bb, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(call_function("cosine_sim", col("vec_a"), col("vec_b"))
        >= 0.999)
      .select("id_a", "id_b").distinct()
    println(s"edges: ${edges.count()}")
    println(f"edges stage: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
