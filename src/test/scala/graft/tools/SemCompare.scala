package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One-off equivalence run: the r12 FLAT semanticDedup (reconstructed
  * here verbatim — full-corpus assignment, no collapse) vs the r13
  * collapse+hierarchical path, on the q_semdedup corpus at a given
  * dir. Prints the number of rows whose (cluster_id, keep) differ. */
object SemCompare {

  private def flatOld(corpus: DataFrame, threshold: Double,
                      nCentroids: Int, assignTop: Int): DataFrame = {
    import graft.llm.{Dedup, Pq, Similarity}
    val c0 = corpus.select(col("vec_id").as("id"),
      transform(col("embedding"), _.cast("double")).as("vec"))
    val cb = Pq.train(corpus, m = 1, k = nCentroids, iters = 5,
      sampleSize = math.max(2048, 32 * nCentroids),
      idCol = "vec_id", vecCol = "embedding").head
      .zipWithIndex.map { case (v, i) => (i, v) }
    val cbLit = typedlit(cb)
    val scoredCells = transform(cbLit, e => struct(
      (lit(0.0) - Similarity.dot(col("vec"), e.getField("_2"))).as("d"),
      e.getField("_1").as("cid")))
    val assigned = c0.select(col("id"), col("vec"),
      explode(transform(slice(array_sort(scoredCells), 1, assignTop),
        _.getField("cid"))).as("cell"))
    val a = assigned.select(col("cell"), col("id").as("id_a"),
      col("vec").as("vec_a"))
    val b = assigned.select(col("cell"), col("id").as("id_b"),
      col("vec").as("vec_b"))
    val edges = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(Similarity.cosine(col("vec_a"), col("vec_b")) >= threshold)
      .select("id_a", "id_b").distinct()
    val comps = Dedup.connectedComponentsStars(edges)
    corpus.select(col("vec_id"))
      .join(comps.withColumnRenamed("id", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("component"), col("vec_id")).as("cluster_id"))
      .withColumn("keep", col("cluster_id") === col("vec_id"))
  }

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
    graft.GraftFunctions.register(spark)
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
    val newOut = graft.llm.Similarity.semanticDedup(all,
      threshold = 0.999, nCentroids = k, assignTop = 2)
      .withColumnRenamed("cluster_id", "c_new")
      .withColumnRenamed("keep", "k_new")
    newOut.cache().count()
    println(f"new: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    t0 = System.nanoTime()
    val oldOut = flatOld(all, 0.999, k, 2)
      .withColumnRenamed("cluster_id", "c_old")
      .withColumnRenamed("keep", "k_old")
    oldOut.cache().count()
    println(f"old: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    val j = newOut.join(oldOut, Seq("vec_id"), "full")
    val diff = j.filter(!(col("c_new") <=> col("c_old")) ||
      !(col("k_new") <=> col("k_old")))
    println(s"rows=${j.count()} diff=${diff.count()}")
    println(s"keep_new=${newOut.filter(col("k_new")).count()} " +
      s"keep_old=${oldOut.filter(col("k_old")).count()}")
    diff.show(20, truncate = false)
    spark.stop()
  }
}
