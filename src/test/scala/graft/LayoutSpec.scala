package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import java.nio.file.Files

class LayoutSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def tmp(name: String) =
    Files.createTempDirectory(name).toFile.getAbsolutePath

  test("bucketOf: rank among ascending cuts") {
    val df = Seq(5.0, 10.0, 15.0, 25.0).toDF("v")
      .select(Layout.bucketOf(col("v"), Seq(10.0, 20.0)).as("b"))
    assert(df.as[Int].collect().toSeq === Seq(0, 1, 1, 2))
  }

  test("interleaveBits: morton code of two dims") {
    val df = Seq((3L, 0L), (0L, 3L), (2L, 1L)).toDF("x", "y")
      .select(Layout.interleaveBits(Seq(col("x"), col("y")), 2).as("z"))
    // x bits land at even positions, y bits at odd
    assert(df.as[Long].collect().toSeq === Seq(5L, 10L, 6L))
  }

  test("interleaveBits rejects widths that would spill past bit 62") {
    val cols = (1 to 5).map(i => col(s"c$i"))
    intercept[IllegalArgumentException] {
      Layout.interleaveBits(cols, 16)
    }
  }

  test("compact: many small files become few target-sized files, rows kept") {
    val in = tmp("layout-in")
    val out = tmp("layout-out")
    val events = Tables.t(spark, sf, "events")
    events.repartition(40).write.mode("overwrite").parquet(in)
    assert(spark.read.parquet(in).inputFiles.length >= 40)
    val total = spark.read.parquet(in).inputFiles.map(f =>
      new java.io.File(new java.net.URI(f)).length).sum
    val stats = Layout.compact(spark, in, out, targetBytes = total / 3)
    assert(stats.inFiles >= 40)
    assert(stats.outFiles <= 8, s"expected few files, got ${stats.outFiles}")
    assert(spark.read.parquet(out).count() === events.count())
  }

  test("zorderWrite + skip index: narrow filters touch few files") {
    val out = tmp("layout-z")
    val events = Tables.t(spark, sf, "events")
      .select("event_id", "user_id", "value")
    Layout.zorderWrite(events, Seq("user_id", "value"), out,
      numFiles = 16, bitsPerDim = 6)
    val files = spark.read.parquet(out).inputFiles
    assert(files.length === 16)

    Layout.buildSkipIndex(spark, out, Seq("user_id", "value"))

    // clustering quality: per-file user_id span is a fraction of global
    val (uMin, uMax) = events.agg(min("user_id"), max("user_id"))
      .as[(Long, Long)].head()
    val spans = spark.read.parquet(s"$out/_skip_index")
      .select((col("user_id_max") - col("user_id_min")).cast("double"))
      .as[Double].collect()
    val avgSpan = spans.sum / spans.length / (uMax - uMin).toDouble
    assert(avgSpan < 0.6, s"files not clustered: avg span $avgSpan")

    // pruning on the FIRST dim
    val lo = uMin
    val hi = uMin + (uMax - uMin) / 10
    val pruned = Layout.prunedFiles(spark, out, "user_id", lo, hi)
    assert(pruned.length < files.length / 2,
      s"pruned ${pruned.length} of ${files.length}")
    // pruning stays correct
    val got = Layout.prunedRead(spark, out, "user_id", lo, hi)
      .filter(col("user_id").between(lo, hi)).count()
    val want = events.filter(col("user_id").between(lo, hi)).count()
    assert(got === want)

    // and on the SECOND dim too — the point of z-order vs linear sort
    val prunedV = Layout.prunedFiles(spark, out, "value", 0.0, 5.0)
    assert(prunedV.length < files.length,
      s"value-dim pruning got ${prunedV.length} of ${files.length}")
  }

  test("prunedRead: empty prune returns empty frame with schema") {
    val out = tmp("layout-z2")
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("user_id", "value")
    df.write.mode("overwrite").parquet(out)
    Layout.buildSkipIndex(spark, out, Seq("user_id"))
    val r = Layout.prunedRead(spark, out, "user_id", 100L, 200L)
    assert(r.columns.toSeq === Seq("user_id", "value"))
    assert(r.count() === 0)
  }

  test("shuffledShards: deterministic shards, md5 physical order, " +
    "whole shards per partition") {
    val docs = (1L to 300L).toDF("id")
    val a = Layout.shuffledShards(docs, col("id"), 8)
    val b = Layout.shuffledShards(docs.repartition(7), col("id"), 8)
    assert(a.orderBy("shard", "id").collect().toSeq ==
      b.orderBy("shard", "id").collect().toSeq)
    // every row present exactly once, shards in [0, 8)
    assert(a.count() == 300)
    assert(a.select("shard").distinct().collect()
      .map(_.getInt(0)).forall(s => s >= 0 && s < 8))
    // physical within-partition order: (shard, md5(id)) nondecreasing,
    // and a shard never splits across partitions
    val parts = a.select(col("shard"),
        md5(col("id").cast("string")).as("h"))
      .rdd.mapPartitions { it =>
        val rows = it.map(r => (r.getInt(0), r.getString(1))).toVector
        Iterator((rows, rows.sortBy(identity) == rows))
      }.collect()
    assert(parts.forall(_._2), "rows not sorted within a partition")
    val shardToParts = parts.zipWithIndex.flatMap { case ((rows, _), i) =>
      rows.map(_._1 -> i)
    }.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
    assert(shardToParts.values.forall(_ == 1), "a shard split partitions")
  }
}
