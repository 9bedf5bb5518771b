package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** DSv2 listing source: partition-parallel enumeration, pushdown of
  * path string predicates into the enumerator, no content reads. */
class ListingSourceSpec extends SparkSuite {

  private lazy val root = {
    val dir = Files.createTempDirectory("bucket2")
    Files.createDirectories(dir.resolve("a/deep"))
    Files.createDirectories(dir.resolve("b"))
    Files.writeString(dir.resolve("a/deep/x_2020.tif"), "XX")
    Files.writeString(dir.resolve("a/y_2020.dat"), "YYY")
    Files.writeString(dir.resolve("b/z_2021.tif"), "ZZZZ")
    Files.writeString(dir.resolve("top.tif"), "T")
    dir.toString
  }

  test("lists all files with length + mtime, partitioned by subtree") {
    val df = spark.read.format("graft-listing").load(root)
    val rows = df.orderBy("path").collect()
    assert(rows.length == 4)
    val byName = rows.map(r => r.getString(0).split('/').last ->
      r.getLong(1)).toMap
    assert(byName == Map("x_2020.tif" -> 2L, "y_2020.dat" -> 3L,
      "z_2021.tif" -> 4L, "top.tif" -> 1L))
    assert(rows.forall(!_.isNullAt(2)))
    // one partition per first-level subtree + one root partition
    assert(df.rdd.getNumPartitions == 3)
  }

  test("endsWith filter pushes into the enumerator") {
    val df = spark.read.format("graft-listing").load(root)
      .filter(col("path").endsWith(".tif"))
    assert(df.count() == 3)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("StringEndsWith"), plan.take(600))
  }

  test("startsWith prefix filter prunes a subtree") {
    val df = spark.read.format("graft-listing").load(root)
      .filter(col("path").startsWith(s"file:$root/a"))
    assert(df.count() == 2)
  }

  test("non-pushable predicates still evaluate above the scan") {
    val df = spark.read.format("graft-listing").load(root)
      .filter(col("path").rlike("_20\\d\\d\\.tif$") && col("length") > 2)
    assert(df.count() == 1) // only z_2021.tif (len 4)
  }

  test("count/sum/min/max push into the source (one row per subtree)") {
    val df = spark.read.format("graft-listing").load(root)
      .agg(count(lit(1)).as("n"), sum("length").as("bytes"),
        min("length").as("mn"), max("length").as("mx"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates=[count(), sum(length), " +
      "min(length), max(length)]"), plan.take(900))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      (4L, 10L, 1L, 4L))
  }

  test("pushed aggregates respect pushed filters") {
    val df = spark.read.format("graft-listing").load(root)
      .filter(col("path").endsWith(".tif"))
      .agg(count(lit(1)), sum("length"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates"), plan.take(900))
    assert(plan.contains("StringEndsWith"), plan.take(900))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1)) == (3L, 7L))
  }

  test("max(modificationTime) pushes and matches the row-level answer") {
    val src = spark.read.format("graft-listing").load(root)
    val pushedDf = src.agg(max("modificationTime"))
    assert(pushedDf.queryExecution.executedPlan.toString
      .contains("PushedAggregates=[max(modificationTime)]"))
    val pushed = pushedDf.collect().head.getTimestamp(0)
    val rowLevel = src.orderBy(col("modificationTime").desc)
      .select("modificationTime").collect().head.getTimestamp(0)
    assert(pushed == rowLevel)
  }

  test("group-by and unsupported functions fall back to row scanning") {
    val src = spark.read.format("graft-listing").load(root)
    val g = src.groupBy(col("path").endsWith(".tif")).count()
    assert(!g.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    assert(g.collect().map(_.getLong(1)).sum == 4L)
    val avg = src.agg(org.apache.spark.sql.functions.avg("length"))
    assert(!avg.queryExecution.executedPlan.toString
      .contains("PushedAggregates"))
    assert(avg.collect().head.getDouble(0) == 2.5)
  }
}
