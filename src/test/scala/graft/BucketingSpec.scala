package graft

import graft.operators.Bucketing
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Co-located joins over bucketed tables: the write-once shuffle is
  * amortized — the join itself must contain NO Exchange. */
class BucketingSpec extends SparkSuite {

  test("join of two bucketed tables runs without any shuffle") {
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("buckets")
    val orders = Tables.t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    val lineitem = Tables.t(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    Bucketing.writeBucketed(orders, "b_orders",
      s"$base/b_orders", 8, Seq("o_orderkey"))
    Bucketing.writeBucketed(lineitem, "b_lineitem",
      s"$base/b_lineitem", 8, Seq("l_orderkey"))
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem",
        col("o_orderkey") === col("l_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      // and it still computes the right thing
      val n = joined.count()
      val expected = orders.join(lineitem,
        col("o_orderkey") === col("l_orderkey")).count()
      assert(n == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }

  test("ensureBucketed prepares once, skips unchanged, rewrites on " +
    "fingerprint change") {
    val dir = "/root/testdata/sf0.001"
    val base = Files.createTempDirectory("buckets_ensure")
    val orders = Tables.t(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
    def dataFiles(): Set[String] = {
      val d = new java.io.File(s"$base/e_orders")
      d.listFiles().filter(_.getName.startsWith("part-"))
        .map(f => s"${f.getName}:${f.lastModified}").toSet
    }
    try {
      Bucketing.ensureBucketed(orders, "e_orders",
        s"$base/e_orders", 8, Seq("o_orderkey"), "v1")
      val first = dataFiles()
      // same fingerprint: files untouched
      Bucketing.ensureBucketed(orders, "e_orders",
        s"$base/e_orders", 8, Seq("o_orderkey"), "v1")
      assert(dataFiles() == first)
      // changed fingerprint: rewritten
      Bucketing.ensureBucketed(orders, "e_orders",
        s"$base/e_orders", 8, Seq("o_orderkey"), "v2")
      assert(dataFiles() != first)
      assert(spark.table("e_orders").count() == orders.count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS e_orders")
    }
  }

  test("ensureBucketed re-prepares when the table name was re-pointed " +
    "at a different path (no stale cross-dir skip)") {
    import spark.implicits._
    val base = Files.createTempDirectory("buckets_xdir")
    val dfA = Seq((1L, "a")).toDF("k", "v")
    val dfB = Seq((2L, "b")).toDF("k", "v")
    try {
      Bucketing.ensureBucketed(dfA, "x_t", s"$base/a", 2, Seq("k"), "A")
      Bucketing.ensureBucketed(dfB, "x_t", s"$base/b", 2, Seq("k"), "B")
      // back to path A: its marker still matches, but the catalog entry
      // now points at B — the skip must NOT serve B's data
      Bucketing.ensureBucketed(dfA, "x_t", s"$base/a", 2, Seq("k"), "A")
      assert(spark.table("x_t").select("v").collect()
        .map(_.getString(0)).toSeq == Seq("a"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS x_t")
    }
  }
}
