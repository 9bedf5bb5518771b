package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The optimizer rule must (a) never change results, (b) replace the
  * nested-loop/cartesian plan with an equi-join when enabled, and
  * (c) leave plans alone when disabled or when the pattern doesn't
  * match. Expected results come from the SAME query with the rule
  * disabled (i.e. Spark's own nested-loop join).
  */
class RangeJoinRuleSpec extends SparkSuite {
  import spark.implicits._

  private def points: DataFrame =
    Seq((1L, 10L), (2L, 125L), (3L, 3600L), (4L, -50L))
      .toDF("pid", "sec")
      .withColumn("pt", expr("timestamp_seconds(sec)"))
      .select("pid", "pt")

  private def intervals: DataFrame =
    Seq((100L, 0L, 120L), (200L, 120L, 4000L), (300L, -100L, 0L),
      (400L, 50L, 50L)) // empty interval
      .toDF("iid", "s_sec", "e_sec")
      .withColumn("st", expr("timestamp_seconds(s_sec)"))
      .withColumn("en", expr("timestamp_seconds(e_sec)"))
      .select("iid", "st", "en")

  private def withRule[T](on: Boolean, binMicros: Long = 60L * 1000000L)(f: => T): T = {
    spark.conf.set("spark.graft.rangeJoin.enabled", on.toString)
    spark.conf.set("spark.graft.rangeJoin.binMicros", binMicros.toString)
    try f finally {
      spark.conf.set("spark.graft.rangeJoin.enabled", "false")
    }
  }

  private def planOf(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("rewrites p >= s && p < e to an equi-join, same rows") {
    val q = () => points.join(intervals,
      col("pt") >= col("st") && col("pt") < col("en"))
      .select("pid", "iid")
    val expected = withRule(on = false)(q().collect().toSet)
    withRule(on = true) {
      val got = q()
      val plan = planOf(got)
      assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
        s"still a loop join:\n$plan")
      assert(plan.contains("_graft_bin"), s"rule did not fire:\n$plan")
      assert(got.collect().toSet === expected)
      // sanity on content: point -50 in [-100,0), 10 in [0,120), ...
      assert(expected === Set(Row2(1L, 100L), Row2(2L, 200L),
        Row2(3L, 200L), Row2(4L, 300L)))
    }
  }

  private def Row2(a: Long, b: Long) = org.apache.spark.sql.Row(a, b)

  test("keyed range join keeps extra equality conjuncts") {
    val p = points.withColumn("k", col("pid") % 2)
    val i = intervals.withColumn("k2", col("iid") % 2)
    val q = () => p.join(i,
      col("k") === col("k2") && col("pt") >= col("st") &&
        col("pt") < col("en")).select("pid", "iid")
    val expected = withRule(on = false)(q().collect().toSet)
    withRule(on = true) {
      val got = q()
      assert(!planOf(got).contains("NestedLoop"))
      assert(got.collect().toSet === expected)
    }
  }

  test("long columns and inclusive upper bound") {
    val p = Seq((1L, 10L), (2L, 120L)).toDF("pid", "x")
    val i = Seq((100L, 0L, 120L), (200L, 121L, 300L)).toDF("iid", "lo", "hi")
    val q = () => p.join(i, col("x") >= col("lo") && col("x") <= col("hi"))
      .select("pid", "iid")
    val expected = withRule(on = false)(q().collect().toSet)
    withRule(on = true, binMicros = 100L) {
      val got = q()
      assert(planOf(got).contains("_graft_bin"))
      assert(got.collect().toSet === expected)
      // 120 <= hi inclusive must match interval 100
      assert(expected.contains(Row2(2L, 100L)))
    }
  }

  test("reversed operand order (s <= p && e > p) still matches") {
    val q = () => points.join(intervals,
      col("st") <= col("pt") && col("en") > col("pt"))
      .select("pid", "iid")
    val expected = withRule(on = false)(q().collect().toSet)
    withRule(on = true) {
      val got = q()
      assert(planOf(got).contains("_graft_bin"))
      assert(got.collect().toSet === expected)
    }
  }

  test("interval side on the left still rewrites") {
    val q = () => intervals.join(points,
      col("pt") >= col("st") && col("pt") < col("en"))
      .select("pid", "iid")
    val expected = withRule(on = false)(q().collect().toSet)
    withRule(on = true) {
      val got = q()
      assert(planOf(got).contains("_graft_bin"))
      assert(got.collect().toSet === expected)
    }
  }

  test("disabled by default: plan untouched") {
    val got = points.join(intervals,
      col("pt") >= col("st") && col("pt") < col("en"))
    assert(!planOf(got).contains("_graft_bin"))
  }

  test("inverted intervals drop out instead of exploding descending bins") {
    // en << st: a naive sequence(bin(st), bin(en-1)) would default to
    // step -1 and enumerate every bin in between
    val i = Seq((900L, 4000L, 0L)).toDF("iid", "s_sec", "e_sec")
      .withColumn("st", expr("timestamp_seconds(s_sec)"))
      .withColumn("en", expr("timestamp_seconds(e_sec)"))
      .select("iid", "st", "en")
    withRule(on = true) {
      val got = points.join(i,
        col("pt") >= col("st") && col("pt") < col("en"))
      assert(planOf(got).contains("_graft_bin"))
      assert(got.count() === 0)
    }
  }

  test("oversized spans fail fast with an actionable error") {
    val i = Seq((900L, 0L, 100000000L)).toDF("iid", "s_sec", "e_sec")
      .withColumn("st", expr("timestamp_seconds(s_sec)"))
      .withColumn("en", expr("timestamp_seconds(e_sec)"))
      .select("iid", "st", "en")
    spark.conf.set("spark.graft.rangeJoin.maxBins", "10")
    try withRule(on = true, binMicros = 1000000L) {
      val ex = intercept[Exception] {
        points.join(i,
          col("pt") >= col("st") && col("pt") < col("en")).count()
      }
      assert(ex.getMessage.contains("graft range-join rewrite") ||
        Option(ex.getCause).exists(
          _.getMessage.contains("graft range-join rewrite")),
        s"unexpected error: $ex")
    } finally spark.conf.unset("spark.graft.rangeJoin.maxBins")
  }

  test("invalid binMicros disables the rewrite instead of corrupting results") {
    spark.conf.set("spark.graft.rangeJoin.binMicros", "0")
    spark.conf.set("spark.graft.rangeJoin.enabled", "true")
    try {
      val got = points.join(intervals,
        col("pt") >= col("st") && col("pt") < col("en"))
        .select("pid", "iid")
      assert(!planOf(got).contains("_graft_bin"))
      assert(got.count() === 4)
    } finally {
      spark.conf.set("spark.graft.rangeJoin.enabled", "false")
      spark.conf.unset("spark.graft.rangeJoin.binMicros")
    }
  }

  test("bounds from both sides: not a range join, untouched") {
    val p = Seq((1L, 10L, 20L)).toDF("pid", "x", "ub")
    val i = Seq((100L, 5L)).toDF("iid", "lo")
    withRule(on = true) {
      // upper bound references the POINT side — unsupported shape
      val got = p.join(i, col("x") >= col("lo") && col("x") < col("ub"))
      assert(!planOf(got).contains("_graft_bin"))
      assert(got.count() === 1)
    }
  }

  test("TIMESTAMP_NTZ point/bounds rewrite too (same conversion as " +
    "the operator: cast through the UTC session zone)") {
    val pN = points.withColumn("pt", col("pt").cast("timestamp_ntz"))
    val iN = intervals
      .withColumn("st", col("st").cast("timestamp_ntz"))
      .withColumn("en", col("en").cast("timestamp_ntz"))
    val q = () => pN.join(iN,
      col("pt") >= col("st") && col("pt") < col("en"))
      .select("pid", "iid")
    val expected = withRule(on = false)(q().collect().toSet)
    withRule(on = true) {
      val got = q()
      val plan = planOf(got)
      assert(plan.contains("_graft_bin"),
        s"rule did not fire for NTZ:\n$plan")
      assert(got.collect().toSet === expected)
    }
  }
}
