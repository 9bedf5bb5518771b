package graft

import graft.expr.Hll
import org.apache.spark.sql.functions._

/** HLL sketch aggregate: accuracy, mergeability, determinism. */
class HllSpec extends SparkSuite {
  import spark.implicits._

  test("estimate within 3% at 100k distinct longs (p=12 → RSE 1.6%)") {
    val est = spark.range(100000)
      .agg(expr("hll_estimate(hll_sketch(id))").as("e"))
      .head().getLong(0)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.03, s"est=$est")
  }

  test("small cardinalities are near-exact (linear counting)") {
    for (n <- Seq(1, 10, 100)) {
      val est = spark.range(n)
        .agg(expr("hll_estimate(hll_sketch(id))")).head().getLong(0)
      assert(math.abs(est - n) <= math.max(1, n / 100), s"n=$n est=$est")
    }
  }

  test("sketch bytes are independent of partitioning and row order") {
    val a = spark.range(10000).repartition(1)
      .agg(expr("hll_sketch(id)")).head().getAs[Array[Byte]](0)
    val b = spark.range(10000).repartition(16, col("id"))
      .agg(expr("hll_sketch(id)")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("union of group sketches == sketch of the union (bit-exact)") {
    val df = spark.range(50000)
      .select(col("id"), (col("id") % 4).as("g"))
    val merged = df.groupBy("g").agg(expr("hll_sketch(id)").as("sk"))
      .agg(expr("graft_hll_union(sk)")).head().getAs[Array[Byte]](0)
    val direct = df.agg(expr("hll_sketch(id)")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, direct))
  }

  test("overlapping sets union correctly (distinct, not sum)") {
    // two groups covering overlapping ranges: 0..59999 and 40000..99999
    val df = spark.range(100000).select(col("id"),
      when(col("id") < 60000, 0).otherwise(1).as("g"))
      .unionByName(spark.range(40000, 70000)
        .select(col("id"), lit(1).as("g")))
    val est = df.groupBy("g").agg(expr("hll_sketch(id)").as("sk"))
      .agg(expr("hll_estimate(graft_hll_union(sk))")).head().getLong(0)
    assert(math.abs(est - 100000.0) / 100000.0 < 0.03, s"est=$est")
  }

  test("string and long inputs hash distinctly; nulls ignored") {
    val est = Seq(Some("a"), Some("b"), Some("a"), None)
      .toDF("v").agg(expr("hll_estimate(hll_sketch(v))")).head().getLong(0)
    assert(est == 2L)
  }

  test("precision argument: p=8 uses 256 registers and stays coarse-sane") {
    val r = spark.range(10000)
      .agg(expr("hll_sketch(id, 8)").as("sk"))
      .select(expr("hll_estimate(sk)"), length(col("sk"))).head()
    assert(r.getInt(1) == 256)
    assert(math.abs(r.getLong(0) - 10000.0) / 10000.0 < 0.25)
  }

  test("hll_union adopts the input precision (non-default p unions work)") {
    val df = spark.range(20000).select(col("id"), (col("id") % 4).as("g"))
    val est = df.groupBy("g").agg(expr("hll_sketch(id, 8)").as("sk"))
      .agg(expr("hll_estimate(graft_hll_union(sk))")).head().getLong(0)
    assert(math.abs(est - 20000.0) / 20000.0 < 0.25, s"est=$est")
    // all-null union group evaluates to null, not a crash
    val n = Seq((1, None: Option[Array[Byte]])).toDF("g", "sk")
      .groupBy("g").agg(expr("graft_hll_union(sk)").as("u")).head()
    assert(n.isNullAt(1))
  }

  test("Hll.add/merge kernel: rank math at register boundaries") {
    val regs = new Array[Byte](1 << 12)
    // hash with all-zero low bits → max rank for its register
    Hll.add(regs, java.lang.Long.parseUnsignedLong("F000000000000000", 16))
    val idx = (java.lang.Long.parseUnsignedLong("F000000000000000", 16) >>> 52).toInt
    assert((regs(idx) & 0xff) == 64 - 12 + 1)
    val other = new Array[Byte](1 << 12)
    Hll.merge(other, regs)
    assert(java.util.Arrays.equals(other, regs))
    intercept[IllegalArgumentException] {
      Hll.merge(new Array[Byte](256), regs)
    }
  }
}
