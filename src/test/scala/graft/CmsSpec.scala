package graft

import graft.expr.Cms
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.functions._

/** Count-min sketch aggregate: exactness on small key sets, the
  * never-undercount guarantee, mergeability, determinism. */
class CmsSpec extends SparkSuite {
  import spark.implicits._

  test("point estimates are exact for few keys in a wide sketch") {
    val df = spark.range(10000)
      .select((col("id") % 7).cast("string").as("k"))
    val got = df.agg(expr("cms_sketch(k)").as("sk"))
      .crossJoin(df.groupBy("k").agg(count(lit(1)).as("n")))
      .select(col("k"), col("n"), expr("cms_estimate(sk, k)").as("est"))
      .collect()
    assert(got.length == 7)
    got.foreach(r => assert(r.getLong(2) == r.getLong(1),
      s"k=${r.getString(0)}: est=${r.getLong(2)} exact=${r.getLong(1)}"))
  }

  test("never undercounts, overcount bounded even when width << keys") {
    // 5000 distinct keys into width 64 → heavy collisions
    val df = spark.range(20000).select((col("id") % 5000).as("k"))
    val n = 20000.0
    val bound = math.ceil(math.E / 64 * n).toLong // (e/w)·N
    val bad = df.agg(expr("cms_sketch(k, 5, 64)").as("sk"))
      .crossJoin(df.groupBy("k").agg(count(lit(1)).as("n")))
      .select(col("n"), expr("cms_estimate(sk, k)").as("est"))
      .filter(col("est") < col("n") || col("est") > col("n") + bound)
      .count()
    assert(bad == 0, s"$bad keys outside the CMS bound")
  }

  test("sketch bytes are independent of partitioning and row order") {
    val a = spark.range(10000).repartition(1)
      .agg(expr("cms_sketch(id)")).head().getAs[Array[Byte]](0)
    val b = spark.range(10000).repartition(16, col("id"))
      .agg(expr("cms_sketch(id)")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("merge of slice sketches == sketch of the whole (bit-exact)") {
    val df = spark.range(50000)
      .select((col("id") % 997).as("k"), (col("id") % 8).as("slice"))
    val merged = df.groupBy("slice").agg(expr("cms_sketch(k)").as("sk"))
      .agg(expr("cms_merge(sk)")).head().getAs[Array[Byte]](0)
    val direct = df.agg(expr("cms_sketch(k)")).head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, direct))
  }

  test("cms_merge adopts input shape; all-null group → null; mixed shapes fail") {
    val est = spark.range(1000).select((col("id") % 3).as("k"), lit(0).as("g"))
      .groupBy("g").agg(expr("cms_sketch(k, 3, 128)").as("sk"))
      .agg(expr("cms_estimate(cms_merge(sk), 0)")).head().getLong(0)
    assert(est == 334L) // k=0 occurs for id=0,3,...,999 → 334 times
    val n = Seq((1, None: Option[Array[Byte]])).toDF("g", "sk")
      .groupBy("g").agg(expr("cms_merge(sk)").as("u")).head()
    assert(n.isNullAt(1))
    intercept[Exception] {
      Cms.merge(Cms.empty(5, 64), Cms.empty(5, 128))
    }
  }

  test("kernel: serialize round-trip, corrupt bytes rejected, nulls skipped") {
    val buf = Cms.empty(4, 32)
    Seq[Any](1L, 1L, "x", 2L).foreach(Cms.add(buf, _))
    val rt = Cms.deserialize(Cms.serialize(buf))
    assert(rt.sameElements(buf))
    assert(Cms.estimate(rt, 1L) >= 2)
    // the zero-copy byte-path estimator agrees with the array path
    Seq[Any](1L, 2L, "x", "absent").foreach { v =>
      assert(Cms.estimateBytes(Cms.serialize(buf), v) == Cms.estimate(buf, v))
    }
    intercept[IllegalArgumentException] {
      Cms.estimateBytes(new Array[Byte](24), 1L)
    }
    intercept[IllegalArgumentException] { Cms.empty(16, 1 << 24) } // > 2 GiB
    intercept[IllegalArgumentException] { Cms.deserialize(Array[Byte](1, 2, 3)) }
    intercept[IllegalArgumentException] {
      Cms.deserialize(new Array[Byte](24)) // header says 0x0 — corrupt
    }
    val viaSql = Seq(Some(7L), None, Some(7L)).toDF("v")
      .agg(expr("cms_estimate(cms_sketch(v), 7)")).head().getLong(0)
    assert(viaSql == 2L)
  }

  test("join-size inner product: one-sided, exact on collision-free keys") {
    // A = {a:2, b:1}, B = {a:3, c:5} → true join size 2*3 = 6
    val a = Cms.empty(Cms.DefaultDepth, Cms.DefaultWidth)
    Seq("a", "a", "b").foreach(v => Cms.add(a, UTF8String.fromString(v)))
    val b = Cms.empty(Cms.DefaultDepth, Cms.DefaultWidth)
    (Seq.fill(3)("a") ++ Seq.fill(5)("c"))
      .foreach(v => Cms.add(b, UTF8String.fromString(v)))
    val est = Cms.joinSizeBytes(Cms.serialize(a), Cms.serialize(b))
    assert(est >= 6L && est <= 6L + 3L, s"est $est") // 3 keys, width 2048
    // disjoint key sets estimate ~0
    val d = Cms.empty(Cms.DefaultDepth, Cms.DefaultWidth)
    Cms.add(d, UTF8String.fromString("zzz"))
    assert(Cms.joinSizeBytes(Cms.serialize(a), Cms.serialize(d)) <= 1L)
  }

  test("join-size rejects shape mismatch; SQL surface works end to end") {
    val a = Cms.empty(5, 2048); val b = Cms.empty(5, 1024)
    intercept[IllegalArgumentException] {
      Cms.joinSizeBytes(Cms.serialize(a), Cms.serialize(b))
    }
    val est = Seq((1L, 0), (1L, 1), (1L, 1), (2L, 0)).toDF("k", "side")
      .agg(expr(
        "cms_join_size(cms_sketch(CASE WHEN side = 0 THEN k END)," +
          " cms_sketch(CASE WHEN side = 1 THEN k END))"))
      .head().getLong(0)
    // side0 = {1,2}, side1 = {1,1} → true 1*2 = 2
    assert(est >= 2L && est <= 3L, s"est $est")
  }

  test("integral widths hash consistently; join-size saturates " +
    "instead of wrapping on hot-key overflow") {
    // a SMALLINT-built sketch must answer an INT/BIGINT probe
    assert(Cms.hash(5.toShort, 3) === Cms.hash(5, 3))
    assert(Cms.hash(5.toByte, 3) === Cms.hash(5L, 3))
    // one hot key ~3e9 on both sides: the cell product overflows a
    // Long; the dot must saturate positive, never wrap negative
    val a = Cms.empty(2, 16); val b = Cms.empty(2, 16)
    for (buf <- Seq(a, b); r <- 0 until 2)
      buf(2 + r * 16 + 3) = 3000000000L
    val est = Cms.joinSizeBytes(Cms.serialize(a), Cms.serialize(b))
    assert(est > 0L, s"wrapped estimate $est")
    assert(est >= 3000000000L * 2L) // >= true product band, one-sided
  }
}
