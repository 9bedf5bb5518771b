package graft

import graft.expr.Kll
import org.apache.spark.sql.functions._

/** KLL/MRL quantile sketch: rank accuracy, mergeability, determinism. */
class KllSpec extends SparkSuite {
  import spark.implicits._

  test("quantiles within 2% rank error at 100k uniform values") {
    val sk = spark.range(100000)
      .select((col("id") * 7919 % 100000).cast("double").as("v"))
      .agg(expr("kll_sketch(v)").as("sk"))
    val row = sk.select(
      expr("kll_quantile(sk, 0.5d)"), expr("kll_quantile(sk, 0.9d)"),
      expr("kll_quantile(sk, 0.01d)"), expr("kll_quantile(sk, 0.99d)"))
      .head()
    for ((q, i) <- Seq(0.5, 0.9, 0.01, 0.99).zipWithIndex) {
      val est = row.getDouble(i)
      val err = math.abs(est / 100000.0 - q)
      assert(err < 0.02, s"q=$q est=$est rank-err=$err")
    }
  }

  test("merge of per-group sketches matches a global sketch's accuracy") {
    val df = spark.range(80000).select(
      (col("id") % 8).as("g"),
      (col("id") * 104729 % 80000).cast("double").as("v"))
    val merged = df.groupBy("g").agg(expr("kll_sketch(v)").as("sk"))
      .agg(expr("kll_quantile(kll_merge(sk), 0.5d)")).head().getDouble(0)
    assert(math.abs(merged / 80000.0 - 0.5) < 0.02, s"median=$merged")
  }

  test("skewed distribution: tail quantile lands in the tail") {
    // 99% of mass at 0..99, 1% at 10000..10099
    val df = spark.range(100000).select(
      when(col("id") % 100 === 0, (col("id") % 100 + 10000))
        .otherwise(col("id") % 100).cast("double").as("v"))
    val q999 = df.agg(expr("kll_quantile(kll_sketch(v), 0.999d)"))
      .head().getDouble(0)
    assert(q999 >= 10000.0, s"q999=$q999 missed the tail")
    val q50 = df.agg(expr("kll_quantile(kll_sketch(v), 0.5d)"))
      .head().getDouble(0)
    assert(q50 < 100.0, s"q50=$q50 polluted by the tail")
  }

  test("kernel: exact below k, weights preserved through compaction") {
    val s = new Kll.Sketch(200)
    (1 to 100).foreach(i => s.add(i.toDouble))
    assert(s.quantile(0.0) == 1.0 && s.quantile(1.0) == 100.0)
    assert(s.quantile(0.5) == 50.0 || s.quantile(0.5) == 51.0)
    // push past several compactions; total weight stays exact
    (101 to 5000).foreach(i => s.add(i.toDouble))
    val totalWeight = s.levels.indices.map(i => s.sizes(i).toLong << i).sum
    assert(totalWeight == 5000L, s"weight drift: $totalWeight")
    assert(s.count == 5000L)
  }

  test("kernel: merge preserves weight and k mismatch fails fast") {
    val a = new Kll.Sketch(64); val b = new Kll.Sketch(64)
    (1 to 1000).foreach(i => a.add(i.toDouble))
    (1001 to 3000).foreach(i => b.add(i.toDouble))
    a.merge(b)
    val w = a.levels.indices.map(i => a.sizes(i).toLong << i).sum
    assert(w == 3000L && a.count == 3000L)
    val med = a.quantile(0.5)
    assert(math.abs(med - 1500.0) < 3000 * 0.03, s"median after merge: $med")
    val c = new Kll.Sketch(32); c.add(1.0)
    intercept[IllegalArgumentException] { a.merge(c) }
  }

  test("kll_quantile accepts a plain SQL decimal literal rank") {
    val med = spark.range(1000).select(col("id").cast("double").as("v"))
      .agg(expr("kll_quantile(kll_sketch(v), 0.5)")).head().getDouble(0)
    assert(math.abs(med - 500.0) < 30.0, s"median=$med")
  }

  test("batched quantiles() agrees with one-at-a-time quantile()") {
    val s = new Kll.Sketch(64)
    (1 to 10000).foreach(i => s.add((i * 37 % 5000).toDouble))
    val batch = s.quantiles(Seq(0.1, 0.5, 0.9))
    assert(batch == Seq(0.1, 0.5, 0.9).map(s.quantile))
  }

  test("kll_sketch rejects non-numeric columns at analysis time") {
    intercept[org.apache.spark.sql.AnalysisException] {
      Seq("a", "b").toDF("v").agg(expr("kll_sketch(v)")).head()
    }
  }

  test("adversarial orders: sorted, reversed, constant inputs stay in bounds") {
    // deterministic compaction must not bias on monotone streams (the
    // alternating offset exists exactly for this)
    def medianErr(vals: Iterator[Double]): Double = {
      val s = new Kll.Sketch(200)
      vals.foreach(s.add)
      math.abs(s.quantile(0.5) / 100000.0 - 0.5)
    }
    val asc = medianErr((0 until 100000).iterator.map(_.toDouble))
    val desc = medianErr((0 until 100000).reverseIterator.map(_.toDouble))
    assert(asc < 0.02, s"ascending-order median rank error $asc")
    assert(desc < 0.02, s"descending-order median rank error $desc")
    val const = new Kll.Sketch(200)
    (0 until 50000).foreach(_ => const.add(7.0))
    assert(const.quantile(0.01) == 7.0 && const.quantile(0.99) == 7.0)
  }

  test("serialization round-trip is lossless") {
    val s = new Kll.Sketch(100)
    (1 to 12345).foreach(i => s.add((i * 31 % 1000).toDouble))
    val back = Kll.deserialize(s.serialize)
    assert(back.count == s.count && back.k == s.k)
    assert((0 to 100).forall(p =>
      back.quantile(p / 100.0) == s.quantile(p / 100.0)))
  }

  test("non-default k unions via kll_merge; null groups yield null") {
    val df = spark.range(20000).select((col("id") % 4).as("g"),
      col("id").cast("double").as("v"))
    val med = df.groupBy("g").agg(expr("kll_sketch(v, 64)").as("sk"))
      .agg(expr("kll_quantile(kll_merge(sk), 0.5d)")).head().getDouble(0)
    assert(math.abs(med / 20000.0 - 0.5) < 0.05, s"median=$med")
    val n = Seq((1, None: Option[Array[Byte]])).toDF("g", "sk")
      .groupBy("g").agg(expr("kll_merge(sk)").as("u")).head()
    assert(n.isNullAt(1))
  }

  test("deserialize fails fast on bytes that are not a KLL sketch") {
    import graft.expr.Kll
    // truncated, garbage header, lying level length: all raise
    // instead of allocating gigabytes or parsing junk quantiles
    intercept[IllegalArgumentException](Kll.deserialize(Array[Byte](1, 2)))
    val garbage = Array.fill[Byte](64)(0x5A)
    intercept[IllegalArgumentException](Kll.deserialize(garbage))
    val s = new Kll.Sketch(200)
    (1 to 500).foreach(i => s.add(i.toDouble))
    val ok = s.serialize
    assert(Kll.deserialize(ok).quantile(0.5) === s.quantile(0.5))
    val lying = ok.clone()
    // nLevels field at offset 12 -> 2^30
    lying(12) = 0x40.toByte
    intercept[IllegalArgumentException](Kll.deserialize(lying))
  }
}
