package graft

import org.apache.spark.sql.functions._

/** `vec_sum_micros` aggregate ([[graft.expr.VecSumAgg]]). */
class VecSumSpec extends SparkSuite {
  import spark.implicits._

  private lazy val vecs = Seq(
    ("a", Seq(1.0f, 2.0f, -3.5f)),
    ("a", Seq(0.5f, -2.0f, 1.0f)),
    ("b", Seq(10.0f, 0.000001f, 0.0f))
  ).toDF("g", "v")

  private def sums(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Long]] =
    df.groupBy("g").agg(expr("vec_sum_micros(v)").as("s"))
      .collect()
      .map(r => r.getString(0) ->
        r.getAs[scala.collection.Seq[Long]](1).toSeq)
      .toMap

  test("sums match hand-computed integer micro-units") {
    val m = sums(vecs)
    assert(m("a") == Seq(1500000L, 0L, -2500000L))
    assert(m("b") == Seq(10000000L, 1L, 0L))
  }

  test("bit-exact under any partitioning (order-free long sums)") {
    val big = spark.range(2000).select(
      (col("id") % 7).cast("string").as("g"),
      array((col("id") % 13).cast("float") * 0.1f,
        (col("id") % 17).cast("float") * -0.01f).as("v"))
    assert(sums(big) == sums(big.repartition(13)))
  }

  test("merged group sums equal the whole-frame sum") {
    val whole = sums(vecs.withColumn("g", lit("all")))("all")
    val parts = sums(vecs).values
    val merged = parts.reduce((x, y) => x.zip(y).map { case (a, b) => a + b })
    assert(merged == whole)
  }

  test("null vectors are skipped; all-null group yields null") {
    val withNull = vecs.unionByName(
      Seq(("a", null.asInstanceOf[Seq[Float]])).toDF("g", "v"))
    assert(sums(withNull)("a") == Seq(1500000L, 0L, -2500000L))
    val out = Seq(("z", null.asInstanceOf[Seq[Float]])).toDF("g", "v")
      .groupBy("g").agg(expr("vec_sum_micros(v)").as("s")).collect().head
    assert(out.isNullAt(1))
  }

  test("dimension mismatch fails loudly") {
    val bad = Seq(("a", Seq(1.0f)), ("a", Seq(1.0f, 2.0f))).toDF("g", "v")
    val e = intercept[Exception](sums(bad))
    assert(e.getMessage != null)
  }

  test("works on array<double> too") {
    val d = Seq(("a", Seq(0.25, -0.25))).toDF("g", "v")
    assert(sums(d)("a") == Seq(250000L, -250000L))
  }

  test("empty vectors fail loudly (never alias the empty buffer)") {
    val d = Seq(("a", Seq.empty[Float]), ("a", Seq(1.0f))).toDF("g", "v")
    val e = intercept[Exception](sums(d))
    assert(e.getMessage != null)
  }

  test("wrong input type is rejected at analysis time") {
    val d = Seq(("a", Seq(1, 2))).toDF("g", "v") // array<int>
    intercept[org.apache.spark.sql.AnalysisException] {
      d.groupBy("g").agg(expr("vec_sum_micros(v)")).queryExecution.analyzed
    }
  }
}
