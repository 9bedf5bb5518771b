package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation equals the direct aggregation. */
class SkewSpec extends SparkSuite {
  import spark.implicits._

  private lazy val skewed = {
    // one hot key (90%), many cold keys
    val rows = (1 to 2000).map(i =>
      (if (i % 10 != 0) "hot" else s"cold${i % 7}", i.toLong))
    rows.toDF("k", "v")
  }

  test("saltedCount == groupBy().count()") {
    val direct = skewed.groupBy("k").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedCount(skewed, col("k"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("saltedSum == groupBy().sum()") {
    val direct = skewed.groupBy("k").agg(sum("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSum(skewed, col("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
  }

  test("saltedCollectSet == sorted distinct values per key") {
    val direct = skewed.groupBy("k")
      .agg(sort_array(collect_set(col("v") % 5)).as("values"))
      .collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Long]](1).toSeq)
      .toMap
    val salted = Skew.saltedCollectSet(skewed, col("k"), col("v") % 5)
      .collect()
      .map(r => r.getString(0) -> r.getAs[scala.collection.Seq[Long]](1).toSeq)
      .toMap
    assert(salted == direct)
  }

  test("saltedJoin == plain inner join, duplicates included") {
    val build = Seq(("hot", "H"), ("cold1", "C1"), ("cold3", "C3"),
      ("absent", "X")).toDF("k", "name")
    val direct = skewed.join(build, Seq("k"))
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val salted = Skew.saltedJoin(skewed, build, Seq("k"), salts = 8)
      .groupBy("name").agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(salted == direct && direct.nonEmpty)
  }

  test("saltedJoin spreads a hot key over multiple salt values") {
    val probe = skewed.filter(col("k") === "hot")
    val salts = probe
      .withColumn("__salt",
        pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts > 4, s"expected the hot key's rows on >4 of 8 salts, got $salts")
  }
}
