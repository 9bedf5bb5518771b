package graft

import graft.llm.Sampling
import org.apache.spark.sql.functions._

class CapPerGroupSpec extends SparkSuite {
  import spark.implicits._

  test("caps each group at n, keeps small groups whole") {
    val df = ((1L to 100L).map(i => ("big", i)) ++
      (200L to 204L).map(i => ("small", i))).toDF("g", "k")
    val out = Sampling.capPerGroup(df, "g", "k", n = 10)
      .groupBy("g").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("big" -> 10L, "small" -> 5L))
  }

  test("selection is by md5 rank — partitioning-independent") {
    val df = (1L to 500L).map(i => ("g", i)).toDF("g", "k")
    val wide = Sampling.capPerGroup(df.repartition(13), "g", "k", 25)
      .select("k").as[Long].collect().toSet
    val narrow = Sampling.capPerGroup(df.coalesce(1), "g", "k", 25)
      .select("k").as[Long].collect().toSet
    assert(wide == narrow && wide.size == 25)
    // and equals the straightforward global md5 ordering
    val expect = (1L to 500L)
      .sortBy(i => org.apache.commons.codec.digest.DigestUtils.md5Hex(
        i.toString))
      .take(25).toSet
    assert(wide == expect)
  }

  test("extra payload columns pass through untouched") {
    val df = (1L to 50L).map(i => ("g", i, s"payload$i")).toDF("g", "k", "p")
    val out = Sampling.capPerGroup(df, "g", "k", 5).collect()
    assert(out.length == 5)
    assert(out.forall(r => r.getString(2) == s"payload${r.getLong(1)}"))
    assert(out.map(_.schema.fieldNames.toSeq).head == Seq("g", "k", "p"))
  }
}
