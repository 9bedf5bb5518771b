package graft

import graft.llm.Sampling
import org.apache.spark.sql.functions._

class WeightedSampleSpec extends SparkSuite {
  import spark.implicits._

  test("matches the hand-computed A-Res ranking") {
    val rows = Seq((1L, 10.0), (2L, 1.0), (3L, 100.0), (4L, 5.0),
      (5L, 0.0), (6L, -2.0))
    val df = rows.toDF("id", "w")
    def u(id: Long): Double = {
      val h = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(id.toString).substring(0, 8)
      (java.lang.Long.parseLong(h, 16).toDouble + 0.5) / 4294967296.0
    }
    val expect = rows.filter(_._2 > 0)
      .map { case (id, w) => (id, math.log(u(id)) / w) }
      .sortBy { case (id, k) => (-k, id.toString) }
      .take(3).map(_._1).toSet
    val got = Sampling.weightedSample(df, col("id"), col("w"), 3)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // non-positive weights can never appear
    assert(!got.contains(5L) && !got.contains(6L))
  }

  test("heavier rows win far more often across many keys") {
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) 100.0 else 1.0))
      .toDF("id", "w")
    val picked = Sampling.weightedSample(df, col("id"), col("w"), 200)
      .collect().map(_.getLong(0))
    val heavy = picked.count(_ % 2 == 0)
    // with 100:1 weights the heavy class should dominate utterly
    assert(heavy > 180, s"heavy=$heavy of 200")
  }

  test("log-domain (Gumbel-top-k): hand-computed ranking, stable at " +
    "magnitudes where exp overflows") {
    // scores far past |709| would make exp(s) overflow/underflow —
    // the log-domain key must still rank them exactly
    val rows = Seq((1L, 5000.0), (2L, -5000.0), (3L, 5001.0),
      (4L, 0.0), (5L, 4999.5))
    val df = rows.toDF("id", "s")
    def u(id: Long): Double = {
      val h = org.apache.commons.codec.digest.DigestUtils
        .md5Hex(id.toString).substring(0, 8)
      (java.lang.Long.parseLong(h, 16).toDouble + 0.5) / 4294967296.0
    }
    val expect = rows
      .map { case (id, s) => (id, s - math.log(-math.log(u(id)))) }
      .sortBy { case (id, k) => (-k, id.toString) }
      .take(3).map(_._1).toSet
    val got = Sampling.logWeightedSample(df, col("id"), col("s"), 3)
      .collect().map(_.getLong(0)).toSet
    assert(got == expect)
    // higher log-weight dominates across many keys: s=ln(100) vs
    // s=ln(1) replays weightedSample's 100:1 heavy-class test
    val big = (1L to 2000L)
      .map(i => (i, if (i % 2 == 0) math.log(100.0) else 0.0))
      .toDF("id", "s")
    val picked = Sampling
      .logWeightedSample(big, col("id"), col("s"), 200)
      .collect().map(_.getLong(0))
    assert(picked.count(_ % 2 == 0) > 180)
  }

  test("deterministic under repartitioning") {
    val df = (1L to 500L).map(i => (i, (i % 7 + 1).toDouble))
      .toDF("id", "w")
    val a = Sampling.weightedSample(df, col("id"), col("w"), 50)
      .orderBy("id").collect().toSeq
    val b = Sampling.weightedSample(df.repartition(9), col("id"),
      col("w"), 50).orderBy("id").collect().toSeq
    assert(a == b)
  }
}
