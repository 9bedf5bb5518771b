package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._

class SemDedupSpec extends SparkSuite {
  import spark.implicits._

  // three well-separated directions in R^4, unit-norm members
  private def v(x: Double*): Seq[Double] = {
    val n = math.sqrt(x.map(a => a * a).sum)
    x.map(_ / n)
  }
  private val corpus = Seq(
    (1L, v(1, 0, 0, 0.00)),
    (2L, v(1, 0, 0, 0.01)),  // ~1.0 cosine with 1
    (3L, v(1, 0, 0, 0.02)),  // chains to 2 (and 1) — one cluster {1,2,3}
    (10L, v(0, 1, 0, 0)),
    (11L, v(0, 1, 0, 0.01)), // cluster {10, 11}
    (20L, v(0, 0, 1, 0))     // singleton
  ).toDF("vec_id", "embedding")

  test("clusters resolve to min-id labels with keep on the minimum") {
    val out = Similarity.semanticDedup(corpus, threshold = 0.999,
      nCentroids = 3, assignTop = 1)
      .orderBy("vec_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false),
      (20L, 20L, true)))
  }

  test("multi-assignment changes candidates, not the verified answer") {
    val single = Similarity.semanticDedup(corpus, threshold = 0.999,
      nCentroids = 3, assignTop = 1).orderBy("vec_id").collect().toSeq
    val dual = Similarity.semanticDedup(corpus, threshold = 0.999,
      nCentroids = 3, assignTop = 2).orderBy("vec_id").collect().toSeq
    assert(single == dual)
  }

  test("result is partitioning-independent") {
    val a = Similarity.semanticDedup(corpus, threshold = 0.999,
      nCentroids = 3, assignTop = 2).orderBy("vec_id").collect().toSeq
    val b = Similarity.semanticDedup(corpus.repartition(5),
      threshold = 0.999, nCentroids = 3, assignTop = 2)
      .orderBy("vec_id").collect().toSeq
    assert(a == b)
  }

  test("a high threshold keeps everything") {
    val out = Similarity.semanticDedup(
      corpus.filter(col("vec_id").isin(1L, 10L, 20L)),
      threshold = 0.9999999, nCentroids = 2, assignTop = 1)
    assert(out.filter(col("keep")).count() == 3)
    assert(out.filter(col("cluster_id") =!= col("vec_id")).count() == 0)
  }
}
