package graft

import graft.llm.{IvfPq, Similarity}
import org.apache.spark.sql.functions._

class IvfPqSpec extends SparkSuite {
  import spark.implicits._

  // 48 unit vectors in R^8: four direction families with small
  // per-vector perturbations (cells should align with families)
  private def mk(base: Seq[Double], i: Int): Seq[Float] = {
    val v = base.zipWithIndex.map { case (x, d) =>
      x + 0.02 * ((i * 7 + d) % 5)
    }
    val n = math.sqrt(v.map(a => a * a).sum)
    v.map(a => (a / n).toFloat)
  }
  private val bases = Seq(
    Seq(1.0, 0, 0, 0, 0, 0, 0, 0), Seq(0.0, 1, 0, 0, 0, 0, 0, 0),
    Seq(0.0, 0, 1, 0, 0, 0, 0, 0), Seq(0.0, 0, 0, 1, 0, 0, 0, 0))
  private val corpus = (0 until 48)
    .map(i => (i.toLong, mk(bases(i % 4), i / 4)))
    .toDF("vec_id", "embedding")

  test("probed search recovers the exact top-1") {
    val (coarse, rcb) = IvfPq.train(corpus, nCells = 4, m = 4, k = 8,
      iters = 5)
    val codes = IvfPq.encode(corpus, coarse, rcb)
    assert(codes.count() == 48)
    assert(codes.select("cell").distinct().count() <= 4)
    val queries = corpus.filter(col("vec_id") < 8)
    val got = IvfPq.searchTopK(codes, corpus, queries, coarse, rcb,
      kTop = 1, nProbe = 2, shortlist = 16)
      .select("query_id", "nn_id").orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 1)
      .select("query_id", "nn_id").orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == exact.toSeq)
  }

  test("probing touches only probed cells") {
    val (coarse, rcb) = IvfPq.train(corpus, nCells = 4, m = 4, k = 8,
      iters = 5)
    val codes = IvfPq.encode(corpus, coarse, rcb)
    val q1 = corpus.filter(col("vec_id") === 0)
    val scoredCells = IvfPq.searchTopK(codes, corpus, q1, coarse, rcb,
      kTop = 48, nProbe = 1, shortlist = 48)
    // with nProbe=1 only one cell's members can appear
    val cells = codes.select("vec_id", "cell")
    val touched = scoredCells.join(cells,
      scoredCells("nn_id") === cells("vec_id"))
      .select("cell").distinct().count()
    assert(touched == 1)
  }

  test("train/encode deterministic under repartitioning") {
    val (c1, r1) = IvfPq.train(corpus, nCells = 4, m = 4, k = 8,
      iters = 3)
    val (c2, r2) = IvfPq.train(corpus.repartition(7), nCells = 4,
      m = 4, k = 8, iters = 3)
    assert(c1 == c2 && r1 == r2)
    val e1 = IvfPq.encode(corpus, c1, r1).orderBy("vec_id").collect()
      .map(r => (r.getInt(1), r.getSeq[Int](2))).toSeq
    val e2 = IvfPq.encode(corpus.repartition(5), c2, r2)
      .orderBy("vec_id").collect()
      .map(r => (r.getInt(1), r.getSeq[Int](2))).toSeq
    assert(e1 == e2)
  }
}
