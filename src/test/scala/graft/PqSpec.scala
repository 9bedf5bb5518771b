package graft

import graft.llm.{Pq, Similarity}
import org.apache.spark.sql.functions._

class PqSpec extends SparkSuite {
  import spark.implicits._

  // 40 unit vectors in R^8, four tight direction families
  private def mk(base: Seq[Double], i: Int): Seq[Double] = {
    val v = base.zipWithIndex.map { case (x, d) =>
      x + 0.01 * ((i + d) % 3)
    }
    val n = math.sqrt(v.map(a => a * a).sum)
    v.map(_ / n)
  }
  private val bases = Seq(
    Seq(1.0, 0, 0, 0, 0, 0, 0, 0), Seq(0.0, 1, 0, 0, 0, 0, 0, 0),
    Seq(0.0, 0, 1, 0, 0, 0, 0, 0), Seq(0.0, 0, 0, 1, 0, 0, 0, 0))
  private val corpus = (0 until 40)
    .map(i => (i.toLong, mk(bases(i % 4), i / 4).map(_.toFloat)))
    .toDF("vec_id", "embedding")

  test("codes compress and search recovers the exact top-1") {
    val cb = Pq.train(corpus, dim = 8, m = 4, k = 8, iters = 5)
    assert(cb.length == 4 && cb.head.length == 8 && cb.head.head.length == 2)
    val codes = Pq.encode(corpus, cb)
    assert(codes.count() == 40)
    assert(codes.select(size(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    val queries = corpus.filter(col("vec_id") < 8)
    val got = Pq.searchTopK(codes, corpus, queries, cb, kTop = 1,
      shortlist = 16)
      .select("query_id", "nn_id").orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 1)
      .select("query_id", "nn_id").orderBy("query_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == exact.toSeq)
  }

  test("training and encoding are deterministic under repartitioning") {
    val cb1 = Pq.train(corpus, dim = 8, m = 4, k = 8, iters = 3)
    val cb2 = Pq.train(corpus.repartition(7), dim = 8, m = 4, k = 8,
      iters = 3)
    // driver-side Lloyd's over the md5-ordered sample: codebooks are
    // BIT-identical under repartitioning, not merely code-identical
    assert(cb1 == cb2)
    val c1 = Pq.encode(corpus, cb1).orderBy("vec_id").collect()
      .map(r => r.getSeq[Int](1)).toSeq
    val c2 = Pq.encode(corpus.repartition(5), cb2).orderBy("vec_id")
      .collect().map(r => r.getSeq[Int](1)).toSeq
    assert(c1 == c2)
  }

  test("rerank returns exact cosine similarities") {
    val cb = Pq.train(corpus, dim = 8, m = 4, k = 8, iters = 5)
    val codes = Pq.encode(corpus, cb)
    val q = corpus.filter(col("vec_id") === 0)
    val row = Pq.searchTopK(codes, corpus, q, cb, kTop = 1,
      shortlist = 16).collect().head
    val nn = row.getLong(1)
    val exactSim = corpus.filter(col("vec_id").isin(0L, nn))
      .collect().map(_.getSeq[Float](1)).toSeq match {
        case Seq(a, b) =>
          val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
          val na = math.sqrt(a.map(x => x.toDouble * x).sum)
          val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
          dot / (na * nb)
      }
    assert(math.abs(row.getDouble(2) - exactSim) < 1e-9)
  }
}
