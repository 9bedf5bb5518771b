package graft

import graft.graph.PageRank
import org.apache.spark.sql.functions._

/** PageRank power iteration: exact agreement with a local integer
  * reference model, partitioning-independence, dangling-node mass
  * leak, and parallel-edge weighting. */
class PageRankSpec extends SparkSuite {
  import spark.implicits._

  /** Local reference replaying the exact scaled-integer algebra. */
  private def ref(edges: Seq[(String, String)], iters: Int)
  : Map[String, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> PageRank.Scale / n).toMap
    val tele = 3L * PageRank.Scale / (20L * n)
    for (_ <- 1 to iters) {
      val inMass = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => r(s) / outdeg(s) }.sum
      }
      r = nodes.map(v => v -> (tele + 17L * inMass.getOrElse(v, 0L) / 20L))
        .toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int)
  : Map[String, Long] =
    PageRank.run(edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  private val diamond = Seq(
    "a" -> "b", "a" -> "c", "b" -> "d", "c" -> "d", "d" -> "a")

  test("matches the integer reference model exactly") {
    for (iters <- Seq(0, 1, 3, 5)) {
      assert(run(diamond, iters) === ref(diamond, iters),
        s"iters=$iters")
    }
  }

  test("dangling node: mass leaks, node still ranked via teleport") {
    // c has no out-edges; with no in-edges either, its rank is pure
    // teleport after one iteration.
    val g = Seq("a" -> "b", "b" -> "c")
    val got = run(g, 2)
    assert(got === ref(g, 2))
    assert(got("a") === 3L * PageRank.Scale / (20L * 3))
    // total mass strictly below Scale: c's rank leaked out
    assert(got.values.sum < PageRank.Scale)
  }

  test("parallel edges weight the contribution") {
    val single = run(Seq("a" -> "b", "a" -> "c"), 1)
    val double = run(Seq("a" -> "b", "a" -> "b", "a" -> "c"), 1)
    // with the duplicate, b receives 2 of a's 3 outdeg shares
    assert(double("b") > single("b"))
    assert(double === ref(Seq("a" -> "b", "a" -> "b", "a" -> "c"), 1))
  }

  test("partitioning-independent: repartitioned input, identical ranks") {
    val base = run(diamond, 5)
    val shuffled = PageRank.run(
      diamond.toDF("src", "dst").repartition(7, col("dst")), 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(shuffled === base)
  }

  test("empty edge table yields empty ranks") {
    val out = PageRank.run(Seq.empty[(String, String)].toDF("src", "dst"), 3)
    assert(out.count() === 0)
  }

  test("convergence early-exit: stops before the iteration cap once " +
    "the exact L1 delta is under tolerance, ranks match that step") {
    val df = diamond.toDF("src", "dst")
    // generous tolerance → the diamond converges within a few steps
    val tol = PageRank.Scale / 100 // 1% of total mass, in rank units
    val (out, used) = PageRank.runWithStats(df, iterations = 50, tol)
    assert(used < 50, s"never converged (ran all $used)")
    // the early-exited result IS the fixed-`used`-iteration result —
    // the stopping rule changes when to stop, never the algebra
    val exact = run(diamond, used)
    assert(out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      === exact)
    // and the step it stopped at really was the first under-tol step
    val prev = ref(diamond, used - 1)
    val delta = exact.map { case (k, v) => math.abs(v - prev(k)) }.sum
    assert(delta <= tol, s"stopped at delta $delta > tol $tol")
    val before = ref(diamond, used - 2)
    val deltaBefore =
      prev.map { case (k, v) => math.abs(v - before(k)) }.sum
    assert(deltaBefore > tol,
      s"should have stopped one step earlier ($deltaBefore <= $tol)")
  }

  test("tolL1 = 0 never schedules a delta check: fixed iterations run") {
    val (_, used) = PageRank.runWithStats(
      diamond.toDF("src", "dst"), iterations = 7, tolL1 = 0L)
    assert(used === 7)
  }
}
