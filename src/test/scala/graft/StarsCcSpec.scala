package graft

import graft.llm.Dedup

/** Large-star/small-star connected components must agree with the
  * label-propagation implementation (the executable spec). */
class StarsCcSpec extends SparkSuite {
  import spark.implicits._

  /** (label propagation, driver union-find, distributed stars) —
    * the three implementations of the same contract. driverMaxEdges
    * = -1 forces the alternating-stars loop; the default routes
    * small edge sets to the union-find. */
  private def all3(pairs: Seq[(Long, Long)])
  : (Seq[(Long, Long)], Seq[(Long, Long)], Seq[(Long, Long)]) = {
    val df = pairs.toDF("id_a", "id_b")
    val lp = Dedup.connectedComponents(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val uf = Dedup.connectedComponentsStars(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val st = Dedup.connectedComponentsStars(df, driverMaxEdges = -1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    (lp, uf, st)
  }

  test("chain + separate pair: all three implementations agree") {
    val (lp, uf, st) = all3(Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)))
    assert(st == lp && uf == lp)
    assert(st.filter(_._2 == 1L).map(_._1) == Seq(1L, 2L, 3L, 4L))
  }

  test("random graph: all three implementations agree") {
    val rnd = new scala.util.Random(3)
    val pairs = Seq.fill(150)(
      (rnd.nextInt(100).toLong, rnd.nextInt(100).toLong))
      .filter { case (a, b) => a != b }
    val (lp, uf, st) = all3(pairs)
    assert(st == lp && uf == lp)
  }

  test("high-diameter path graph converges within the iteration cap") {
    // a 64-node path needs ~diameter rounds of label propagation but
    // only O(log n) star rounds — compare against the known answer
    // (label propagation's default cap can't converge this graph).
    // driverMaxEdges = -1: the point is the DISTRIBUTED loop's round
    // complexity, so the union-find shortcut must not kick in.
    val pairs = (0L until 63L).map(i => (i, i + 1))
    val df = pairs.toDF("id_a", "id_b")
    val st = Dedup.connectedComponentsStars(df, driverMaxEdges = -1L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(st.map(_._1) == (0L to 63L))
    assert(st.forall(_._2 == 0L))
    // and the union-find shortcut gives the same labeling
    val uf = Dedup.connectedComponentsStars(df).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(uf == st)
  }
}
