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

  test("string ids where UTF-8 and UTF-16 orders disagree: paths agree") {
    // U+E000 (UTF-16 unit 0xE000; UTF-8 EE 80 80) vs U+10000 (UTF-16
    // surrogate 0xD800...; UTF-8 F0 90 80 80): Java's Comparable puts
    // the supplementary char FIRST, Spark's binary UTF8String puts
    // U+E000 first. The component label must not depend on which side
    // of driverMaxEdges the input lands on — both paths must emit
    // Spark's (UTF-8 byte) minimum.
    val bmp = "doc-"
    val supp = "doc-𐀀"
    assert(bmp.compareTo(supp) > 0) // Java order: supp < bmp
    val df = Seq((bmp, supp), (supp, "zz-tail")).toDF("id_a", "id_b")
    def labels(driverMax: Long): Map[String, String] =
      Dedup.connectedComponentsStars(df, driverMaxEdges = driverMax)
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val driver = labels(1000L)
    val stars = labels(-1L)
    assert(driver == stars, s"driver=$driver stars=$stars")
    assert(driver.values.toSet == Set(bmp)) // UTF-8 byte minimum
  }
}
