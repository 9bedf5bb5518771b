package graft

import graft.llm.GroupSimilarity
import org.apache.spark.sql.functions._

class GroupSimilaritySpec extends SparkSuite {
  import spark.implicits._

  private def elems(pairs: (String, Long)*) =
    pairs.toDF("g", "e")

  test("identical sets estimate jaccard exactly 1.0") {
    val d = elems((0L until 200L).flatMap(i =>
      Seq("a" -> i, "b" -> i)): _*)
    val out = GroupSimilarity.setJaccard(d, "g", "e", numHashes = 64)
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("group_a") == "a")
    assert(r.getAs[Long]("n_a") == 200L && r.getAs[Long]("n_b") == 200L)
    // identical element sets → identical union sketches → every
    // position agrees, no sampling error involved
    assert(r.getAs[Double]("jaccard_est") == 1.0)
  }

  test("disjoint sets estimate near zero, partial overlap near truth") {
    val a = (0L until 1000L).map("a" -> _)
    val b = (500L until 1500L).map("b" -> _)   // J(a,b) = 500/1500
    val c = (5000L until 6000L).map("c" -> _)  // disjoint from both
    val out = GroupSimilarity.setJaccard(elems(a ++ b ++ c: _*), "g", "e",
      numHashes = 128)
      .collect().map(r => (r.getAs[String]("group_a"),
        r.getAs[String]("group_b")) -> r.getAs[Double]("jaccard_est")).toMap
    assert(math.abs(out(("a", "b")) - 1.0 / 3) <= 0.15,
      s"a-b est ${out(("a", "b"))}")
    assert(out(("a", "c")) <= 0.1 && out(("b", "c")) <= 0.1)
  }

  test("duplicate elements do not shift the sketch or the count") {
    val base = (0L until 300L).map("a" -> _) ++ (0L until 300L).map("b" -> _)
    val dups = (0L until 300L).map("a" -> _)  // a's elements repeated
    val one = GroupSimilarity.setJaccard(elems(base: _*), "g", "e", 64)
      .collect().head
    val two = GroupSimilarity.setJaccard(elems(base ++ dups: _*), "g", "e", 64)
      .collect().head
    assert(one.getAs[Double]("jaccard_est") ==
      two.getAs[Double]("jaccard_est"))
    assert(two.getAs[Long]("n_a") == 300L)
  }

  test("group sketches merge: min-fold of part sketches == whole sketch") {
    // the mergeability contract behind persisting per-slice sketches:
    // union signature over slices must equal the single-pass signature
    val whole = elems((0L until 400L).map("g" -> _): _*)
    val partA = elems((0L until 250L).map("p1" -> _): _*)
    val partB = elems((200L until 400L).map("p2" -> _): _*)
    val sigWhole = GroupSimilarity.groupSignatures(whole, "g", "e", 64)
      .select("sig").as[Seq[Long]].collect().head
    val parts = GroupSimilarity.groupSignatures(partA.unionByName(partB)
      .withColumn("g", lit("g")), "g", "e", 64)
      .select("sig").as[Seq[Long]].collect().head
    assert(sigWhole == parts)
  }
}
