package graft

import graft.graph.Triangles

/** Degree-oriented triangle counting ([[graft.graph.Triangles]]). */
class TrianglesSpec extends SparkSuite {
  import spark.implicits._

  private def countOf(edges: Seq[(Long, Long)]): Long =
    Triangles.count(edges.toDF("src", "dst")).collect().head.getLong(0)

  test("a single triangle counts once") {
    assert(countOf(Seq((1L, 2L), (2L, 3L), (3L, 1L))) == 1L)
  }

  test("duplicate, reversed, and self-loop edges do not inflate") {
    assert(countOf(Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L),
      (1L, 3L), (1L, 1L), (2L, 2L))) == 1L)
  }

  test("K4 has four triangles") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    assert(countOf(k4) == 4L)
  }

  test("a star graph has none (the skew case orientation defuses)") {
    val star = (2L to 40L).map(i => (1L, i))
    assert(countOf(star) == 0L)
  }

  test("star plus one rim edge has exactly one") {
    val star = (2L to 40L).map(i => (1L, i))
    assert(countOf(star :+ ((5L, 6L))) == 1L)
  }

  test("path graphs have none") {
    val path = (1L to 20L).sliding(2).map(s => (s.head, s.last)).toSeq
    assert(countOf(path) == 0L)
  }

  test("circulant graph (+1, +2 neighbors) has exactly n triangles") {
    val n = 30L
    val edges = (0L until n).flatMap(i =>
      Seq((i, (i + 1) % n), (i, (i + 2) % n)))
    assert(countOf(edges) == n)
  }
}
