package graft

import graft.llm.LineDedup

/** Line-level cross-document dedup ([[graft.llm.LineDedup]]). */
class LineDedupSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "unique alpha sentence. all rights reserved. more alpha text"),
    (2L, "unique beta sentence. all rights reserved. other beta text"),
    (3L, "totally original content here"),
    (4L, "  ALL   RIGHTS   reserved  ") // normalizes to the shared line
  ).toDF("doc_id", "text")

  private lazy val out =
    LineDedup.dropSharedLines(docs, "doc_id", "text")
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("shared boilerplate lines are removed from every document") {
    assert(out(1L)._1 == "unique alpha sentence. more alpha text")
    assert(out(2L)._1 == "unique beta sentence. other beta text")
  }

  test("line identity normalizes case and whitespace") {
    // doc 4 IS entirely the shared line (case/spacing variant)
    assert(out(4L) == (("", 1L, 1L)))
  }

  test("unshared documents pass through intact") {
    assert(out(3L) == (("totally original content here", 1L, 0L)))
  }

  test("counts report lines seen and dropped") {
    assert(out(1L)._2 == 3L && out(1L)._3 == 1L)
  }

  test("order of surviving lines is preserved") {
    val d = Seq(
      (1L, "z last. shared bit. a first"),
      (2L, "shared bit. whatever else")
    ).toDF("doc_id", "text")
    val r = LineDedup.dropSharedLines(d, "doc_id", "text")
      .filter($"doc_id" === 1L).collect().head.getString(1)
    assert(r == "z last. a first")
  }

  test("empty and whitespace-only docs survive with empty text") {
    val d = Seq((1L, ""), (2L, "   "), (3L, "real content"),
      (4L, "real content")).toDF("doc_id", "text")
    val r = LineDedup.dropSharedLines(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "" && r(2L) == "")
    assert(r(3L) == "" && r(4L) == "") // exact dups cross-dedup away
    assert(r.size == 4)
  }
}
