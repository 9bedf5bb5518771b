package graft

import graft.llm.Dedup

class CrossDocSpansSpec extends SparkSuite {
  import spark.implicits._

  test("copied passage reports as one merged span in both docs") {
    // docs 1 and 2 share the 8-word run "p q r s t u v w" → grams at
    // starts 0..3 on both sides, merging into one span of 4 grams
    val docs = Seq(
      (1L, "p q r s t u v w xx yy zz aa bb"),
      (2L, "p q r s t u v w cc dd ee ff gg"),
      (3L, "h i j k l m n o h2 i2 j2 k2")
    ).toDF("id", "txt")
    val out = Dedup.crossDocSpans(docs, "id", "txt", k = 5)
      .orderBy("id", "span_start")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 7L, 4L),
      (2L, 0L, 7L, 4L)))
  }

  test("two separate copied runs stay two spans") {
    // shared run A at words 0-4, shared run B at words 11-15 of doc 1;
    // the 6-word gap (> k) must keep them separate islands
    val docs = Seq(
      (1L, "a b c d e x1 x2 x3 x4 x5 x6 f g h i j"),
      (2L, "a b c d e y1 y2 y3 y4 y5 y6 y7 y8 y9"),
      (3L, "z1 z2 z3 z4 z5 z6 z7 f g h i j")
    ).toDF("id", "txt")
    val out = Dedup.crossDocSpans(docs, "id", "txt", k = 5)
      .filter($"id" === 1L).orderBy("span_start")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq((0L, 4L, 1L), (11L, 15L, 1L)))
  }

  test("boilerplate above the doc-frequency cap is ignored") {
    val boiler = "same old footer text here"
    val docs = (1L to 5L).map(i => (i, s"unique$i word$i " + boiler))
      .toDF("id", "txt")
    assert(Dedup.crossDocSpans(docs, "id", "txt", k = 5,
      maxDocFreq = 4).count() == 0)
    // raising the cap re-admits it
    assert(Dedup.crossDocSpans(docs, "id", "txt", k = 5,
      maxDocFreq = 5).count() == 5)
  }

  test("docs shorter than k words and within-doc-only repeats yield nothing") {
    val docs = Seq(
      (1L, "tiny doc"),
      (2L, "r1 r2 r3 r4 r5 r1 r2 r3 r4 r5"), // repeats only within itself
      (3L, "q1 q2 q3 q4 q5 q6")
    ).toDF("id", "txt")
    assert(Dedup.crossDocSpans(docs, "id", "txt", k = 5).count() == 0)
  }

  test("result is partitioning-independent") {
    val docs = Seq(
      (1L, "p q r s t u v w xx yy zz"),
      (2L, "p q r s t u v w cc dd ee"),
      (3L, "m n o p q r s t aa bb cc")
    ).toDF("id", "txt")
    val a = Dedup.crossDocSpans(docs, "id", "txt", k = 5)
      .orderBy("id", "span_start").collect().toSeq
    val b = Dedup.crossDocSpans(docs.repartition(7), "id", "txt", k = 5)
      .orderBy("id", "span_start").collect().toSeq
    assert(a == b)
  }
}
