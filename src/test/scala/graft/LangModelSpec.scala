package graft

import graft.llm.LangModel

class LangModelSpec extends SparkSuite {
  import spark.implicits._

  test("unigram NLL matches hand-computed micro-nats on a tiny corpus") {
    // corpus: a:2 b:2 c:1, total 5
    //   nll(a) = nll(b) = round(-ln(2/5)*1e6) = 916291
    //   nll(c) = round(-ln(1/5)*1e6) = 1609438
    val docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "??!!")).toDF("id", "txt")
    val out = LangModel.unigramNll(docs, "id", "txt")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 3 has no alpha tokens → no row
    assert(out.toSeq == Seq(
      (1L, 3L, 2L * 916291L + 916291L),
      (2L, 2L, 916291L + 1609438L)))
  }

  test("rare tokens score strictly higher than common ones") {
    val docs = Seq(
      (1L, "common common common common common common common common"),
      (2L, "rareword")).toDF("id", "txt")
    val out = LangModel.unigramNll(docs, "id", "txt")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2).toDouble / r.getLong(1))).toMap
    assert(out(2L) > out(1L))
  }
}
