package graft

import graft.llm.{Phrases, Retrieval}
import org.apache.spark.sql.functions._

/** PMI bigrams ([[graft.llm.Phrases]]) and the inverted index
  * ([[graft.llm.Retrieval.invertedIndex]]). */
class PhrasesSpec extends SparkSuite {
  import spark.implicits._

  // "new york" always collocates; "of the" is frequent but independent
  private lazy val docs = Seq(
    (1L, "new york is big"),
    (2L, "new york is old"),
    (3L, "the best of the rest of the east"),
    (4L, "of new the york"), // breaks up the pair without pairing them
    (5L, "")
  ).toDF("doc_id", "text")

  test("collocated pairs score higher PMI than chance pairs") {
    val out = Phrases.pmiBigrams(docs, "doc_id", "text", minCount = 2L)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    val (nyN, nyPmi) = out(("new", "york"))
    val (otN, otPmi) = out(("of", "the"))
    assert(nyN == 2L && otN == 2L)
    assert(nyPmi > otPmi,
      s"'new york' ($nyPmi) should out-score 'of the' ($otPmi)")
  }

  test("pmi matches the hand formula ln(n_ab*N / (n_a*n_b))") {
    val out = Phrases.pmiBigrams(docs, "doc_id", "text", minCount = 2L)
      .filter(col("a") === "new" && col("b") === "york")
      .collect().head.getDouble(3)
    // N=20 tokens, n_ab=2, n_new=3, n_york=3
    val expected = math.rint(math.log(2.0 * 20.0 / (3.0 * 3.0)) * 1e6) / 1e6
    assert(math.abs(out - expected) < 1e-9)
  }

  test("minCount prunes rare bigrams") {
    val out = Phrases.pmiBigrams(docs, "doc_id", "text", minCount = 2L)
      .collect()
    assert(out.forall(_.getLong(2) >= 2L))
    assert(!out.exists(r => r.getString(0) == "is" && r.getString(1) == "big"))
  }

  test("bigrams never cross document boundaries") {
    val two = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    val out = Phrases.pmiBigrams(two, "doc_id", "text", minCount = 1L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(out == Set(("alpha", "beta"), ("gamma", "delta")))
  }

  test("inverted index: df/total_tf exact, postings capped and ordered") {
    val d = Seq(
      (1L, "x x x y"),
      (2L, "x y y"),
      (3L, "x")
    ).toDF("doc_id", "text")
    val out = Retrieval.invertedIndex(d, "doc_id", "text", maxPostings = 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // x: df=3, tf total=5; top2 postings by tf desc, doc asc: 1:3, 2:1
    assert(out("x") == ((3L, 5L, "1:3,2:1")))
    // y: df=2, tf total=3; postings 2:2, 1:1
    assert(out("y") == ((2L, 3L, "2:2,1:1")))
  }

  test("inverted index postings tie-break is doc asc at equal tf") {
    val d = Seq((5L, "z"), (3L, "z"), (9L, "z")).toDF("doc_id", "text")
    val out = Retrieval.invertedIndex(d, "doc_id", "text", maxPostings = 2)
      .collect().head
    assert(out.getString(3) == "3:1,5:1")
  }
}
