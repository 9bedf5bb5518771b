package graft

import graft.llm.{Mixing, Retrieval}
import org.apache.spark.sql.functions._

/** BM25 retrieval + domain-mixture materialization. */
class RetrievalSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle join join join performance", "web"),
    (2L, "join order optimization in a query planner", "web"),
    (3L, "gardening tips for tomatoes and peppers", "books"),
    (4L, "the join operator and the hash table", "books"),
    (5L, "completely unrelated prose about sailing ships", "web"))
    .toDF("doc_id", "text", "source")

  test("bm25: docs containing the query terms rank; absent docs excluded") {
    val top = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("join", "hash"), k = 10).collect()
    val ids = top.map(_.getLong(0)).toSet
    assert(ids == Set(1L, 2L, 4L), s"got $ids")
    // doc 4 matches BOTH terms; its n_hit must say so
    val byId = top.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(4L) == 2L && byId(1L) == 1L)
  }

  test("bm25: tf saturation — 3x'join' beats 1x'join' but not by 3x") {
    val top = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("join"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(top(1L) > top(2L), "higher tf must score higher")
    assert(top(1L) < 3 * top(2L), "bm25 must saturate tf")
  }

  test("bm25: idf — a rarer term outscores a common one at equal tf") {
    val d = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha delta"),
      (4L, "beta something")).toDF("doc_id", "text")
    val top = Retrieval.bm25TopK(d, "doc_id", "text",
      Seq("alpha", "delta"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 3 has common 'alpha' + rare 'delta'; doc 1's 'beta' is not queried
    assert(top(3L) > top(1L))
  }

  test("mixture: copy counts follow rates; weight-0 sources dropped") {
    val out = Mixing.materializeMixture(docs, "doc_id", "source",
      Map("web" -> 2.0, "books" -> 1.0), targetRows = 9).collect()
    // web rate = 9*(2/3)/3 = 2.0 → exactly 2 copies each of docs 1,2,5;
    // books rate = 9*(1/3)/2 = 1.5 → 1 copy + md5-coin for docs 3,4
    val webCopies = out.filter(_.getAs[String]("source") == "web")
    assert(webCopies.length == 6)
    assert(webCopies.groupBy(_.getAs[Long]("doc_id"))
      .forall(_._2.map(_.getAs[Int]("copy")).sorted.toSeq == Seq(1, 2)))
    val books = out.filter(_.getAs[String]("source") == "books")
    assert(books.length >= 2 && books.length <= 4)
    // determinism: second run picks the identical rows
    val again = Mixing.materializeMixture(docs, "doc_id", "source",
      Map("web" -> 2.0, "books" -> 1.0), targetRows = 9).collect()
    assert(out.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
      r.getAs[Int]("copy"))).sorted.toSeq ==
      again.map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("copy"))).sorted.toSeq)
  }

  test("mixture: pure downsample keeps a subset, one copy each") {
    val out = Mixing.materializeMixture(docs, "doc_id", "source",
      Map("web" -> 1.0, "books" -> 1.0), targetRows = 2).collect()
    assert(out.forall(_.getAs[Int]("copy") == 1))
    assert(out.length <= 3)
  }

  test("mixture: expectation hits target on a larger corpus (±15%)") {
    val big = spark.range(2000).select(col("id").as("doc_id"),
      concat(lit("doc "), col("id")).as("text"),
      when(col("id") % 2 === 0, "a").otherwise("b").as("source"))
    val n = Mixing.materializeMixture(big, "doc_id", "source",
      Map("a" -> 3.0, "b" -> 1.0), targetRows = 1500).count()
    assert(math.abs(n - 1500.0) / 1500.0 < 0.15, s"got $n rows")
  }
}
