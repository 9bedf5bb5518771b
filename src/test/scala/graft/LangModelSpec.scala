package graft

import graft.llm.LangModel

/** Pins the bigram Stupid Backoff scorer against hand-computed
  * micro-nat values — including the OOV-unigram floor the fixture
  * corpus cannot produce (its tiny vocabulary appears fully even in a
  * 10-doc model slice). */
class LangModelSpec extends SparkSuite {

  import spark.implicits._

  private def e6(p: Double): Long = math.round(-math.log(p) * 1e6)

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

  test("stupid backoff: first-token, seen-bigram, backoff, OOV floor") {
    // model tokens: a b a c -> c1: a=2 b=1 c=1, N=4
    // bigrams: (a,b) (b,a) (a,c), each once
    val model = Seq((1L, "a b a c")).toDF("doc_id", "text")
    // scored: a b z c a q
    //   a    first token      p = 2/4
    //   a,b  seen bigram      p = c2/c1(a) = 1/2
    //   b,z  backoff, z OOV   p = 0.4 * 1/4
    //   z,c  backoff          p = 0.4 * 1/4
    //   c,a  UNSEEN bigram    p = 0.4 * 2/4
    //   a,q  backoff, q OOV   p = 0.4 * 1/4
    val score = Seq((10L, "a b z c a q")).toDF("doc_id", "text")
    val r = LangModel.stupidBackoffNll(model, score, "doc_id", "text")
      .collect().head
    assert(r.getAs[Long]("n_terms") === 6L)
    val want = e6(0.5) + e6(0.5) + 3 * e6(0.4 * 0.25) + e6(0.4 * 0.5)
    assert(r.getAs[Long]("sum_nll_e6") === want)
    assert(want === 9903487L) // 2x693147 + 3x2302585 + 1609438
  }

  test("self-scoring a one-path corpus gives all seen bigrams") {
    val d = Seq((1L, "x y x y")).toDF("doc_id", "text")
    // c1: x=2 y=2, N=4; bigrams (x,y)=2 (y,x)=1
    // score same doc: x first p=1/2; (x,y) p=2/2=1 -> 0 nats;
    // (y,x) p=1/2; (x,y) p=1
    val r = LangModel.stupidBackoffNll(d, d, "doc_id", "text")
      .collect().head
    assert(r.getAs[Long]("n_terms") === 4L)
    assert(r.getAs[Long]("sum_nll_e6") === 2 * e6(0.5))
  }

  test("randomized corpora match a sequential reference") {
    val rnd = new scala.util.Random(11)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee", "ff")
    def doc(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    // small model over 6 words -> all three scoring branches fire
    val model = (1 to 4).map(i => (i.toLong, doc(rnd.nextInt(8) + 1)))
    val score = (10 to 20).map(i => (i.toLong, doc(rnd.nextInt(15) + 1)))
    def toks(t: String): Vector[String] =
      "[a-z]+".r.findAllIn(t.toLowerCase).toVector
    val mt = model.map(d => toks(d._2)).filter(_.nonEmpty)
    val c1 = mt.flatten.groupBy(identity).map { case (w, o) =>
      w -> o.size.toLong }
    val n = c1.values.sum.toDouble
    val c2 = mt.filter(_.size >= 2)
      .flatMap(ws => ws.sliding(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (k, o) => k -> o.size.toLong }
    val want = score.flatMap { case (id, t) =>
      val ws = toks(t)
      if (ws.isEmpty) None
      else Some {
        var sum = 0L
        for (i <- ws.indices) {
          val cur = ws(i)
          val pUni = c1.get(cur).map(_.toDouble).getOrElse(1.0) / n
          sum += (if (i == 0) e6(pUni)
          else c2.get((ws(i - 1), cur)) match {
            case Some(c) => e6(c.toDouble / c1(ws(i - 1)))
            case None => e6(0.4 * pUni)
          })
        }
        (id, ws.size.toLong, sum)
      }
    }.toSet
    val got = LangModel.stupidBackoffNll(model.toDF("doc_id", "text"),
      score.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(got === want)
  }

  test("docs with no alpha tokens are not scored") {
    val model = Seq((1L, "a b a c")).toDF("doc_id", "text")
    val score = Seq((10L, "12345 678"), (11L, "a b")).toDF("doc_id", "text")
    val got = LangModel.stupidBackoffNll(model, score, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(11L))
  }
}
