package graft

import graft.llm.Dedup

/** Pins [[Dedup.removeRepeatedSpans]] — the ExactSubstr removal of Lee
  * et al. 2022 — against a sequential reference implementation and
  * hand-computed semantic cases (keeper survives, overlapping windows
  * merge, short docs untouched, full duplicates empty out). */
class SpanRemovalSpec extends SparkSuite {

  import spark.implicits._

  private val Span = 64
  private val Stride = 16

  /** Sequential reference: sample windows, group by exact content,
    * drop every site but the global (doc_id, pos) minimum, cut with a
    * running-cursor sweep. */
  private def ref(docs: Seq[(Int, String)]): Map[Int, (String, Long)] = {
    val norm = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.replaceAll("\\s+", " ") }
    val wins = for {
      (id, n) <- norm
      if n.length >= Span
      p <- 1 to (n.length - Span + 1) by Stride
    } yield (id, p, n.substring(p - 1, p - 1 + Span))
    val cuts = wins.groupBy(_._3).filter(_._2.size >= 2).values
      .flatMap(sites => sites.sortBy(s => (s._1, s._2)).tail)
      .groupBy(_._1)
      .map { case (id, ss) => id -> ss.map(_._2).toSeq.sorted }
    norm.map { case (id, n) =>
      val sb = new StringBuilder
      var cursor = 1
      for (p <- cuts.getOrElse(id, Seq.empty)) {
        if (p > cursor) sb.append(n.substring(cursor - 1, p - 1))
        cursor = math.max(cursor, p + Span)
      }
      sb.append(n.substring(math.min(cursor - 1, n.length)))
      id -> (sb.toString, (n.length - sb.length).toLong)
    }.toMap
  }

  private def run(docs: Seq[(Int, String)]): Map[Int, (String, Long)] =
    Dedup.removeRepeatedSpans(docs.toDF("doc_id", "text"),
      "doc_id", "text", Span, Stride)
      .collect()
      .map(r => r.getInt(0) -> (r.getString(1), r.getLong(2))).toMap

  private def check(docs: Seq[(Int, String)]): Map[Int, (String, Long)] = {
    val got = run(docs)
    val want = ref(docs)
    assert(got === want)
    got
  }

  // 64 chars, aperiodic at stride offsets (period 26, stride 16)
  private val P = (0 until 64).map(i => ('a' + (i * 7 + 3) % 26).toChar)
    .mkString
  private def tail(seed: Int) = (0 until 40)
    .map(i => ('a' + (i * 11 + seed) % 26).toChar).mkString

  test("cross-doc repeat: keeper doc intact, later doc loses the span") {
    val docs = Seq(1 -> (P + tail(5)), 2 -> (P + tail(17)))
    val got = check(docs)
    assert(got(1) === (P + tail(5), 0L))   // keeper untouched
    assert(got(2)._1 === (P + tail(17)).substring(Span)) // span excised
    assert(got(2)._2 === Span.toLong)
  }

  test("within-doc repeat: P+P cleans to exactly P") {
    val got = check(Seq(1 -> (P + P)))
    assert(got(1) === (P, Span.toLong))
  }

  test("overlapping cut windows merge via the running cursor") {
    // C is 80 chars shared: windows at pos 1 and 17 both duplicate,
    // their [1,64] and [17,80] cuts merge into one [1,80] excision
    val c = P + (0 until 16).map(i => ('a' + (i * 5 + 1) % 26).toChar)
      .mkString
    val docs = Seq(1 -> (c + tail(3)), 2 -> (c + tail(9)))
    val got = check(docs)
    assert(got(1)._2 === 0L)
    assert(got(2)._1 === (c + tail(9)).substring(80))
    assert(got(2)._2 === 80L)
  }

  test("exact full-doc duplicate empties the later doc") {
    // len 96 = last window lands at 33 = len-63: cuts cover [1, 96]
    val d = P + P.take(32)
    assert(d.length === 96)
    val got = check(Seq(1 -> d, 2 -> d))
    assert(got(1) === (d, 0L))
    assert(got(2) === ("", 96L))
  }

  test("docs shorter than the span and unique docs pass through") {
    val docs = Seq(1 -> "tiny doc", 2 -> tail(1), 3 -> (P + tail(21)))
    val got = check(docs)
    assert(got.values.forall(_._2 === 0L))
    assert(got(1)._1 === "tiny doc")
  }

  test("normalization: matching is case/whitespace-insensitive") {
    val docs = Seq(
      1 -> (P + tail(5)),
      2 -> (P.toUpperCase + "  " + tail(17))) // normalizes to p+' '+...
    // doc 2's normalized form is P + " " + tail — window 1 equals P
    // only if the space does not land inside it; it starts at pos 1,
    // so chars 1..64 are exactly P in both docs
    val got = check(docs)
    assert(got(2)._2 === Span.toLong)
  }

  test("randomized corpora match the sequential reference") {
    // seeded: word soup over a small vocab (natural repeats) plus
    // planted shared blocks at arbitrary (non-stride-aligned) offsets
    val rnd = new scala.util.Random(42)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps",
      "zeta", "eta", "theta")
    def soup(n: Int): String =
      Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val block = soup(30).take(90)
    for (round <- 1 to 5) {
      val docs = (1 to 12).map { id =>
        val body =
          if (rnd.nextBoolean()) soup(rnd.nextInt(40) + 5)
          else soup(rnd.nextInt(10)) + " " + block + " " + soup(rnd.nextInt(10))
        id -> body
      }
      check(docs) // asserts Spark == sequential reference
    }
  }

  test("three-way repeat: one keeper, two removals") {
    val docs = Seq(3 -> (P + tail(2)), 1 -> (P + tail(4)),
      2 -> (P + tail(6)))
    val got = check(docs)
    assert(got(1)._2 === 0L) // global min doc_id wins regardless of order
    assert(got(2)._2 === Span.toLong)
    assert(got(3)._2 === Span.toLong)
  }
}
