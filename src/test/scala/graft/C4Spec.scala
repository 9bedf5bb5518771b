package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.llm.C4

/** Pins the C4 cleaning pass (Raffel et al. 2020 §2.2) rule by rule —
  * the fixtures carry no punctuation or newlines, so the oracle query
  * exercises the rules only through its punctuated twin; these cases
  * cover the raw-page shapes. */
class C4Spec extends SparkSuite {

  import spark.implicits._

  private def reportOf(text: String,
                       cfg: C4.Config = C4.Config()): Row =
    Seq(text).toDF("text")
      .select(C4.report(col("text"), cfg).as("r"))
      .select("r.*").collect().head

  private val goodPage = Seq(
    "This is a perfectly normal sentence with words.",
    "Here is another sentence that also ends properly.",
    "And a third one to clear the sentence floor.").mkString("\n")

  test("a clean three-sentence page is kept verbatim") {
    val r = reportOf(goodPage)
    assert(r.getAs[String]("clean_text") === goodPage)
    assert(r.getAs[Long]("n_lines_kept") === 3)
    assert(r.getAs[Long]("n_sentences") === 3)
    assert(r.getAs[Boolean]("keep"))
  }

  test("lines without terminal punctuation are dropped") {
    val page = goodPage + "\nnavigation menu footer links home"
    val r = reportOf(page)
    assert(r.getAs[Long]("n_lines_kept") === 3)
    assert(r.getAs[String]("clean_text") === goodPage)
  }

  test("terminal quote marks count as sentence enders") {
    val page = Seq(
      "He said the words were \"fine enough stuff.\"",
      "She replied that all would be well again '",
      "A third line closes out the sentence floor.").mkString("\n")
    val r = reportOf(page)
    assert(r.getAs[Long]("n_lines_kept") === 3)
  }

  test("lines with fewer than 5 words are dropped") {
    val page = goodPage + "\nToo short."
    val r = reportOf(page)
    assert(r.getAs[Long]("n_lines_kept") === 3)
  }

  test("javascript lines are dropped case-insensitively") {
    val page = goodPage +
      "\nPlease enable JavaScript to view this site properly."
    val r = reportOf(page)
    assert(r.getAs[Long]("n_lines_kept") === 3)
  }

  test("pages with fewer than 3 sentences are discarded") {
    val page = Seq(
      "This is a perfectly normal sentence with words.",
      "only one line survives so the page dies").mkString("\n")
    val r = reportOf(page)
    assert(r.getAs[Long]("n_sentences") === 1)
    assert(!r.getAs[Boolean]("keep"))
  }

  test("lorem ipsum and curly braces discard the page") {
    val lorem = goodPage + "\nLorem Ipsum dolor sit amet filler text."
    assert(reportOf(lorem).getAs[Boolean]("has_lorem"))
    assert(!reportOf(lorem).getAs[Boolean]("keep"))
    val brace = goodPage + "\nfunction f() { return 1; } and more words."
    assert(reportOf(brace).getAs[Boolean]("has_brace"))
    assert(!reportOf(brace).getAs[Boolean]("keep"))
  }

  test("blocklist matches lowercased word tokens, not substrings") {
    val cfg = C4.Config(blocklist = Seq("badword"))
    val hit = reportOf(goodPage + "\nThis line contains BadWord. sadly.",
      cfg)
    assert(hit.getAs[Boolean]("has_badword"))
    assert(!hit.getAs[Boolean]("keep"))
    // "badwords" the token does NOT match blocklist entry "badword"
    // (\w+ tokenization yields "badwords")
    val near = reportOf(goodPage + "\nThis line contains badwords only.",
      cfg)
    assert(!near.getAs[Boolean]("has_badword"))
  }

  test("multiple sentences on one kept line all count") {
    val page = "One sentence here. Two sentences here! Three now?"
    val r = reportOf(page)
    assert(r.getAs[Long]("n_lines_kept") === 1)
    assert(r.getAs[Long]("n_sentences") === 3)
    assert(r.getAs[Boolean]("keep"))
  }

  test("clean() preserves schema and rewrites text") {
    val docs = Seq(
      (1, goodPage + "\ndropped line no punct"),
      (2, "too short to survive the cleaning.")).toDF("id", "text")
    val out = C4.clean(docs, "text")
    assert(out.columns.toSeq === Seq("id", "text"))
    val rows = out.collect()
    assert(rows.map(_.getInt(0)).toSeq === Seq(1))
    assert(rows.head.getString(1) === goodPage)
  }

  test("degenerate pages: empty and punctuation-free fail cleanly") {
    for (t <- Seq("", "word soup with no punctuation at all")) {
      val r = reportOf(t)
      assert(r.getAs[Long]("n_lines_kept") === 0)
      assert(!r.getAs[Boolean]("keep"))
    }
  }
  test("Clean.corpus composes the optional C4 and Gopher stages") {
    import graft.llm.{C4, Clean, Gopher}
    // passes C4 (3 proper sentences) but has too few words for Gopher
    val c4Only = Seq(
      "This is a perfectly normal sentence with words.",
      "Here is another sentence that also ends properly.",
      "And a third one to clear the sentence floor.").mkString("\n")
    val docs = Seq(
      (1, c4Only),
      (2, "no punctuation no sentences so c4 drops this page entirely"))
      .toDF("id", "text")
    // default config: neither stage wired in -> doc 2 survives the
    // basic token gate
    val basic = Clean.corpus(docs, "id", "text",
      Clean.Config(minTokens = 3))
    assert(basic.count() === 2)
    // C4 wired in: doc 2 dies (no kept lines); doc 1 survives with
    // text preserved
    val c4d = Clean.corpus(docs, "id", "text",
      Clean.Config(minTokens = 3, c4 = Some(C4.Config())))
    assert(c4d.select("id").collect().map(_.getInt(0)).toSeq === Seq(1))
    // Gopher on top: doc 1 has only ~26 words -> word-count rule kills
    // it; the composed pipeline returns nothing
    val both = Clean.corpus(docs, "id", "text",
      Clean.Config(minTokens = 3, c4 = Some(C4.Config()),
        gopher = Some(Gopher.Config())))
    assert(both.count() === 0)
  }
}
