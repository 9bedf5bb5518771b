package graft

import graft.llm.Html
import org.apache.spark.sql.functions._

/** HTML text extraction ([[graft.llm.Html]]). */
class HtmlSpec extends SparkSuite {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(Html.extractText(col("h"))).collect().head.getString(0)

  private def density(html: String): Double =
    Seq(html).toDF("h").select(Html.linkDensity(col("h"))).collect().head.getDouble(0)

  test("tags strip, words do not fuse") {
    assert(extract("<p>hello</p><div>world</div>") == "hello world")
  }

  test("script and style blocks vanish with their content") {
    assert(extract(
      "<style>p{x:1}</style>a<script type=\"x\">var y = 1 < 2;</script>b")
      == "a b")
  }

  test("comments vanish, multi-line too") {
    assert(extract("a<!-- one\ntwo -->b") == "a b")
  }

  test("entities decode once (&amp;lt; stays literal &lt;)") {
    assert(extract("x &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; done")
      == "x <tag> \"q\" 's' & done")
    assert(extract("&amp;lt;") == "&lt;")
  }

  test("whitespace collapses and trims") {
    assert(extract("  a \n\t b   c  ") == "a b c")
  }

  test("link density = anchor text share of extracted text") {
    val html = "<p>four chars</p><a href='/x'>link</a>"
    // clean = "four chars link" (15), link = "link" (4)
    assert(math.abs(density(html) - 4.0 / 15.0) < 1e-9)
  }

  test("link density is 0 on pages with no text") {
    assert(density("<script>x</script>") == 0.0)
  }

  test("anchors inside stripped blocks do not count") {
    val html = "<script><a href='/x'>ghost</a></script><p>body text</p>"
    assert(density(html) == 0.0)
    assert(extract(html) == "body text")
  }

  test("case-insensitive tag matching") {
    assert(extract("<SCRIPT>x</SCRIPT><P>ok</P>") == "ok")
  }
}
