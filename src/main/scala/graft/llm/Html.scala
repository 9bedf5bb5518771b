package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → training-text extraction: the boilerplate-removal stage every
  * web-crawl corpus passes through before quality/dedup. Pure per-row
  * column expressions (regexp chains + replaces, whole-stage codegen) —
  * no parser library, no UDF, nothing per-row on the driver. The regex
  * dialect is kept to the RE2-compatible subset (inline `(?is)` flags,
  * lazy quantifiers, no backreferences) so the same patterns run
  * identically under Java regex here and RE2 in the DuckDB oracle.
  *
  * This is deliberately the heuristic tier (tag/script/comment strip,
  * entity decode, whitespace collapse, link density) — the signals
  * trafilatura-class extractors build on — not a DOM parser: at crawl
  * scale the first pass must be cheap and codegen'd, and rows it keeps
  * can afford a heavier second pass.
  */
object Html {

  /** Drop <script>/<style> blocks (content included) and comments. */
  def stripBlocks(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
  }

  /** Remove remaining tags, leaving a space so words don't fuse. */
  def stripTags(x: Column): Column = regexp_replace(x, "<[^>]*>", " ")

  /** Single-pass decode of the common entities (`&amp;` last, so
    * `&amp;lt;` decodes to the literal `&lt;` exactly once). */
  def decodeEntities(x: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(x) { case (c, (from, to)) => regexp_replace(c, from, to) }
  }

  /** Collapse runs of whitespace and trim. */
  def collapseWs(x: Column): Column =
    trim(regexp_replace(x, "\\s+", " "))

  /** Full extraction chain: blocks → tags → entities → whitespace. */
  def extractText(html: Column): Column =
    collapseWs(decodeEntities(stripTags(stripBlocks(html))))

  /** Inner texts of `<a>` elements, extracted through the same chain —
    * the numerator of link density. */
  def linkText(html: Column): Column =
    collapseWs(decodeEntities(stripTags(
      array_join(regexp_extract_all(stripBlocks(html),
        lit("(?is)<a\\b[^>]*>(.*?)</a>"), lit(1)), " "))))

  /** Link chars / total extracted chars in [0,1]; 0 on empty pages.
    * High link density = navigation boilerplate, the classic drop
    * signal. */
  def linkDensity(html: Column): Column = {
    val total = length(extractText(html))
    when(total === 0, lit(0.0))
      .otherwise(length(linkText(html)).cast("double") / total.cast("double"))
  }
}
