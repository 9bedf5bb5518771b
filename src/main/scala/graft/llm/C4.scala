package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The C4 cleaning pass (Raffel et al. 2020, "Exploring the Limits of
  * Transfer Learning with a Unified Text-to-Text Transformer", §2.2) —
  * the line-and-page filter applied to Common Crawl before the Gopher
  * rule era, still the baseline recipe training pipelines reach for:
  *
  *  - retain only lines ending in a terminal punctuation mark
  *    (period, exclamation, question mark, double or single quote);
  *  - retain only lines with at least `minWordsPerLine` (5) words;
  *  - drop any line containing the word "javascript";
  *  - discard the whole page when the kept text has fewer than
  *    `minSentences` (3) sentences, when the page contains
  *    "lorem ipsum" or a curly brace `{`, or when any page token
  *    matches the configured blocklist.
  *
  * Exact measurement definitions (replayed by the DuckDB oracle):
  * lines split on `\n` and space-trimmed; a line's word count is its
  * nonempty whitespace tokens; "javascript"/"lorem ipsum" matching is
  * case-insensitive substring; sentence count = occurrences of
  * `.` `!` `?` in the KEPT text; blocklist matching is on lowercased
  * `\w+` tokens of the ORIGINAL page (so "spark." matches "spark").
  * The cleaned text preserves original case, kept lines re-joined
  * with `\n`.
  *
  * Scale shape: pure per-row columnar work over line arrays (a page
  * has few lines, so the HOF lambdas stay cheap — unlike the Gopher
  * n-gram folds there is no per-n blowup to go native for). No
  * shuffle, no UDF: one scan cleans 100 TB.
  */
object C4 {

  case class Config(
      minWordsPerLine: Int = 5,
      minSentences: Int = 3,
      blocklist: Seq[String] = Nil)

  private val TerminalPunct = Seq(".", "!", "?", "\"", "'")

  /** Kept lines of a page (trimmed, original case). */
  def keptLines(text: Column, cfg: Config = Config()): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l =>
      TerminalPunct.map(p => l.endsWith(p)).reduce(_ || _) &&
        size(filter(split(l, "\\s+"), w => w =!= "")) >=
          cfg.minWordsPerLine &&
        !lower(l).contains("javascript"))

  private def charCount(text: Column, c: String): Column =
    Text.substringCount(text, c).cast("long")

  /** Full per-page report: struct(clean_text, n_lines_kept,
    * n_sentences, has_lorem, has_brace, has_badword, keep). */
  def report(text: Column, cfg: Config = Config()): Column = {
    val kept = keptLines(text, cfg)
    val clean = array_join(kept, "\n")
    val sentences = charCount(clean, ".") + charCount(clean, "!") +
      charCount(clean, "?")
    val lorem = lower(text).contains("lorem ipsum")
    val brace = text.contains("{")
    val badword =
      if (cfg.blocklist.isEmpty) lit(false)
      else size(array_intersect(
        array_distinct(regexp_extract_all(lower(text), lit("\\w+"),
          lit(0))),
        typedlit(cfg.blocklist.map(_.toLowerCase)))) > 0
    struct(
      clean.as("clean_text"),
      size(kept).cast("long").as("n_lines_kept"),
      sentences.as("n_sentences"),
      lorem.as("has_lorem"),
      brace.as("has_brace"),
      badword.as("has_badword"),
      (sentences >= cfg.minSentences && !lorem && !brace && !badword)
        .as("keep"))
  }

  /** Clean a corpus: drop failing pages, replace the text column with
    * the kept lines. Schema is preserved.
    *
    * The report is staged through `explode(array(report))` — a
    * one-element Generate — rather than a plain projection: predicate
    * pushdown re-inlines a projected alias into the Filter (the
    * measured Gopher filterCorpus trap), evaluating the whole report
    * struct once for `keep` and again for `clean_text`; a Filter on
    * GENERATOR output cannot be pushed into the generator's input, so
    * the struct is evaluated exactly once per row. The temp column
    * name is uniquified against the input schema (a user column named
    * `__c4` used to be silently clobbered). */
  def clean(docs: DataFrame, textCol: String,
            cfg: Config = Config()): DataFrame = {
    var tmp = "__c4"
    while (docs.columns.contains(tmp)) tmp += "_"
    docs
      .select(col("*"), explode(array(report(col(textCol), cfg))).as(tmp))
      .filter(col(tmp).getField("keep"))
      .withColumn(textCol, col(tmp).getField("clean_text"))
      .drop(tmp)
  }
}
