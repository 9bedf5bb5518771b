package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J1 — multi-asset grouping ("product join"), the reference's only
  * real join (`cmr-query/handler.py:10-101`).
  *
  * Semantics: `product_id = regex_search(data_file_regex, url)`;
  * sibling files fold into a sorted `Map[asset_name → url]` where
  * `asset_name = re.sub(".*{product_id}[-_.]?", "", url)`; rows whose
  * url matches `.*{product_id}.*{data_file}` get the full sibling map
  * plus the `product_id`.
  *
  * Spark shape: `regexp_extract` → `groupBy(product_id)` building the
  * sorted asset map via `map_from_entries(sort_array(collect_list))` →
  * equi-join back on `product_id` (the reference's O(groups × rows)
  * regex nested loop collapses to one shuffle-equi join; a row can only
  * match the product extracted from its own url, since the match regex
  * embeds the product id). AQE handles the skewed-group case (one
  * UAVSAR product ⇒ dozens of siblings, SURVEY §4); with a small group
  * side Catalyst broadcasts automatically. */
object MultiAsset {

  /** If `pattern` is a literal modulo escapes (no unescaped regex
    * metacharacters, escapes only of punctuation), return the literal
    * string it matches — used to prefilter with a codegen'd `contains`
    * before the real regex runs (measured ~7 s of the sf0.1 J1 query
    * was plain rlike backtracking over rows that a substring test
    * rejects for free). */
  private[operators] def literalOf(pattern: String): Option[String] = {
    val meta = ".[](){}*+?^$|"
    val sb = new StringBuilder
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (c == '\\') {
        if (i + 1 >= pattern.length) return None
        val e = pattern.charAt(i + 1)
        if (Character.isLetterOrDigit(e)) return None // \d, \w, \1, ...
        sb.append(e); i += 2
      } else if (meta.indexOf(c) >= 0) return None
      else { sb.append(c); i += 1 }
    }
    Some(sb.toString)
  }

  def attach(objs: DataFrame, dataFile: String, dataFileRegex: String): DataFrame = {
    val pid = regexp_extract(col("remote_fileurl"), dataFileRegex, 0)
    val withPid = objs
      .withColumn("product_id", when(pid =!= "", pid))
    val matched = withPid.filter(col("product_id").isNotNull)
    // asset_name: everything after the product id (+ one optional
    // [-_.] separator) — the reference interpolates the extracted id
    // into a per-row pattern (`cmr-query/handler.py:82-83`); since the
    // id IS the dataFileRegex match, substituting the generic pattern
    // is equivalent whenever it matches once per url (every shipped
    // config) and lets the regex compile once instead of per row.
    val assetName = regexp_replace(col("remote_fileurl"),
      s".*$dataFileRegex[-_.]?", "")
    val groups = matched
      .select(col("product_id"), assetName.as("asset_name"),
        col("remote_fileurl").as("href"))
      // a duplicate asset name within a product last-wins in the
      // reference's dict; max() is the deterministic equivalent
      .groupBy("product_id", "asset_name").agg(max("href").as("href"))
      .groupBy("product_id")
      .agg(map_from_entries(sort_array(collect_list(
        struct(col("asset_name"), col("href"))))).as("sibling_assets"))
    // residual of the reference's `.*{product_id}.*{data_file}` match —
    // same single-match substitution, static pattern. rlike is an
    // unanchored find, so the reference's leading `.*` (re.match) is
    // dropped; when data_file is literal-modulo-escapes a substring
    // test rejects most rows before the regex engine ever runs.
    val residual = col("remote_fileurl").rlike(s"$dataFileRegex.*$dataFile")
    val dataFilter = literalOf(dataFile) match {
      case Some(lit0) => col("remote_fileurl").contains(lit0) && residual
      case None => residual
    }
    matched.drop("assets")
      // applied BEFORE the join: only data-file rows need sibling maps,
      // so the probe side shrinks from |files| to |products|
      .filter(dataFilter)
      // the groups side has the same cardinality class as the input
      // (one row per product) — never broadcast-safe at scale; pin a
      // shuffled hash join on product_id so AQE can't pick a
      // borderline broadcast of a map-valued relation
      .join(groups.hint("shuffle_hash"), "product_id")
      .withColumnRenamed("sibling_assets", "assets")
  }
}
