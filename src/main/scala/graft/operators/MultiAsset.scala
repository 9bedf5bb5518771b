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
    matched.drop("assets")
      // the groups side has the same cardinality class as the input
      // (one row per product) — never broadcast-safe at scale; pin a
      // shuffled hash join on product_id so AQE can't pick a
      // borderline broadcast of a map-valued relation
      .join(groups.hint("shuffle_hash"), "product_id")
      // residual of the reference's `.*{product_id}.*{data_file}`
      // filter — same single-match substitution, static pattern
      .filter(col("remote_fileurl").rlike(s".*$dataFileRegex.*$dataFile"))
      .withColumnRenamed("sibling_assets", "assets")
  }
}
