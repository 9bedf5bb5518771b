package graft

import graft.model.PipelineEvent
import graft.operators.StacBuilder
import graft.sources.Cmr
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end STAC pipeline queries: synthetic file inventories /
  * granule catalogs derived from the testdata tables, run through the
  * REAL discovery → item-build operators, with every output column
  * reconstructable in ANSI SQL for the DuckDB oracle. */
object StacQueries {
  import Tables.t

  /** Serialize the assets map deterministically:
    * `name=href|media|role+role` per entry, comma-joined (entries are
    * already key-sorted by construction). */
  private def assetsStr(assets: Column): Column =
    array_join(transform(map_entries(assets), e => concat(
      e.getField("key"), lit("="),
      e.getField("value").getField("href"), lit("|"),
      coalesce(e.getField("value").getField("media_type"), lit("-")),
      lit("|"),
      array_join(e.getField("value").getField("roles"), "+"))), ",")

  /** Flagship: inventory-style discovery over synthetic order files →
    * regex-path STAC items (S2→P1→P3→F1→F2→item assembly→K1 shape).
    * Exercises the full [[StacBuilder.regexItems]] stack including
    * media-type dispatch and the default-asset merge.
    *
    * The key token is `ord_k<key>_` (not `ord_<key>_`): the F1 date
    * cascade — faithfully to the reference, which strptime-raises —
    * quarantines ANY filename whose underscore-delimited 8-digit
    * runs are not all valid dates, and at sf1+ the scaled order keys
    * cross 8 digits (the r14 sf1 sweep caught exactly this: 90% null
    * datetimes vs the oracle, which derives the date from
    * o_orderdate rather than replaying the cascade). The `k` keeps
    * the synthetic filenames inside the operator's input domain at
    * every scale factor, like the reference's own alphanumeric
    * granule ids. */
  def stacRegexItems(s: SparkSession, dir: String): DataFrame = {
    val ev = PipelineEvent(
      collection = "orders",
      assetName = Some("data"),
      assetRolesList = Some(Seq("data")),
      assetMediaTypeMap = Map(
        "tif" -> "image/tiff; application=geotiff; profile=cloud-optimized"))
    val url = concat(lit("s3://raw/orders/ord_k"),
      col("o_orderkey").cast("string"), lit("_"),
      date_format(col("o_orderdate"), "yyyyMMdd"), lit(".tif"))
    val objs = t(s, dir, "orders").select(
      lit(ev.collection).as("collection"),
      url.as("remote_fileurl"),
      lit(null).cast("map<string,string>").as("properties"),
      lit(null).cast("string").as("product_id"),
      lit(null).cast("map<string,string>").as("assets"))
    StacBuilder.regexItems(objs, ev)
      .select(col("id"), col("collection"), col("datetime"),
        assetsStr(col("assets")).as("assets_str"))
      .orderBy("id")
  }

  /** Regex path with month widening + properties serialization. */
  def stacRegexItemsMonth(s: SparkSession, dir: String): DataFrame = {
    val ev = PipelineEvent(collection = "orders",
      datetimeRange = Some("month"))
    val url = concat(lit("s3://raw/orders/ord_k"),
      col("o_orderkey").cast("string"), lit("_"),
      date_format(col("o_orderdate"), "yyyyMMdd"), lit(".tif"))
    val objs = t(s, dir, "orders").select(
      lit(ev.collection).as("collection"),
      url.as("remote_fileurl"),
      lit(null).cast("map<string,string>").as("properties"),
      lit(null).cast("string").as("product_id"),
      lit(null).cast("map<string,string>").as("assets"))
    StacBuilder.regexItems(objs, ev)
      .select(col("id"),
        col("start_datetime"), col("end_datetime"),
        element_at(col("properties"), "start_datetime").as("prop_start"),
        element_at(col("properties"), "end_datetime").as("prop_end"))
      .orderBy("id")
  }

  /** Synthetic CMR granule catalog derived from `part`. */
  def syntheticGranules(s: SparkSession, dir: String): DataFrame = {
    val pk = col("p_partkey")
    val ts = date_add(to_date(lit("2016-01-01")), pmod(pk, lit(365)).cast("int"))
      .cast("timestamp")
    val x0 = pmod(pk, lit(80))
    val y0 = pmod(pk, lit(90))
    val dataHref = concat(lit("s3://store/g"), pk.cast("string"), lit(".hdr"))
    t(s, dir, "part").select(
      concat(lit("G"), pk.cast("string")).as("id"),
      concat(lit("g"), pk.cast("string"), lit(".hdr")).as("title"),
      lit("Synthetic dataset").as("dataset_id"),
      lit("GRAFT").as("data_center"),
      date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'").as("time_start"),
      date_format(ts, "yyyy-MM-dd'T'23:59:59'Z'").as("time_end"),
      date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'").as("updated"),
      lit("CARTESIAN").as("coordinate_system"),
      lit("UNSPECIFIED").as("day_night_flag"),
      lit("ECHO10").as("original_format"),
      concat(lit("C1-GRAFT")).as("collection_concept_id"),
      lit(false).as("browse_flag"),
      lit(false).as("online_access_flag"),
      array(concat_ws(" ", x0.cast("string"), y0.cast("string"),
        (x0 + 2).cast("string"), (y0 + 2).cast("string"))).as("boxes"),
      lit(null).cast("array<array<string>>").as("polygons"),
      array(
        struct(
          lit("http://esipfed.org/ns/fedsearch/1.1/s3#").as("rel"),
          dataHref.as("href"),
          lit(null).cast("string").as("type"),
          lit("File to download").as("title"),
          lit("en-US").as("hreflang"),
          lit(null).cast("boolean").as("inherited")),
        struct(
          lit("http://esipfed.org/ns/fedsearch/1.1/documentation#").as("rel"),
          concat(lit("https://docs/g"), pk.cast("string")).as("href"),
          lit("text/html").as("type"),
          lit("Docs").as("title"),
          lit("en-US").as("hreflang"),
          lit(true).as("inherited"))).as("links"))
  }

  /** CMR-path end to end: granule source → P5 link selection →
    * [[StacBuilder.cmrItems]] (geometry G1/G2, link classify, asset
    * fold, sorted merge). */
  def stacCmrItems(s: SparkSession, dir: String): DataFrame = {
    val ev = PipelineEvent(
      collection = "granules",
      discovery = "cmr",
      mode = Some("cmr"),
      assetName = Some("data"),
      assetRolesList = Some(Seq("data")),
      assetMediaTypeMap = Map("hdr" -> "binary/octet-stream"))
    val granules = syntheticGranules(s, dir)
    val objs = Cmr.discover(granules, ev)
    StacBuilder.cmrItems(objs, granules, ev)
      .select(col("id"), col("datetime"),
        element_at(col("bbox"), 1).as("min_x"),
        element_at(col("bbox"), 2).as("min_y"),
        element_at(col("bbox"), 3).as("max_x"),
        element_at(col("bbox"), 4).as("max_y"),
        assetsStr(col("assets")).as("assets_str"),
        size(col("links")).as("n_links"),
        element_at(col("properties"), "concept_id").as("concept_id"))
      .orderBy("id")
  }
}
