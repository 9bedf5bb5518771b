package graft.sources

import graft.functions.Ids
import graft.model.{PipelineEvent, Schemas}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Discovery sources S1 (listing), S2 (CSV inventory): remote-file
  * enumeration → `Dataset[FileObj]`.
  *
  * Scale design: both scans are partition-parallel file sources (the
  * reference's driver-side pagination loops and 230 KB payload cursors
  * are deleted per SURVEY §7.5 — Spark partitions the scan instead).
  * The anchored filename-regex filter (P1) is applied as a catalyst
  * predicate so it prunes before any downstream work.
  */
object Discovery {

  /** P1: `re.match` anchors at the start; `rlike` searches — so the
    * pattern wraps in an anchored non-capturing group (reference
    * `s3-discovery/handler.py:65`, `inventory/handler.py:61`). A bare
    * prepended `^` would anchor only the FIRST branch of a top-level
    * alternation ("a|b" → "^a|b" matches b ANYWHERE), silently
    * discovering wrong files; `^(?:a|b)` anchors the whole pattern,
    * exactly like `re.match`. */
  def anchoredMatch(c: Column, regex: String): Column =
    c.rlike("^(?:" + regex + ")")

  private def regexFilter(df: DataFrame, target: Column,
                          regex: Option[String]): DataFrame =
    regex.fold(df)(r => df.filter(anchoredMatch(target, r)))

  /** The projection/enrichment P3 shared by both scans: scan row →
    * file_obj with event constants as `lit`s (constant-folded). */
  private def toFileObj(df: DataFrame, ev: PipelineEvent, url: Column,
                        productId: Column, assets: Column): DataFrame =
    df.select(
      lit(ev.collection).as("collection"),
      url.as("remote_fileurl"),
      lit(ev.upload).as("upload"),
      lit(ev.userShared).as("user_shared"),
      lit(ev.ingest).as("ingest"),
      lit(ev.cogify).as("cogify"),
      (if (ev.properties.isEmpty)
        lit(null).cast("map<string,string>")
      else typedlit(ev.properties)).as("properties"),
      productId.as("product_id"),
      lit(null).cast("string").as("granule_id"),
      assets.as("assets"),
      lit(0).as("attempt"),
      // P4: every event key containing "asset" passes through wholesale
      // (reference `inventory/handler.py:78-80`).
      typedlit(assetPassthrough(ev)).as("extra"))

  /** P4 asset-key passthrough, serialized into the open-world `extra`
    * map (reference forwards raw event keys matching "asset"). */
  def assetPassthrough(ev: PipelineEvent): Map[String, String] = {
    val b = Map.newBuilder[String, String]
    ev.assetName.foreach(v => b += "asset_name" -> v)
    ev.assetRolesList.foreach(v => b += "asset_roles" -> v.mkString(","))
    ev.assetMediaTypeScalar.foreach(v => b += "asset_media_type" -> v)
    if (ev.assetMediaTypeMap.nonEmpty)
      b += "asset_media_type_map" -> ev.assetMediaTypeMap.toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(";")
    // the MAP forms pass through too — "every event key containing
    // 'asset'" includes asset_roles: {...} and assets: {...}
    // (EventJson parses both; dropping them silently lost config)
    if (ev.assetRolesMap.nonEmpty)
      b += "asset_roles_map" -> ev.assetRolesMap.toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k=${v.mkString(",")}" }.mkString(";")
    if (ev.assets.nonEmpty)
      b += "assets" -> ev.assets.toSeq.sorted
        .map { case (k, v) => s"$k=$v" }.mkString(";")
    b.result()
  }

  /** Metadata-file asset (`inventory/handler.py:57-77`): only when the
    * metadata key is configured AND the row's cell is non-empty (the
    * reference's Python falsiness — an empty cell means no asset). */
  private def metadataAssets(ev: PipelineEvent): Column =
    (ev.metadataFileUrlKey, ev.metadataType) match {
      case (Some(k), Some(t)) =>
        when(col(k).isNotNull && col(k) =!= "", map(lit(t), col(k)))
      case _ => lit(null).cast("map<string,string>")
    }

  /** S2 CSV inventory scan (reference `inventory/handler.py:49-81`):
    * header CSV → pluck `file_url_key` (+ optional metadata column) →
    * anchored regex filter → file_obj. `product_id` is the filename stem
    * (`handler.py:72`); a metadata url becomes a 1-entry assets map
    * (`handler.py:73-75`). */
  def inventory(spark: SparkSession, ev: PipelineEvent): DataFrame = {
    val url = ev.inventoryUrl.getOrElse(
      throw new IllegalArgumentException("inventory discovery requires inventory_url"))
    val raw = spark.read.option("header", "true").csv(url)
    val filtered = regexFilter(raw, col(ev.fileUrlKey), ev.filenameRegex)
    toFileObj(filtered, ev, col(ev.fileUrlKey),
      Ids.stem(col(ev.fileUrlKey)), metadataAssets(ev))
  }

  /** S2 as an incremental stream: new inventory CSV files dropped into
    * `dir` become micro-batches of file_objs (the streaming analog of
    * the reference's pagination re-trigger loop, T5 — offsets replace
    * the `start_after` cursor). Same filter/projection as [[inventory]];
    * a header-shaped schema is required up front (streaming CSV cannot
    * infer). */
  def inventoryStream(spark: SparkSession, ev: PipelineEvent, dir: String,
                      csvSchema: org.apache.spark.sql.types.StructType,
                      maxFilesPerTrigger: Int = 10): DataFrame = {
    val raw = spark.readStream.schema(csvSchema)
      .option("header", "true")
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .csv(dir)
    val filtered = regexFilter(raw, col(ev.fileUrlKey), ev.filenameRegex)
    toFileObj(filtered, ev, col(ev.fileUrlKey),
      Ids.stem(col(ev.fileUrlKey)), metadataAssets(ev))
  }

  /** S1 listing scan (reference `s3-discovery/handler.py:32-83`):
    * partition-parallel enumeration of `bucket/prefix` via the DSv2
    * `graft-listing` source ([[graft.sources.dsv2.ListingSource]]) —
    * one input partition per first-level subtree, path-predicate
    * pushdown into the enumerator, and only (path, length,
    * modificationTime) ever materialize. No driver-side
    * `list_objects_v2` loop, no content reads — the shape that
    * survives 100 TB buckets. */
  def listing(spark: SparkSession, ev: PipelineEvent): DataFrame = {
    val bucket = ev.bucket.getOrElse(
      throw new IllegalArgumentException("s3 discovery requires bucket"))
    val root = s"$bucket/${ev.prefix}".stripSuffix("/")
    val raw = spark.read.format("graft-listing").load(root)
    // the reference matches the regex against the KEY (path inside the
    // bucket), not the full url (`s3-discovery/handler.py:65-66`)
    val key = regexp_replace(col("path"), "^file:/*|^[A-Za-z0-9+.-]+://[^/]+/", "")
    val filtered = regexFilter(raw, key, ev.filenameRegex)
    val collection =
      if (ev.collection.nonEmpty) ev.collection
      else ev.prefix.stripSuffix("/") // handler.py:23 default
    toFileObj(filtered, ev.copy(collection = collection), col("path"),
      lit(null).cast("string"),
      lit(null).cast("map<string,string>"))
  }
}
