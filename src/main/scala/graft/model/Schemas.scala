package graft.model

import org.apache.spark.sql.types._

/** Core data model (SURVEY §1): the `file_obj` record and STAC item,
  * as fixed StructTypes with an `extra` map escape hatch preserving the
  * reference's open-world `{**event}` passthrough semantics inside a
  * closed Spark schema. */
object Schemas {

  /** STAC asset (reference `stac.py` `pystac.Asset`). */
  val asset: StructType = StructType(Seq(
    StructField("href", StringType),
    StructField("media_type", StringType),
    StructField("roles", ArrayType(StringType))))

  /** STAC link (subset used by the reference: rel/href/type/title). */
  val link: StructType = StructType(Seq(
    StructField("rel", StringType),
    StructField("href", StringType),
    StructField("type", StringType),
    StructField("title", StringType)))

  /** One discovered file + processing flags (reference
    * `s3-discovery/handler.py:67-78`, `inventory/handler.py:66-81`,
    * `cmr-query/handler.py:164-177`). */
  val fileObj: StructType = StructType(Seq(
    StructField("collection", StringType),
    StructField("remote_fileurl", StringType),
    StructField("upload", BooleanType),
    StructField("user_shared", BooleanType),
    StructField("ingest", BooleanType),
    StructField("cogify", BooleanType),
    StructField("properties", MapType(StringType, StringType)),
    StructField("product_id", StringType),
    StructField("granule_id", StringType),
    StructField("assets", MapType(StringType, StringType)),
    StructField("attempt", IntegerType),
    StructField("extra", MapType(StringType, StringType))))

  /** GeoJSON Polygon geometry struct (reference `stac.py:187-206`). */
  val geometry: StructType = StructType(Seq(
    StructField("coordinates", ArrayType(ArrayType(ArrayType(DoubleType)))),
    StructField("type", StringType)))

  /** STAC item (reference `stac.py:19-51`). */
  val stacItem: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("collection", StringType),
    StructField("datetime", TimestampType),
    StructField("start_datetime", TimestampType),
    StructField("end_datetime", TimestampType),
    StructField("geometry", geometry),
    StructField("bbox", ArrayType(DoubleType)),
    StructField("properties", MapType(StringType, StringType)),
    StructField("assets", MapType(StringType, asset)),
    StructField("links", ArrayType(link))))

  /** CMR granule record shape (fixture form of
    * `cmr-query/handler.py:141` / `build-stac/tests/conftest.py:78-114`). */
  val cmrGranule: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("title", StringType),
    StructField("dataset_id", StringType),
    StructField("data_center", StringType),
    StructField("time_start", StringType),
    StructField("time_end", StringType),
    StructField("updated", StringType),
    StructField("coordinate_system", StringType),
    StructField("day_night_flag", StringType),
    StructField("original_format", StringType),
    StructField("collection_concept_id", StringType),
    StructField("browse_flag", BooleanType),
    StructField("online_access_flag", BooleanType),
    StructField("boxes", ArrayType(StringType)),
    StructField("polygons", ArrayType(ArrayType(StringType))),
    StructField("links", ArrayType(StructType(Seq(
      StructField("rel", StringType),
      StructField("href", StringType),
      StructField("type", StringType),
      StructField("title", StringType),
      StructField("hreflang", StringType),
      StructField("inherited", BooleanType)))))))
}

/** Pipeline event config — the union of the ~20 keys used across all 28
  * `data/step_function_inputs` JSON configs (SURVEY §1.3). One event
  * drives one discovery+publication run; constants become `lit()`s that
  * Catalyst constant-folds. */
case class PipelineEvent(
    collection: String,
    discovery: String = "inventory",          // s3 | inventory | cmr
    // s3 discovery (S1)
    bucket: Option[String] = None,
    prefix: String = "",
    // inventory discovery (S2)
    inventoryUrl: Option[String] = None,
    fileUrlKey: String = "s3_path",
    metadataFileUrlKey: Option[String] = None,
    metadataType: Option[String] = None,
    // cmr discovery (S3)
    version: Option[String] = None,
    temporal: Seq[String] = Seq("1000-01-01T00:00:00Z", "3000-01-01T23:59:59Z"),
    mode: Option[String] = None,
    linkRel: Option[String] = None,
    limit: Int = 100,                         // CMR page size (W4)
    dataFile: Option[String] = None,
    dataFileRegex: Option[String] = None,
    // shared
    filenameRegex: Option[String] = None,
    upload: Boolean = false,
    userShared: Boolean = false,
    ingest: Boolean = true,
    cogify: Boolean = false,
    properties: Map[String, String] = Map.empty,
    // stac build
    idRegex: Option[String] = None,
    assetName: Option[String] = None,
    assetRolesList: Option[Seq[String]] = None,
    assetRolesMap: Map[String, Seq[String]] = Map.empty,
    assetMediaTypeScalar: Option[String] = None,
    assetMediaTypeMap: Map[String, String] = Map.empty,
    assets: Map[String, String] = Map.empty,
    datetimeRange: Option[String] = None,     // month | year
    startDatetime: Option[java.sql.Timestamp] = None,
    endDatetime: Option[java.sql.Timestamp] = None,
    singleDatetime: Option[java.sql.Timestamp] = None,
    reverseCoords: Boolean = false,
    // transfer
    directory: Option[String] = None)
