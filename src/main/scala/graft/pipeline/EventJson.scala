package graft.pipeline

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.model.PipelineEvent
import scala.jdk.CollectionConverters._

/** Parser for the reference's pipeline-event JSON configs
  * (`data/step_function_inputs/` — 28 real-world files, key census in
  * SURVEY §1.3), including the union-typed fields:
  * `asset_roles: List[str] | Map[str, List[str]]` and
  * `asset_media_type: str | Map[str, str]` (`events.py:19-20`) are
  * normalized into the separate scalar/map slots of [[PipelineEvent]]. */
object EventJson {

  private val mapper = new ObjectMapper()

  def parse(json: String): PipelineEvent = fromNode(mapper.readTree(json))

  /** A file may hold one event object or an array; scalars wrap to a
    * list like `scripts/item.py:13-15`. */
  def parseAll(json: String): Seq[PipelineEvent] = {
    val n = mapper.readTree(json)
    if (n.isArray) n.elements().asScala.toSeq.map(fromNode)
    else Seq(fromNode(n))
  }

  private def optStr(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filter(v => !v.isNull).map(_.asText())

  private def optBool(n: JsonNode, k: String, default: Boolean): Boolean =
    Option(n.get(k)).filter(v => !v.isNull).map(_.asBoolean())
      .getOrElse(default)

  private def strMap(n: JsonNode): Map[String, String] =
    n.properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap

  private def fromNode(n: JsonNode): PipelineEvent = {
    val rolesNode = Option(n.get("asset_roles")).filter(!_.isNull)
    val (rolesList, rolesMap) = rolesNode match {
      case Some(r) if r.isArray =>
        (Some(r.elements().asScala.map(_.asText()).toSeq),
          Map.empty[String, Seq[String]])
      case Some(r) if r.isObject =>
        (None, r.properties().asScala.map(e =>
          e.getKey -> e.getValue.elements().asScala.map(_.asText()).toSeq)
          .toMap)
      case _ => (None, Map.empty[String, Seq[String]])
    }
    val mediaNode = Option(n.get("asset_media_type")).filter(!_.isNull)
    val (mediaScalar, mediaMap) = mediaNode match {
      case Some(m) if m.isTextual => (Some(m.asText()), Map.empty[String, String])
      case Some(m) if m.isObject => (None, strMap(m))
      case _ => (None, Map.empty[String, String])
    }
    val temporal = Option(n.get("temporal")).filter(_.isArray)
      .map(_.elements().asScala.map(_.asText()).toSeq)
      .getOrElse(Seq("1000-01-01T00:00:00Z", "3000-01-01T23:59:59Z"))
    PipelineEvent(
      collection = optStr(n, "collection").getOrElse(""),
      discovery = optStr(n, "discovery").getOrElse("inventory"),
      bucket = optStr(n, "bucket"),
      prefix = optStr(n, "prefix").getOrElse(""),
      inventoryUrl = optStr(n, "inventory_url"),
      fileUrlKey = optStr(n, "file_url_key").getOrElse("s3_path"),
      metadataFileUrlKey = optStr(n, "metadata_file_url_key"),
      metadataType = optStr(n, "metadata_type"),
      version = optStr(n, "version"),
      temporal = temporal,
      mode = optStr(n, "mode"),
      linkRel = optStr(n, "link_rel"),
      limit = Option(n.get("limit")).filter(v => !v.isNull)
        .map(_.asInt()).getOrElse(100),
      dataFile = optStr(n, "data_file"),
      dataFileRegex = optStr(n, "data_file_regex"),
      filenameRegex = optStr(n, "filename_regex"),
      upload = optBool(n, "upload", default = false),
      userShared = optBool(n, "user_shared", default = false),
      ingest = optBool(n, "ingest", default = true),
      cogify = optBool(n, "cogify", default = false),
      properties = Option(n.get("properties")).filter(_.isObject)
        .map(strMap).getOrElse(Map.empty),
      idRegex = optStr(n, "id_regex"),
      assetName = optStr(n, "asset_name"),
      assetRolesList = rolesList,
      assetRolesMap = rolesMap,
      assetMediaTypeScalar = mediaScalar,
      assetMediaTypeMap = mediaMap,
      assets = Option(n.get("assets")).filter(_.isObject)
        .map(strMap).getOrElse(Map.empty),
      datetimeRange = optStr(n, "datetime_range"),
      startDatetime = optStr(n, "start_datetime").map(parseTs),
      endDatetime = optStr(n, "end_datetime").map(parseTs),
      singleDatetime = optStr(n, "single_datetime").map(parseTs),
      reverseCoords = optBool(n, "reverse_coords", default = false),
      directory = optStr(n, "directory"))
  }

  private def parseTs(s: String): java.sql.Timestamp =
    java.sql.Timestamp.from(java.time.Instant.parse(
      if (s.endsWith("Z") || s.contains("+")) s else s + "Z"))
}
