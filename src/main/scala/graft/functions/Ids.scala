package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Identifier / URL / string functions (F2, F3, F4, F10).
  * All pure built-in column expressions — codegen friendly, no UDFs. */
object Ids {

  /** Python `Path(url).stem`: final path component minus its last
    * extension (reference `events.py:35`, `inventory/handler.py:72`).
    * A leading-dot-only name (".bashrc") keeps its "extension", matching
    * `pathlib`. */
  def stem(url: Column): Column = {
    val filename = element_at(split(url, "/"), -1)
    regexp_replace(filename, "(?<=.)\\.[^.]*$", "")
  }

  /** F3 `Path(url).suffix` — WITH the leading dot ("" when none). */
  def suffix(url: Column): Column = {
    val filename = element_at(split(url, "/"), -1)
    regexp_extract(filename, "(?<=.)(\\.[^.]*)$", 1)
  }

  /** F3 extension without the dot ("" when none). */
  def ext(url: Column): Column = {
    val filename = element_at(split(url, "/"), -1)
    regexp_extract(filename, "(?<=.)\\.([^.]*)$", 1)
  }

  /** F2 `item_id` — priority: id_regex (must match exactly once; capture
    * groups joined with "-") > product_id > filename stem (reference
    * `events.py:26-35`). The exactly-once assertion surfaces as NULL
    * (reference raises `AssertionError`). The regex is a plan-time
    * constant, so its group count is resolved here, not per row. */
  def itemId(url: Column, idRegex: Option[String], productId: Column): Column =
    idRegex match {
      case Some(re) =>
        val groups = java.util.regex.Pattern.compile(re).matcher("").groupCount()
        val matches = regexp_extract_all(url, lit(re), lit(0))
        val joined =
          if (groups == 0) regexp_extract(url, re, 0)
          else concat_ws("-", (1 to groups).map(i => regexp_extract(url, re, i)): _*)
        when(size(matches) === 1, joined)
      case None => coalesce(productId, stem(url))
    }

  /** F10 `filter_sfname` (reference `discovery-trigger/handler.py:8-14`). */
  def sanitizeName(name: Column): Column =
    regexp_replace(name, "[^a-zA-Z0-9_-]", "")

  /** F4: bucket/host part of an `s3://` / `https://` URL
    * (reference `data-transfer/handler.py:41-44`). */
  def urlHost(url: Column): Column =
    regexp_extract(url, "^[A-Za-z0-9+.-]+://([^/]+)", 1)

  /** F4: key/path part, no leading slash (reference strips it). */
  def urlKey(url: Column): Column =
    regexp_extract(url, "^[A-Za-z0-9+.-]+://[^/]+/(.*)$", 1)

  /** Final path component. */
  def fileName(url: Column): Column = element_at(split(url, "/"), -1)

  /** P7 extension-dispatch: look up media-type/roles config by `.ext`
    * then bare `ext`, falling back to a scalar default — mirroring the
    * reference's double `dict.get` (`stac.py:209-224`). */
  def extDispatch(url: Column, mapping: Map[String, String],
                  default: Option[String]): Column =
    if (mapping.isEmpty) default.map(lit).getOrElse(lit(null: String))
    else {
      val m = typedlit(mapping)
      coalesce(
        element_at(m, concat(lit("."), ext(url))) ::
        element_at(m, ext(url)) ::
        default.map(lit).toList: _*)
    }
}
