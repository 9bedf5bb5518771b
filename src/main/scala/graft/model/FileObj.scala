package graft.model

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed view of the file_obj record (SURVEY §1.1) for callers who
  * want `Dataset[FileObj]` ergonomics — compile-time field access and
  * pattern matching — while the operator pipeline itself stays in
  * DataFrame form (dynamic schema, open-world `extra` map).
  *
  * The case class mirrors [[Schemas.fileObj]] exactly, so
  * `toDataset`/`toDF` round-trip losslessly. */
case class FileObj(
    collection: String,
    remote_fileurl: String,
    upload: Option[Boolean] = None,
    user_shared: Option[Boolean] = None,
    ingest: Option[Boolean] = None,
    cogify: Option[Boolean] = None,
    properties: Option[Map[String, String]] = None,
    product_id: Option[String] = None,
    granule_id: Option[String] = None,
    assets: Option[Map[String, String]] = None,
    attempt: Option[Int] = Some(0),
    extra: Option[Map[String, String]] = None)

object FileObj {
  /** DataFrame (fileObj schema) → typed Dataset. */
  def toDataset(df: DataFrame): Dataset[FileObj] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.as[FileObj]
  }

  /** Typed rows → DataFrame in the canonical fileObj schema. */
  def toDF(objs: Seq[FileObj],
           spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    objs.toDF()
  }
}
