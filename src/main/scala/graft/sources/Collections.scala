package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** J2 — the STAC collection dimension (reference `data/collections/`:
  * 31 JSON docs sharing keys id/stac_version/license/title/type/
  * description/extent/links/item_assets).
  *
  * Collections are a tiny dimension table; items join to them with a
  * broadcast hash join — and the catalog table is partitioned by
  * collection, so per-collection reads prune before the join at scale. */
object Collections {

  /** Collection document schema (the shared key census, SURVEY §1.1). */
  val schema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("stac_version", StringType),
    StructField("type", StringType),
    StructField("title", StringType),
    StructField("description", StringType),
    StructField("license", StringType),
    StructField("extent", StructType(Seq(
      StructField("spatial", StructType(Seq(
        StructField("bbox", ArrayType(ArrayType(DoubleType)))))),
      StructField("temporal", StructType(Seq(
        StructField("interval", ArrayType(ArrayType(StringType))))))))),
    StructField("item_assets", MapType(StringType, StructType(Seq(
      StructField("title", StringType),
      StructField("type", StringType),
      StructField("roles", ArrayType(StringType))))))))

  /** Load collection docs (one JSON object per file, multiLine). */
  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(schema).option("multiLine", "true").json(path)

  /** Validation split (`scripts/collection.py` posts per doc; invalid
    * docs error there — here they surface as a flag for the DLQ). */
  def withValidity(collections: DataFrame): DataFrame =
    collections.withColumn("valid",
      col("id").isNotNull && col("extent").isNotNull)

  /** J2: enrich items with their collection doc via broadcast join.
    * Duplicate collection ids (a re-dropped doc beside its stale
    * copy) collapse DETERMINISTICALLY to one row — a raw join would
    * silently multiply every item of that collection; min(struct)
    * picks a stable winner rather than dropDuplicates' arbitrary
    * one. */
  def joinItems(items: DataFrame, collections: DataFrame): DataFrame = {
    val base = collections.select(
      col("id").as("collection"),
      col("title").as("collection_title"),
      col("license"),
      col("extent.spatial.bbox").as("collection_bbox"),
      col("item_assets"))
    // item_assets is a MAP (Catalyst-unorderable), so the stable
    // winner orders by the row's JSON rendering; the window runs over
    // the KB-scale dimension, never the items
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("collection"))
      .orderBy(to_json(struct(col("collection_title"), col("license"),
        col("collection_bbox"), col("item_assets"))))
    val dim = broadcast(base
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1).drop("_rn"))
    items.join(dim, Seq("collection"), "left")
  }
}
