package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog management — the engine's analog of the reference's
  * ingestion-API scripts (`scripts/ingest.py`: list/get/delete
  * ingestions; `scripts/item.py` insert). The catalog here is a
  * collection-partitioned parquet table, so management operations are
  * queries/writes, not REST calls.
  *
  * Deletion rewrites ONLY the partitions that contain the targeted
  * ids (dynamic partition overwrite) — at 100 TB a delete touches the
  * affected collections, never the whole catalog. */
object CatalogOps {

  def read(spark: SparkSession, catalogPath: String): DataFrame =
    spark.read.parquet(catalogPath)

  /** `ingest list` analog: per-collection item counts + time range. */
  def summary(spark: SparkSession, catalogPath: String): DataFrame =
    read(spark, catalogPath).groupBy("collection")
      .agg(count(lit(1)).as("n_items"),
        min(coalesce(col("datetime"), col("start_datetime"))).as("earliest"),
        max(coalesce(col("datetime"), col("end_datetime"))).as("latest"))
      .orderBy("collection")

  /** `ingest get` analog: fetch items by id (partition-pruned when the
    * caller also knows the collection). */
  def get(spark: SparkSession, catalogPath: String,
          ids: Seq[String]): DataFrame =
    read(spark, catalogPath).filter(col("id").isin(ids: _*))

  /** `ingest delete` analog: remove items by id, rewriting only the
    * partitions that contain them. */
  def delete(spark: SparkSession, catalogPath: String,
             ids: Seq[String]): Long = {
    val catalog = read(spark, catalogPath)
    val affected = catalog.filter(col("id").isin(ids: _*))
      .select("collection").distinct()
      .collect().map(_.getString(0))
    if (affected.isEmpty) return 0L
    val before = catalog
      .filter(col("collection").isin(affected.toIndexedSeq: _*)).count()
    val remaining = catalog
      .filter(col("collection").isin(affected.toIndexedSeq: _*))
      .filter(!col("id").isin(ids: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // materialize BEFORE overwriting the files the plan reads from
    val after = remaining.count()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try remaining.write.mode(SaveMode.Overwrite)
      .partitionBy("collection").parquet(catalogPath)
    finally {
      remaining.unpersist()
      prev match {
        case Some(v) =>
          spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
        case None =>
          spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
      }
    }
    before - after
  }
}
