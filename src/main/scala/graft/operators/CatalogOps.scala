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
    * partitions that contain them.
    *
    * The surviving rows of every affected collection are STAGED to a
    * temp directory first (never a read-then-overwrite of the same
    * path), then each affected partition directory is explicitly
    * deleted and replaced by its staged rewrite — a collection whose
    * items are ALL deleted simply gets no replacement, so its old
    * files go away too (dynamic partition overwrite would have left
    * them: it only rewrites partitions present in the written data). */
  def delete(spark: SparkSession, catalogPath: String,
             ids: Seq[String]): Long = {
    import org.apache.hadoop.fs.Path
    val catalog = read(spark, catalogPath)
    // affected partition dirs = parents of the files holding target ids
    // (names come from the filesystem, so partition-value escaping is
    // whatever Spark wrote — no re-encoding on our side).
    val affectedDirs = catalog.filter(col("id").isin(ids: _*))
      .select(input_file_name()).distinct()
      .collect().map(r => new Path(r.getString(0)).getParent)
      .distinct
    if (affectedDirs.isEmpty) return 0L
    val affected = catalog.filter(col("id").isin(ids: _*))
      .select("collection").distinct()
      .collect().map(_.getString(0)).toIndexedSeq
    val inAffected = catalog.filter(col("collection").isin(affected: _*))
    val before = inAffected.count()
    val remaining = inAffected.filter(!col("id").isin(ids: _*))
    val after = remaining.count()
    val catPath = new Path(catalogPath)
    val fs = catPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(catPath.getParent,
      s".${catPath.getName}_delete_staging_${java.util.UUID.randomUUID()}")
    try {
      // stage BEFORE touching the files the plan reads from
      remaining.write.mode(SaveMode.Overwrite)
        .partitionBy("collection").parquet(tmp.toString)
      affectedDirs.foreach(dir => fs.delete(dir, true))
      fs.listStatus(tmp).filter(_.getPath.getName.startsWith("collection="))
        .foreach { st =>
          fs.rename(st.getPath, new Path(catPath, st.getPath.getName))
        }
    } finally fs.delete(tmp, true)
    before - after
  }
}
