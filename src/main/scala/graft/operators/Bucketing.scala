package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (pre-partitioned, pre-sorted) tables for co-located joins —
  * the 100 TB answer to repeated large-x-large equi-joins: both sides
  * are written bucketed+sorted on the join key with the same bucket
  * count, so every subsequent join is a zero-shuffle (and zero-sort)
  * sort-merge of matching buckets. One write-time shuffle is amortized
  * over every downstream join/aggregation on that key.
  *
  * (SURVEY §4: the reference has no join infrastructure at all — this
  * is engine-side capability the Spark port adds for free via the
  * catalog.) */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted table at `path`.
    * Bucket count must match across tables that will be joined. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    numBuckets: Int, keys: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)

  /** [[writeBucketed]], skipped when this session already wrote the
    * same table from the same source: the point of bucketing is paying
    * the layout shuffle ONCE and amortizing it over every downstream
    * join, so re-preparing an unchanged table is wasted work (and in a
    * benchmark, mismeasures the operator). `fingerprint` identifies
    * the source data (e.g. its immutable directory); any change to it,
    * the bucket count, or the keys forces a rewrite. The table must
    * also still be registered in this session's catalog — bucket specs
    * live in the catalog entry, so a fresh session re-registers by
    * rewriting. */
  def ensureBucketed(df: DataFrame, table: String, path: String,
                     numBuckets: Int, keys: Seq[String],
                     fingerprint: String): Unit = {
    val spark = df.sparkSession
    val spec = s"$fingerprint|$numBuckets|${keys.mkString(",")}"
    val marker = new org.apache.hadoop.fs.Path(path, "_graft_bucket_spec")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // the catalog entry must also point at THIS path — the same table
    // name registered for a different source dir (another SF) would
    // otherwise serve that dir's data with the skip taken
    def tableAtPath: Boolean = try {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      fs.makeQualified(new org.apache.hadoop.fs.Path(meta.location)) ==
        fs.makeQualified(new org.apache.hadoop.fs.Path(path))
    } catch { case _: Exception => false }
    val unchanged = spark.catalog.tableExists(table) && tableAtPath &&
      fs.exists(marker) && {
      val in = fs.open(marker)
      try {
        val b = new Array[Byte](math.min(fs.getFileStatus(marker).getLen, 4096L).toInt)
        in.readFully(b)
        new String(b, java.nio.charset.StandardCharsets.UTF_8) == spec
      } finally in.close()
    }
    if (!unchanged) {
      writeBucketed(df, table, path, numBuckets, keys)
      val out = fs.create(marker, true)
      try out.write(spec.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
  }

  /** Join two bucketed tables on an equi-condition over their bucket
    * keys. When both were written with [[writeBucketed]] and the same
    * bucket count, the plan contains NO Exchange on either side. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String,
                    condition: org.apache.spark.sql.Column): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), condition)
}
