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

  /** Join two bucketed tables on an equi-condition over their bucket
    * keys. When both were written with [[writeBucketed]] and the same
    * bucket count, the plan contains NO Exchange on either side. */
  def colocatedJoin(spark: SparkSession, leftTable: String,
                    rightTable: String,
                    condition: org.apache.spark.sql.Column): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), condition)
}
