package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4 / §7.4.4: J1 product groups
  * are skewed — one UAVSAR product ⇒ dozens of sibling files; at
  * 100 TB a hot collection key can dominate a shuffle partition).
  *
  * AQE's skew-join handling covers joins; these two-phase (salted)
  * aggregations cover the groupBy side: a salted partial aggregate
  * spreads one hot key over `salts` reducers, then a cheap final
  * aggregate over (key) merges the partials. Algebraic aggregates
  * only — the salt decomposition needs merge-ability. */
object Skew {

  private def salt(salts: Int): Column =
    pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts))

  /** Salted count per key — result identical to
    * `df.groupBy(key).count()`, shuffle spread over `salts` x keys. */
  def saltedCount(df: DataFrame, key: Column, salts: Int = 32): DataFrame =
    df.groupBy(key.as("key"), salt(salts).as("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col("key"))
      .agg(sum("__partial").as("count"))

  /** Salted sum of a column per key. */
  def saltedSum(df: DataFrame, key: Column, value: Column,
                salts: Int = 32): DataFrame =
    df.groupBy(key.as("key"), salt(salts).as("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("key"))
      .agg(sum("__partial").as("sum"))

  /** Salted distinct-collect per key (sorted) — the A1/A4 shape for a
    * hot collection: partial collect_set per salt, final flatten +
    * dedup + sort. */
  def saltedCollectSet(df: DataFrame, key: Column, value: Column,
                       salts: Int = 32): DataFrame =
    df.groupBy(key.as("key"), salt(salts).as("__salt"))
      .agg(collect_set(value).as("__partial"))
      .groupBy(col("key"))
      .agg(sort_array(array_distinct(flatten(collect_list("__partial"))))
        .as("values"))
}
