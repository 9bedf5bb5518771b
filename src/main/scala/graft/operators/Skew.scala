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

  /** Salted equi-join for a hot probe key that AQE cannot fix (AQE
    * splits skewed SHUFFLE partitions, but a broadcast-ineligible build
    * side or a sort-merge on one mega-key still funnels every probe row
    * of that key through the tasks holding it). The probe side gets a
    * deterministic per-row salt (hash of the whole row — no RNG, stable
    * across retries); the build side replicates `salts`× (a bounded
    * row-local explode — keep the build side the small one); the join
    * runs on (key, salt), spreading each hot key over `salts` reducers.
    * Result == `probe.join(build, keys)` exactly (inner), with build
    * columns resolved by name.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 salts: Int = 32): DataFrame = {
    require(keys.nonEmpty, "saltedJoin needs at least one key column")
    require(salts > 0, s"salts must be positive, got $salts")
    // the salt column is joined BY NAME — a pre-existing __salt would
    // silently produce a wrong (or ambiguous) join, not an error
    require(!probe.columns.contains("__salt") &&
        !build.columns.contains("__salt"),
      "saltedJoin reserves column name __salt; rename it in the inputs")
    val p = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.map(col).toSeq: _*), lit(salts)).cast("int"))
    val b = build.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    p.join(b, keys :+ "__salt").drop("__salt")
  }
}
