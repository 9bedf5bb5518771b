package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot diff — the dataset-versioning primitive: classify every
  * key across two corpus versions as `added` / `removed` / `changed` /
  * `same`. The audit step before publishing a new training-data
  * snapshot (what changed since the last run?) and the input to
  * incremental downstream recomputation (process `added`+`changed`
  * only).
  *
  * Shape: one full outer join on the key — one keyed shuffle per side,
  * and exchange-free when both snapshots are bucketed on the key
  * ([[graft.operators.Bucketing]]). Value comparison is null-safe
  * column equality (`<=>`), evaluated inside codegen — no row hashing,
  * so an ANSI-SQL oracle (`IS NOT DISTINCT FROM`) replays it exactly.
  */
object Diff {

  /** One row per key present in either snapshot, with `status` and the
    * key columns. `compareCols` define "changed"; columns outside both
    * lists are ignored. */
  def snapshotDiff(oldDf: DataFrame, newDf: DataFrame,
                   keyCols: Seq[String], compareCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "snapshotDiff needs at least one key column")
    val o = oldDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__old", lit(1))
    val n = newDf.select((keyCols ++ compareCols).map(col): _*)
      .withColumn("__new", lit(1))
    val renamedN = compareCols.foldLeft(n)((df, c) =>
      df.withColumnRenamed(c, s"__n_$c"))
    val joined = o.join(renamedN, keyCols, "full_outer")
    val valuesEqual: Column = compareCols
      .map(c => col(c) <=> col(s"__n_$c"))
      .reduceOption(_ && _).getOrElse(lit(true))
    joined.select(keyCols.map(col) :+
      when(col("__old").isNull, "added")
        .when(col("__new").isNull, "removed")
        .when(valuesEqual, "same")
        .otherwise("changed").as("status"): _*)
  }

  /** [[snapshotDiff]] reduced to per-status counts (the one-line audit
    * summary). */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame,
                  keyCols: Seq[String], compareCols: Seq[String]): DataFrame =
    snapshotDiff(oldDf, newDf, keyCols, compareCols)
      .groupBy("status").agg(count(lit(1)).cast("bigint").as("n"))
}
