package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series resampling: bucket an irregular per-key event series to
  * a fixed step, then densify the gaps and forward-fill the last
  * observed value — the feature-engineering primitive behind "state of
  * every entity at every tick" tables.
  *
  * Scale shape: one aggregation keyed on (key, bucket) reduces raw
  * events map-side; the dense grid comes from a per-key
  * `sequence()+explode` (bounded by span/step, a row-local generate —
  * no shuffle, no driver-side calendar); grid and observations join on
  * the same (key, bucket) key; the forward-fill window partitions by
  * key only — Catalyst inserts the single key-hash exchange and the
  * window sorts within partitions. Total: two keyed shuffles
  * (observation agg, key-window) regardless of span or event count.
  * A key whose span/step explodes to millions of ticks concentrates in
  * one task — callers at that shape should split the span into coarse
  * epochs first (the grid is per-key data, so epoch splitting is a
  * filter, not a redesign).
  */
object Resample {

  /** Per-key fixed-step series with forward fill.
    *
    * @param df       events with `keyCol`, `tsCol` (timestamp), `valCol`
    * @param stepSec  bucket width in seconds
    * @param tieCol   deterministic within-bucket tie-break: the bucket's
    *                 value is the `valCol` of the max (tsCol, tieCol) row
    * @return (key, bucket TIMESTAMP, value, observed BOOLEAN) — one row
    *         per key per step from the key's first to last bucket;
    *         `value` forward-filled, `observed` false on filled ticks
    */
  def ffill(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String,
      stepSec: Long,
      tieCol: String): DataFrame = {
    require(stepSec > 0, s"stepSec must be positive, got $stepSec")
    val step = lit(stepSec)
    val bucket = (floor(unix_timestamp(col(tsCol)) / step) * step).as("_b")

    val obs = df
      .select(col(keyCol), bucket, col(tsCol), col(tieCol), col(valCol))
      .groupBy(col(keyCol), col("_b"))
      .agg(max_by(col(valCol), struct(col(tsCol), col(tieCol))).as("_v"))

    // Dense grid: per-key span only (sequence is a row-local generate).
    val grid = obs
      .groupBy(col(keyCol))
      .agg(min(col("_b")).as("_lo"), max(col("_b")).as("_hi"))
      .select(col(keyCol),
        explode(sequence(col("_lo"), col("_hi"), step)).as("_b"))

    val w = Window.partitionBy(keyCol).orderBy("_b")
    grid
      .join(obs, Seq(keyCol, "_b"), "left")
      .select(
        col(keyCol),
        timestamp_seconds(col("_b")).as("bucket"),
        last(col("_v"), ignoreNulls = true).over(w).as("value"),
        col("_v").isNotNull.as("observed"))
  }
}
