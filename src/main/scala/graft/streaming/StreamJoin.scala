package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: pair events from two
  * unbounded streams on an equality key when their event times fall
  * within a bounded window of each other — "click within 10 minutes
  * after the impression". This is the ONE place the engine reaches
  * for Spark's native stream-stream join rather than keyed state:
  * both sides genuinely need buffering over a time range, and the
  * built-in join derives exact state-eviction bounds from the
  * watermark + time-range conjuncts (the Structured Streaming paper's
  * headline trick) — re-deriving that in `flatMapGroupsWithState`
  * would re-implement the hard part for no gain. Contrast
  * [[StreamingAsOf]] (latest-value enrichment, O(keys) state — use it
  * when only the most recent reference row matters) and
  * [[StreamingUpsert]].
  *
  * State bound: left buffers `maxDelay` + watermark of event time;
  * right likewise — O(rate × window), evicted by watermark, never
  * unbounded.
  */
object StreamJoin {

  /** Inner-join `left` rows to `right` rows with equal `keyCol` whose
    * `rightTime` lies in [leftTime, leftTime + maxDelay].
    *
    * @param watermarkDelay lateness tolerance for BOTH streams (e.g.
    *                       "10 minutes") — bounds state eviction
    * @param maxDelay       right-after-left window (e.g. "10 minutes")
    * @return joined stream; right's key/time columns arrive as
    *         `keyCol_r`/`rightTime` (key disambiguated, time kept)
    */
  def within(left: DataFrame, right: DataFrame, keyCol: String,
             leftTime: String, rightTime: String,
             watermarkDelay: String, maxDelay: String): DataFrame = {
    // the join condition references leftTime/rightTime by bare name
    // across both sides — equal names would resolve ambiguously; and
    // the key rename must not collide with an existing right column
    require(leftTime != rightTime,
      s"leftTime and rightTime must differ (both '$leftTime'); " +
        "rename one side's event-time column before joining")
    require(!right.columns.contains(s"${keyCol}_r"),
      s"right already has a column named '${keyCol}_r' — the key " +
        "disambiguation rename would collide; rename it first")
    require(!right.columns.contains(leftTime) &&
        !left.columns.contains(rightTime),
      "event-time column names must be unique to their own side")
    val l = left.withWatermark(leftTime, watermarkDelay)
    val r = right.withWatermark(rightTime, watermarkDelay)
      .withColumnRenamed(keyCol, s"${keyCol}_r")
    l.join(r,
      col(keyCol) === col(s"${keyCol}_r") &&
        col(rightTime) >= col(leftTime) &&
        col(rightTime) <= col(leftTime) + expr(s"INTERVAL $maxDelay"))
  }
}
