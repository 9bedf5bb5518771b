package graft.streaming

import graft.expr.Cms
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, hex}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running per-key item-frequency estimates over an unbounded stream —
  * the streaming twin of the batch `cms_sketch` aggregate
  * ([[graft.expr.Cms]]), completing the streaming sketch family next
  * to [[StreamingDistinct]] (HLL) and [[StreamingQuantiles]] (KLL).
  *
  * Exact streaming frequencies need one counter per distinct item ever
  * seen — unbounded. A count-min sketch in keyed state bounds it at
  * depth·width·8 bytes PER KEY (80 KiB at the 5x2048 default),
  * forever; estimates never undercount and overcount by at most
  * (e/width)·N with probability 1−exp(−depth).
  *
  * Unlike the HLL register-max state, CMS state is ADDITIVE — a
  * replayed batch adds its counts again. Under at-least-once delivery
  * the estimate stays an upper bound (the CMS contract's one-sided
  * error is preserved; it just loosens), but exactly-once sinks should
  * use the streaming checkpoint as usual. This is the same trade any
  * additive streaming counter makes.
  *
  * Scale shape: (key, item) is projected before the keyed shuffle;
  * per-batch work is depth hashes + adds per row; emission is one row
  * per (key, distinct item in the batch) per trigger (Update mode),
  * never a dump of the sketch domain.
  */
object StreamingFrequency {

  case class Estimate(key: String, item: String, freq_est: Long)

  /** Public: the state encoder's generated code must reach it. */
  case class CmsState(cells: Array[Long])

  /** Per-trigger (key, item, running frequency estimate) for items
    * touched in the batch. Works on streaming and batch Datasets;
    * batch = one pass, and because items are hashed through their
    * string form the estimates equal
    * `cms_estimate(cms_sketch(cast(item as string)), item)` exactly
    * (asserted in spec). Null items are ignored; null keys group
    * under "". `stateTtl` bounds idle-key state. */
  def frequencyPerKey(ds: DataFrame, keyCol: String, itemCol: String,
                      depth: Int = Cms.DefaultDepth,
                      width: Int = Cms.DefaultWidth,
                      stateTtl: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.functions.col
    // binary columns hex-encode (lossy UTF-8 cast would merge
    // unrelated keys/items); else string-cast
    def s(c: String) = ds.schema(c).dataType match {
      case org.apache.spark.sql.types.BinaryType => hex(col(c))
      case _ => col(c).cast("string")
    }
    val projected = ds.select(s(keyCol).as("key"), s(itemCol).as("item"))
    val keyed = projected.groupByKey { r: Row =>
      if (r.isNullAt(0)) "" else r.getString(0)
    }(Encoders.STRING)

    val fn = (key: String, rows: Iterator[Row],
              state: GroupState[CmsState]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty: Iterator[Estimate]
      } else {
        val cells = state.getOption.map(_.cells)
          .getOrElse(Cms.empty(depth, width))
        // insertion-ordered so emission order is deterministic
        val touched = scala.collection.mutable.LinkedHashSet.empty[String]
        rows.foreach { r =>
          if (!r.isNullAt(1)) {
            val item = r.getString(1)
            Cms.add(cells,
              org.apache.spark.unsafe.types.UTF8String.fromString(item))
            touched += item
          }
        }
        if (touched.nonEmpty) {
          state.update(CmsState(cells))
          stateTtl.foreach(state.setTimeoutDuration)
          touched.iterator.map { item =>
            Estimate(key, item, Cms.estimate(cells,
              org.apache.spark.unsafe.types.UTF8String.fromString(item)))
          }
        } else {
          // re-arm: GroupState clears the timeout every invocation —
          // an all-null batch must not permanently disarm a live
          // key's TTL
          if (state.exists) stateTtl.foreach(state.setTimeoutDuration)
          Iterator.empty
        }
      }
    }
    keyed.flatMapGroupsWithState(OutputMode.Update,
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout)(fn)(
      Encoders.product[CmsState], Encoders.product[Estimate])
      .toDF("key", "item", "freq_est")
  }
}
