package graft.streaming

import graft.expr.Hll
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, hex}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running distinct-count per key over an unbounded stream.
  *
  * Exact streaming distinct needs state proportional to the number of
  * distinct values ever seen — unbounded. Keeping the [[graft.expr.Hll]]
  * register array in keyed state bounds it at 2^p bytes PER KEY
  * (4 KiB at the default p=12, ±1.6%), forever, regardless of stream
  * size — the streaming twin of the batch `hll_sketch` aggregate, with
  * the identical register math (update == register max, so replays and
  * reordered batches cannot corrupt the estimate: the state is a
  * join-semilattice, convergent under at-least-once delivery).
  *
  * Scale shape: (key, value) is projected before the keyed shuffle;
  * per-batch work is one xxhash64 + register max per row; emission is
  * one row per touched key per trigger (Update mode).
  */
object StreamingDistinct {

  case class Estimate(key: String, distinct_est: Long)

  /** Public: the state encoder's generated code must reach it. */
  case class SketchState(registers: Array[Byte])

  /** Per-trigger (key, running distinct estimate) for keys touched in
    * the batch. Works on streaming and batch Datasets; batch = one
    * pass, and because values are hashed through their string form the
    * final estimates equal `hll_estimate(hll_sketch(cast(value as
    * string)))` exactly (asserted in spec).
    * Null values are ignored; null keys group under "" like any
    * string-keyed state op. `stateTtl` bounds idle-key state. */
  def distinctPerKey(ds: DataFrame, keyCol: String, valueCol: String,
                     p: Int = Hll.DefaultP,
                     stateTtl: Option[String] = None): DataFrame = {
    require(p >= 4 && p <= 18, s"hll precision p out of [4,18]: $p")
    import org.apache.spark.sql.functions.col
    // binary columns hex-encode (a raw UTF-8 cast is lossy — distinct
    // byte arrays can collapse to one replacement-char string and
    // merge unrelated keys/undercount values); else string-cast
    def s(c: String) = ds.schema(c).dataType match {
      case org.apache.spark.sql.types.BinaryType => hex(col(c))
      case _ => col(c).cast("string")
    }
    val projected = ds.select(s(keyCol).as("key"), s(valueCol).as("value"))
    val keyed = projected.groupByKey { r: Row =>
      if (r.isNullAt(0)) "" else r.getString(0)
    }(Encoders.STRING)

    val fn = (key: String, rows: Iterator[Row],
              state: GroupState[SketchState]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty: Iterator[Estimate]
      } else {
        val regs = state.getOption.map(_.registers)
          .getOrElse(new Array[Byte](1 << p))
        var touched = false
        rows.foreach { r =>
          if (!r.isNullAt(1)) {
            Hll.add(regs, Hll.hash(
              org.apache.spark.unsafe.types.UTF8String.fromString(
                r.getString(1))))
            touched = true
          }
        }
        if (touched) {
          state.update(SketchState(regs))
          stateTtl.foreach(state.setTimeoutDuration)
          Iterator.single(Estimate(key, Hll.estimate(regs)))
        } else {
          // re-arm: GroupState clears the timeout every invocation —
          // an all-null batch must not permanently disarm a live key's
          // TTL (the state would leak forever)
          if (state.exists) stateTtl.foreach(state.setTimeoutDuration)
          Iterator.empty
        }
      }
    }
    keyed.flatMapGroupsWithState(OutputMode.Update,
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout)(fn)(
      Encoders.product[SketchState], Encoders.product[Estimate])
      .toDF("key", "distinct_est")
  }
}
