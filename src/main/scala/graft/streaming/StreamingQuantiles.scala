package graft.streaming

import graft.expr.Kll
import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.{col, hex}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Running quantile estimates per key over an unbounded stream.
  *
  * Exact streaming quantiles need every value ever seen; keeping the
  * [[graft.expr.Kll]] compactor hierarchy in keyed state bounds it at
  * O(k · log(n/k)) doubles per key (a few KiB at the default k=200)
  * with the same ±O(1/k) rank contract as the batch `kll_sketch`
  * aggregate — the streaming twin of [[StreamingDistinct]].
  *
  * Unlike the HLL state, the KLL state is NOT replay-idempotent
  * (re-delivered rows re-enter the compactor), so this op belongs
  * behind exactly-once sources/sinks or a [[StatefulDedup]] stage —
  * stated here because the distinct op's at-least-once note does NOT
  * carry over.
  */
object StreamingQuantiles {

  case class Estimate(key: String, n: Long,
                      p50: Double, p90: Double, p99: Double)

  /** Public: the state encoder's generated code must reach it. */
  case class SketchState(bytes: Array[Byte])

  /** Per-trigger (key, count, p50/p90/p99) for keys touched in the
    * batch. Works on streaming and batch Datasets; batch = one pass.
    * Null values are ignored. `stateTtl` bounds idle-key state. */
  def quantilesPerKey(ds: DataFrame, keyCol: String, valueCol: String,
                      k: Int = Kll.DefaultK,
                      stateTtl: Option[String] = None): DataFrame = {
    require(k >= 8 && k <= 65536, s"kll k out of [8, 65536]: $k")
    import org.apache.spark.sql.functions.col
    // binary keys hex-encode (lossy UTF-8 cast would merge groups)
    val keyS = ds.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.BinaryType => hex(col(keyCol))
      case _ => col(keyCol).cast("string")
    }
    val projected = ds.select(keyS.as("key"),
      col(valueCol).cast("double").as("value"))
    val keyed = projected.groupByKey { r: Row =>
      if (r.isNullAt(0)) "" else r.getString(0)
    }(Encoders.STRING)

    val fn = (key: String, rows: Iterator[Row],
              state: GroupState[SketchState]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty: Iterator[Estimate]
      } else {
        val sk = state.getOption.map(s => Kll.deserialize(s.bytes))
          .getOrElse(new Kll.Sketch(k))
        var touched = false
        rows.foreach { r =>
          if (!r.isNullAt(1)) {
            val d = r.getDouble(1)
            if (!d.isNaN) { sk.add(d); touched = true }
          }
        }
        if (touched) {
          state.update(SketchState(sk.serialize))
          stateTtl.foreach(state.setTimeoutDuration)
          val Seq(p50, p90, p99) = sk.quantiles(Seq(0.5, 0.9, 0.99))
          Iterator.single(Estimate(key, sk.count, p50, p90, p99))
        } else {
          // GroupState clears the timeout on every invocation unless
          // re-set: an all-null batch for a live key must re-arm its
          // TTL or the state leaks forever
          if (state.exists) stateTtl.foreach(state.setTimeoutDuration)
          Iterator.empty
        }
      }
    }
    keyed.flatMapGroupsWithState(OutputMode.Update,
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout)(fn)(
      Encoders.product[SketchState], Encoders.product[Estimate])
      .toDF("key", "n", "p50", "p90", "p99")
  }
}
