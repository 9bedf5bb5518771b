package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch idempotence via custom keyed state
  * (`flatMapGroupsWithState`) — the streaming analog of U2/U3
  * first-wins dedup and the reference's at-least-once SQS redelivery
  * guard: a re-delivered file_obj/item must not be published twice
  * (`submit-stac/handler.py:80-127` relies on the downstream ingestor
  * for this; here the engine enforces it).
  *
  * Scale design: state lives in the state store keyed by item id —
  * per-key work is O(1), state is partitioned with the stream, and an
  * optional processing-time TTL bounds the store (a key seen again
  * after the TTL re-emits, which is the right trade for an unbounded
  * 100 TB stream where exact-forever dedup would grow without limit —
  * pick the TTL longer than the queue's redelivery horizon). */
object StatefulDedup {

  /** Pass through only the FIRST occurrence of each key, across
    * micro-batches (and within a batch). Works on a streaming or batch
    * Dataset; `stateTtl` (e.g. "30 minutes") bounds state in the
    * streaming case. */
  def firstOccurrence(ds: DataFrame, keyCol: String,
                      stateTtl: Option[String] = None): DataFrame = {
    val enc = RowEncoder.encoderFor(ds.schema)
    val keyIdx = ds.schema.fieldIndex(keyCol)
    // group key = (isNull, valueString): the null flag is out-of-band
    // (an in-band "" sentinel would swallow a genuine empty-string
    // key as a "duplicate" of a null-key row), and binary keys render
    // by VALUE (Array[Byte].toString is identity-based — every binary
    // duplicate would get its own group, silently disabling dedup and
    // growing one state entry per input row)
    val keyed = ds.groupByKey { r: Row =>
      r.get(keyIdx) match {
        case null => (true, "")
        case b: Array[Byte] => (false, b.map(x => f"$x%02x").mkString)
        case v => (false, v.toString)
      }
    }(Encoders.tuple(Encoders.scalaBoolean, Encoders.STRING))
    val fn = (_: (Boolean, String), rows: Iterator[Row],
              state: GroupState[Boolean]) =>
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty: Iterator[Row]
      } else if (state.exists) {
        // re-arm: GroupState clears the timeout on every invocation —
        // a re-delivered duplicate must not permanently disarm the
        // key's TTL (and each sighting legitimately extends it)
        stateTtl.foreach(state.setTimeoutDuration)
        Iterator.empty
      } else {
        state.update(true)
        stateTtl.foreach(state.setTimeoutDuration)
        rows.take(1)
      }
    keyed.flatMapGroupsWithState(OutputMode.Append,
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout)(fn)(Encoders.scalaBoolean, enc)
  }
}
