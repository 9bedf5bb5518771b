package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType

/** Streaming latest-wins upsert view: maintain "current row per key"
  * over an unbounded changelog stream — the streaming twin of
  * [[graft.operators.Cdc.applyChangelog]] and the live half of a CDC
  * pipeline (batch compacts the history; this keeps the head fresh).
  *
  * Keyed `flatMapGroupsWithState` holds exactly ONE (version, payload)
  * per key — O(keys) state. Each micro-batch's rows for a key max-fold
  * on (ts, seq) — order-free, the same comparison the batch operator
  * uses (later version wins, deletes tombstone; null change times are
  * dropped, as in [[StreamingAsOf]]); the batch emits the key's new
  * current row — or a tombstone marker — only when the state actually
  * changed, so downstream sees a changelog of the VIEW, not an echo of
  * the input.
  *
  * Replay semantics: folding is idempotent (max over versions — a
  * join-semilattice like the HLL registers), so at-least-once
  * redelivery cannot corrupt the state; it can only re-emit an
  * unchanged row's update, which idempotent sinks absorb. Out-of-order
  * delivery ACROSS batches is also safe: a stale version arriving late
  * loses the max-fold and emits nothing. TTL (optional) bounds state
  * for keys that go quiet; expiring a live key forgets its tombstone,
  * so use TTL only when upstream guarantees bounded lateness.
  */
object StreamingUpsert {

  /** @param changelog streaming frame: `keyCol`, `tsCol`, `seqCol`,
    *                  `opCol` ('upsert'/'delete') + value columns
    * @param stateTtl  optional processing-time TTL for per-key state
    * @return stream of (key, op, value-cols): 'upsert' rows carry the
    *         new current values, 'delete' rows are tombstones */
  def currentView(changelog: DataFrame, keyCol: String,
                  tsCol: String = "ts", seqCol: String = "seq",
                  opCol: String = "op",
                  stateTtl: Option[String] = None): DataFrame = {
    val valueCols = changelog.columns
      .filterNot(c => Set(keyCol, tsCol, seqCol, opCol)(c)).toSeq
    val payload = StructType(changelog.schema.fields
      .filter(f => valueCols.contains(f.name)).map(_.copy(nullable = true)))

    val prepped = changelog
      .filter(col(tsCol).isNotNull)
      .select(
        col(keyCol).cast("string").as("_k"),
        unix_micros(col(tsCol).cast("timestamp")).as("_t"),
        col(seqCol).cast("long").as("_s"),
        (col(opCol) === lit("delete")).as("_del"),
        struct(valueCols.map(col): _*).cast(payload).as("_p"))

    // state row: (t, s, del, payload)
    val stateEnc = Encoders.kryo[Option[(Long, Long, Boolean, Row)]]
    val outSchema = StructType(
      StructType(Seq(changelog.schema(keyCol))).fields ++
        StructType(Seq(changelog.schema(opCol))).fields ++ payload.fields)
    val outEnc = Encoders.row(outSchema)
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    val keyType = changelog.schema(keyCol).dataType
    val out = prepped
      .groupByKey(_.getAs[String]("_k"))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (key: String, rows: Iterator[Row],
         st: GroupState[Option[(Long, Long, Boolean, Row)]]) => {
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val prev = st.getOption.flatten
            val best = rows.foldLeft(prev) { (acc, r) =>
              val cand = (r.getLong(1), r.getLong(2), r.getBoolean(3),
                r.getStruct(4))
              acc match {
                case Some(p) if p._1 > cand._1 ||
                  (p._1 == cand._1 && p._2 >= cand._2) => acc
                case _ => Some(cand)
              }
            }
            // re-arm or set TTL every invocation (Spark clears it)
            stateTtl.foreach(st.setTimeoutDuration)
            if (best == prev) Iterator.empty
            else {
              st.update(best)
              val (_, _, del, p) = best.get
              val op = if (del) "delete" else "upsert"
              val vals =
                if (del) Seq.fill(p.length)(null)
                else p.toSeq
              Iterator(Row.fromSeq(Seq(castKey(key, keyType), op) ++ vals))
            }
          }
        })(stateEnc, outEnc)
    out
  }

  private def castKey(k: String, dt: org.apache.spark.sql.types.DataType): Any =
    dt match {
      case org.apache.spark.sql.types.LongType => k.toLong
      case org.apache.spark.sql.types.IntegerType => k.toInt
      case _ => k
    }
}
