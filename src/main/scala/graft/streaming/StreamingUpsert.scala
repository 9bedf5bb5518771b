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
  * on (ts, seq, op, payload) — order-free and TOTAL: full version ties
  * break on the payload exactly like the batch operator's
  * `max_by(payload, struct(ts, seq, payload))`, so the fold is
  * deterministic under any partitioning/arrival order (null change
  * times are dropped, as in [[StreamingAsOf]]; null seq sorts first,
  * like the batch null-first struct order). The batch emits the key's
  * new current row — or a tombstone marker — only when the state
  * actually changed, so downstream sees a changelog of the VIEW, not
  * an echo of the input.
  *
  * Replay semantics: the fold is a max over a total order — a
  * join-semilattice — so at-least-once redelivery cannot corrupt the
  * state; it can only re-emit an unchanged row's update, which
  * idempotent sinks absorb. Out-of-order delivery ACROSS batches is
  * also safe: a stale version arriving late loses the max-fold and
  * emits nothing. TTL (optional) bounds state for keys that go quiet;
  * expiring a live key forgets its tombstone, so use TTL only when
  * upstream guarantees bounded lateness.
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

    // the original-typed key rides along and is emitted verbatim — no
    // string round-trip back to the key type (and null keys survive)
    // binary keys hex-encode (a raw UTF-8 cast is lossy — two distinct
    // byte arrays can collapse to the same replacement-char string);
    // everything else string-casts injectively within one key type
    val keyStr = changelog.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.BinaryType => hex(col(keyCol))
      case _ => col(keyCol).cast("string")
    }
    val prepped = changelog
      .filter(col(tsCol).isNotNull)
      .select(
        keyStr.as("_k"),
        unix_micros(col(tsCol).cast("timestamp")).as("_t"),
        col(seqCol).cast("long").as("_s"),
        // null op folds like a delete: in the batch operator a winning
        // null-op row is dropped by the final `op <> 'delete'` filter,
        // i.e. the key vanishes — the streaming analog is a tombstone
        // (and never a poison-pill NPE in the fold)
        (col(opCol).isNull || col(opCol) === lit("delete")).as("_del"),
        struct(valueCols.map(col): _*).cast(payload).as("_p"),
        col(keyCol).as("_ko"))
      // the pre-cast isNotNull is not enough: a malformed ts string
      // CASTS to null and the fold reads _t with getLong — a poison
      // row would crash-loop the query on redelivery. A row whose ts
      // cannot parse behaves like a null-ts row: dropped.
      .filter(col("_t").isNotNull)

    // state: (t, s, del, payload, original key)
    type St = Option[(Long, Long, Boolean, Row, Any)]
    val stateEnc = Encoders.kryo[St]
    val outSchema = StructType(
      StructType(Seq(changelog.schema(keyCol))).fields ++
        StructType(Seq(changelog.schema(opCol))).fields ++ payload.fields)
    val outEnc = Encoders.row(outSchema)
    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout

    // group key = (isNull, keyString): the null flag is out-of-band, so
    // no in-band sentinel a genuine key value could collide with
    val out = prepped
      .groupByKey(r =>
        (r.isNullAt(0), Option(r.getAs[String]("_k")).getOrElse("")))(
        Encoders.tuple(Encoders.scalaBoolean, Encoders.STRING))
      .flatMapGroupsWithState(OutputMode.Append, timeout)(
        (_: (Boolean, String), rows: Iterator[Row], st: GroupState[St]) => {
          if (st.hasTimedOut) { st.remove(); Iterator.empty }
          else {
            val prev: St = st.getOption.flatten
            val best = rows.foldLeft(prev) { (acc, r) =>
              val cand = (r.getLong(1),
                if (r.isNullAt(2)) Long.MinValue else r.getLong(2),
                r.getBoolean(3), r.getStruct(4), r.get(5))
              acc match {
                case Some(p) if versionCmp(p, cand) >= 0 => acc
                case _ => Some(cand)
              }
            }
            // re-arm or set TTL every invocation (Spark clears it)
            stateTtl.foreach(st.setTimeoutDuration)
            if (best == prev) Iterator.empty
            else {
              st.update(best)
              val (_, _, del, p, ko) = best.get
              val op = if (del) "delete" else "upsert"
              val vals =
                if (del) Seq.fill(p.length)(null)
                else p.toSeq
              Iterator(Row.fromSeq(Seq(ko, op) ++ vals))
            }
          }
        })(stateEnc, outEnc)
    out
  }

  /** Total order on (ts, seq, op, payload) mirroring the batch
    * operator's `struct(ts, seq, payload)` max ordering, where the
    * batch payload struct leads with the op string ('delete' <
    * 'upsert') followed by the value columns, nulls first. */
  private def versionCmp(a: (Long, Long, Boolean, Row, Any),
                         b: (Long, Long, Boolean, Row, Any)): Int = {
    val t = java.lang.Long.compare(a._1, b._1)
    if (t != 0) return t
    val s = java.lang.Long.compare(a._2, b._2)
    if (s != 0) return s
    // op: delete=false-on-upsert ordering — 'delete' < 'upsert'
    val o = java.lang.Boolean.compare(a._3, b._3)
    if (o != 0) return -o
    cmpRow(a._4, b._4)
  }

  private def cmpRow(x: Row, y: Row): Int = {
    var i = 0
    while (i < x.length) {
      val c = cmpVal(x.get(i), y.get(i))
      if (c != 0) return c
      i += 1
    }
    0
  }

  private def cmpVal(a: Any, b: Any): Int = (a, b) match {
    case (null, null) => 0
    case (null, _) => -1
    case (_, null) => 1
    case (x: Row, y: Row) => cmpRow(x, y)
    // Spark array ordering: elementwise, then shorter < longer
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      val it = x.iterator.zip(y.iterator)
      while (it.hasNext) {
        val (xe, ye) = it.next()
        val c = cmpVal(xe, ye)
        if (c != 0) return c
      }
      java.lang.Integer.compare(x.length, y.length)
    case (x: Array[Byte], y: Array[Byte]) =>
      java.util.Arrays.compareUnsigned(x, y)
    case (_: java.util.Map[_, _], _) | (_: Map[_, _], _) =>
      throw new IllegalArgumentException(
        "map-typed value columns are not orderable for version " +
          "tie-breaks (Spark's own struct ordering rejects them too); " +
          "ensure (ts, seq) versions are unique or drop the map column")
    case (x, y) => x.asInstanceOf[Comparable[Any]].compareTo(y)
  }
}
