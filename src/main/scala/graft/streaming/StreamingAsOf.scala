package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.{StructField, StructType}

/** Streaming as-of enrichment: attach to each event the most recent
  * reference row seen for its key — the unbounded-stream counterpart
  * of [[graft.operators.AsOfJoin]] (backward direction).
  *
  * Spark's stream-stream joins buffer BOTH sides within a time range;
  * for "enrich with latest state" that buffers far more than needed.
  * Here the two streams union (tagged), key by the join key, and
  * `flatMapGroupsWithState` holds exactly ONE reference row per key —
  * O(keys) state, not O(events in window).
  *
  * Ordering: within each micro-batch a key's rows are sorted by event
  * time, so the carry is event-time-correct inside a batch and across
  * batches when arrival respects batch boundaries (the file/queue
  * stage-boundary case). A reference row arriving in a LATER batch
  * than an event it precedes cannot retroactively enrich it — that
  * cross-batch reordering is the stream-stream range join's territory;
  * this operator is the low-state path for in-order feeds, like every
  * "latest dimension value" enrichment. TTL bounds state for keys
  * that go quiet. */
object StreamingAsOf {

  /** @param events    stream to enrich; must contain `keyCol` and
    *                  `timeCol`
    * @param reference stream (or batch frame) of reference rows with
    *                  `keyCol` and `timeCol`; its columns other than
    *                  the key and time are appended to matching events
    *                  (null when no reference seen yet)
    * @param keyCol    equality key on both frames
    * @param timeCol   event-time timestamp column on both frames (the
    *                  reference's copy is dropped from the output —
    *                  duplicate it under another name upstream if the
    *                  reference observation time is needed)
    * @param stateTtl  optional processing-time TTL for per-key state */
  def enrichLatest(events: DataFrame, reference: DataFrame,
                   keyCol: String, timeCol: String,
                   stateTtl: Option[String] = None): DataFrame = {
    val refOut = reference.columns
      .filterNot(c => c == keyCol || c == timeCol)
    val collisions = events.columns.toSet.intersect(refOut.toSet)
    require(collisions.isEmpty,
      s"rename reference columns colliding with events: ${collisions.mkString(",")}")

    val eStruct = StructType(events.schema.fields)
    val rStruct = StructType(
      reference.schema.fields.map(_.copy(nullable = true)))
    // binary keys hex-encode: a raw UTF-8 cast is lossy — two
    // distinct byte arrays can collapse to the same replacement-char
    // string and cross-enrich (the StreamingUpsert key contract)
    def keyStr(df: DataFrame) = df.schema(keyCol).dataType match {
      case org.apache.spark.sql.types.BinaryType => hex(col(keyCol))
      case _ => col(keyCol).cast("string")
    }
    val tagged = events.select(
      keyStr(events).as("_k"),
      unix_micros(col(timeCol).cast("timestamp")).as("_t"),
      lit(1).as("_side"),
      struct(events.columns.map(col): _*).as("_e"),
      lit(null).cast(rStruct).as("_r"))
      .unionByName(reference
        .filter(col(timeCol).isNotNull)
        .select(
          keyStr(reference).as("_k"),
          unix_micros(col(timeCol).cast("timestamp")).as("_t"),
          lit(0).as("_side"),
          lit(null).cast(eStruct).as("_e"),
          struct(reference.columns.map(col): _*).as("_r"))
        // the pre-cast filter is not enough: a non-timestamp string
        // passes isNotNull and CASTS to null, and the side-0 fold
        // reads _t with getLong — a poison row would crash-loop the
        // query on redelivery. A reference row whose time cannot
        // parse behaves like a null-time row: dropped.
        .filter(col("_t").isNotNull))

    val outSchema = StructType(Seq(
      StructField("_e", eStruct, nullable = false),
      StructField("_r", rStruct, nullable = true)))
    val enc = Encoders.row(outSchema)
    // state: the latest reference row (its time + fields)
    val stateEnc = Encoders.tuple(Encoders.scalaLong, Encoders.row(rStruct))

    val fn = (k: String, rows: Iterator[Row],
              state: GroupState[(Long, Row)]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty: Iterator[Row]
      } else if (k == null) {
        // SQL semantics: a null key never matches — events pass
        // through unenriched, no state kept
        rows.collect {
          case r if r.getInt(2) == 1 => Row(r.getStruct(3), null)
        }
      } else {
        var (carriedT, carried) =
          state.getOption.getOrElse((Long.MinValue, null: Row))
        val out = Seq.newBuilder[Row]
        // event-time order within the batch; side 0 first on ties so
        // an equal-time reference is visible (the <= contract); the
        // struct rendering breaks equal-time reference ties
        // deterministically (last overwrite wins), mirroring the
        // batch operator's struct tiebreak
        val sorted = rows.toArray.sortBy(r =>
          (if (r.isNullAt(1)) Long.MinValue else r.getLong(1),
            r.getInt(2),
            if (r.getInt(2) == 0) String.valueOf(r.getStruct(4)) else ""))
        sorted.foreach { r =>
          if (r.getInt(2) == 0) {
            val t = r.getLong(1)
            if (t >= carriedT) { carriedT = t; carried = r.getStruct(4) }
          } else {
            // null event time: kept, but never matches (same contract
            // as the batch AsOfJoin) — regardless of batch boundaries
            out += Row(r.getStruct(3),
              if (r.isNullAt(1)) null else carried)
          }
        }
        if (carried != null) state.update((carriedT, carried))
        stateTtl.foreach(state.setTimeoutDuration)
        out.result().iterator
      }
    }
    val merged = tagged.groupByKey((r: Row) => r.getString(0))(
      Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append,
        if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
        else GroupStateTimeout.NoTimeout)(fn)(stateEnc, enc)
    merged.select(
      eStruct.fieldNames.map(n => col(s"_e.$n").as(n)) ++
        refOut.map(n => col(s"_r.$n").as(n)): _*)
  }
}
