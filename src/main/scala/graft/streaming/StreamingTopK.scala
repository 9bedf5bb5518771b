package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Approximate heavy hitters (top-k items) over an unbounded stream.
  *
  * Exact per-item counting needs state proportional to the number of
  * DISTINCT items — unbounded on a 100 TB stream. The classic fix is
  * the space-saving summary (Metwally et al. 2005): keep at most
  * `capacity` counters; an unseen item evicts the current minimum and
  * inherits its count as overestimation error. Guarantees: any item
  * with true count > N/capacity is present, and for every candidate
  * `count - err <= true <= count`.
  *
  * Scale shape: items hash into `nBuckets` buckets; each bucket owns an
  * independent summary in the keyed state store, so the stream shuffles
  * once on bucket id, per-bucket work is O(batch items in bucket), and
  * total state is bounded at nBuckets x capacity counters regardless of
  * stream size. An item lives in exactly one bucket, so the global
  * heavy hitters are a subset of the union of bucket candidates — take
  * the final top-k with a tiny batch aggregation over the emitted
  * candidates.
  */
object StreamingTopK {

  case class Candidate(item: String, count: Long, err: Long)

  /** Public: the state encoder's generated code must reach it. */
  case class Summary(items: Map[String, (Long, Long)])

  /** Per-trigger emission of each bucket's current top candidates
    * (columns `item`, `count`, `err`). Works on a streaming Dataset
    * (Update mode; `stateTtl` bounds idle-bucket state) or a batch one
    * (single pass; exact when `capacity` exceeds the bucket's distinct
    * items). Null items are ignored. */
  def heavyHitters(ds: DataFrame, itemCol: String,
                   nBuckets: Int = 64, capacity: Int = 256,
                   topPerBucket: Int = 16,
                   stateTtl: Option[String] = None): DataFrame = {
    require(nBuckets > 0 && capacity > 0 && topPerBucket > 0)
    // project BEFORE the keyed shuffle: only the item strings move, not
    // the full rows (the caller may hand us a wide table)
    // binary items hex-encode (lossy UTF-8 cast would merge distinct
    // byte arrays into one replacement-char item and inflate its count)
    val itemS = ds.schema(itemCol).dataType match {
      case org.apache.spark.sql.types.BinaryType =>
        org.apache.spark.sql.functions.hex(
          org.apache.spark.sql.functions.col(itemCol))
      case _ => org.apache.spark.sql.functions.col(itemCol).cast("string")
    }
    val items = ds.select(itemS.as("item"))
    val keyed = items.groupByKey { r: Row =>
      val v = r.getString(0)
      if (v == null) -1 else math.floorMod(v.hashCode, nBuckets)
    }(Encoders.scalaInt)

    val fn = (bucket: Int, rows: Iterator[Row],
              state: GroupState[Summary]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty: Iterator[Candidate]
      } else if (bucket < 0) Iterator.empty // null items
      else {
        // batch-local exact counts first: one summary update per
        // distinct item in the batch, not per row
        val batchCounts = new scala.collection.mutable.HashMap[String, Long]()
        rows.foreach { r =>
          val s = r.getString(0)
          if (s != null)
            batchCounts.update(s, batchCounts.getOrElse(s, 0L) + 1L)
        }
        val m = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
        state.getOption.foreach(s => m ++= s.items)
        // ordered index on (count, item) makes eviction O(log capacity)
        // instead of a full O(capacity) min scan per new distinct item
        val byCount = scala.collection.mutable.TreeSet.empty[(Long, String)]
        m.foreach { case (i, (cnt, _)) => byCount += ((cnt, i)) }
        batchCounts.foreach { case (item, c) =>
          m.get(item) match {
            case Some((cnt, err)) =>
              byCount -= ((cnt, item))
              m.update(item, (cnt + c, err))
              byCount += ((cnt + c, item))
            case None if m.size < capacity =>
              m.update(item, (c, 0L))
              byCount += ((c, item))
            case None =>
              // evict the minimum (deterministic tie-break on item) and
              // inherit its count as the new candidate's overestimate
              val min @ (minCnt, minItem) = byCount.head
              byCount -= min
              m -= minItem
              m.update(item, (minCnt + c, minCnt))
              byCount += ((minCnt + c, item))
          }
        }
        state.update(Summary(m.toMap))
        stateTtl.foreach(state.setTimeoutDuration)
        m.toSeq
          .sortBy { case (i, (cnt, _)) => (-cnt, i) }
          .take(topPerBucket)
          .map { case (i, (cnt, err)) => Candidate(i, cnt, err) }
          .iterator
      }
    }
    keyed.flatMapGroupsWithState(OutputMode.Update,
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout)(fn)(
      Encoders.product[Summary], Encoders.product[Candidate])
      .toDF("item", "count", "err")
  }
}
