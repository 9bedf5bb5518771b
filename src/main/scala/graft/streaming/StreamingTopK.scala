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
    val itemIdx = ds.schema.fieldIndex(itemCol)
    val keyed = ds.groupByKey { r: Row =>
      val v = r.get(itemIdx)
      if (v == null) -1
      else math.floorMod(v.toString.hashCode, nBuckets)
    }(Encoders.scalaInt)

    val fn = (bucket: Int, rows: Iterator[Row],
              state: GroupState[Summary]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty: Iterator[Candidate]
      } else if (bucket < 0) Iterator.empty // null items
      else {
        // batch-local exact counts first: one state pass per distinct
        // item in the batch, not per row
        val batchCounts = new scala.collection.mutable.HashMap[String, Long]()
        rows.foreach { r =>
          val v = r.get(itemIdx)
          if (v != null) {
            val s = v.toString
            batchCounts.update(s, batchCounts.getOrElse(s, 0L) + 1L)
          }
        }
        var m = state.getOption.map(_.items).getOrElse(Map.empty)
        batchCounts.foreach { case (item, c) =>
          m.get(item) match {
            case Some((cnt, err)) => m += item -> (cnt + c, err)
            case None if m.size < capacity => m += item -> (c, 0L)
            case None =>
              // evict the minimum (deterministic tie-break on item) and
              // inherit its count as the new candidate's overestimate
              val (minItem, (minCnt, _)) =
                m.minBy { case (i, (cnt, _)) => (cnt, i) }
              m -= minItem
              m += item -> (minCnt + c, minCnt)
          }
        }
        state.update(Summary(m))
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
