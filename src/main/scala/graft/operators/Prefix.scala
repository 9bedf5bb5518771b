package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed exact prefix sums.
  *
  * A running total over a GLOBAL ordering is the textbook way to lose
  * scalability in Spark: `Window.orderBy(...)` with no `partitionBy`
  * collapses the whole dataset into a single task. This helper computes
  * the same result with the classic two-phase scan:
  *
  *   1. range-partition by the order column (sampled range exchange —
  *      the same machinery `orderBy` uses), sort within partitions;
  *   2. one job computes a per-partition partial sum
  *      (numPartitions longs to the driver — KBs at any scale);
  *   3. each partition streams its rows once more, adding its exclusive
  *      starting offset.
  *
  * Both jobs hang off the SAME shuffled RDD, so the range exchange runs
  * once and the second job reuses the shuffle files (a skipped stage) —
  * no persist, no cache leak, no second exchange. No task ever sees
  * more than its own partition; the shape survives a 100 TB input,
  * where the naive global window would OOM one executor.
  */
object Prefix {

  /** Inclusive running sum of `valueCol` (integral, nulls add 0; rows
    * before any non-null value get 0) in ascending `orderCol` order,
    * emitted as `outCol` (long). `orderCol` must be unique (it is the
    * total order); ties would make the result nondeterministic across
    * partitionings.
    *
    * Eager by necessity: the per-partition partials job runs when this
    * is CALLED (the offsets must exist before the result plan can),
    * costing one extra pass over the shuffled data. */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
                 outCol: String,
                 numPartitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.sessionState.conf.numShufflePartitions
    require(!df.columns.contains("_v"),
      "runningSum reserves the column name _v")
    // withColumn (not a re-select through col()) so payload column
    // names containing dots survive untouched
    val sorted = df
      .withColumn("_v", col(valueCol).cast("long"))
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
    val vIdx = sorted.columns.length - 1

    // ONE concrete RDD: both jobs below share its shuffle dependency,
    // so the exchange executes once and is then a skipped stage.
    val sortedRdd = sorted.rdd

    // Phase 2: per-partition partials -> exclusive offsets.
    val partials = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = 0L
      it.foreach(r => if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx))
      Iterator((pid, acc))
    }.collect().sortBy(_._1)
    val offsets: Array[Long] = {
      var acc = 0L
      partials.map { case (_, s) => val o = acc; acc += s; o }
    }

    // Phase 3: stream each partition once, carrying the offset.
    val outRdd = sortedRdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = offsets(pid)
      it.map { r =>
        if (!r.isNullAt(vIdx)) acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq.dropRight(1) :+ acc)
      }
    }
    val schema = StructType(df.schema.fields)
      .add(outCol, LongType, nullable = false)
    spark.createDataFrame(outRdd, schema)
  }

  /** Reference single-partition implementation (spec cross-check only —
    * do NOT use at scale). */
  private[graft] def runningSumNaive(df: DataFrame, orderCol: String,
                                     valueCol: String, outCol: String): DataFrame = {
    val w = Window.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, sum(col(valueCol).cast("long")).over(w))
  }
}
