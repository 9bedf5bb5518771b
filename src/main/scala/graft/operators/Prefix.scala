package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact prefix sums.
  *
  * A running total over a GLOBAL ordering is the textbook way to lose
  * scalability in Spark: `Window.orderBy(...)` with no `partitionBy`
  * collapses the whole dataset into a single task. This helper computes
  * the same result with the classic two-phase scan:
  *
  *   1. range-partition by the order column (sampled range exchange —
  *      the same machinery `orderBy` uses), sort within partitions;
  *   2. one tiny job aggregates a per-partition partial sum
  *      (numPartitions rows to the driver — KBs at any scale);
  *   3. each partition's exclusive starting offset is broadcast back as
  *      a literal map and added to the per-partition running sum.
  *
  * Every row is touched exactly twice (once for partials, once for the
  * windowed pass) and no task ever sees more than its own partition —
  * this shape survives a 100 TB input, where the naive global window
  * would OOM one executor.
  */
object Prefix {

  /** Inclusive running sum of `valueCol` (integral) in ascending
    * `orderCol` order, emitted as `outCol` (long). `orderCol` must be
    * unique (it is the total order); ties would make the result
    * nondeterministic across partitionings.
    */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
                 outCol: String,
                 numPartitions: Int = 0): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(n, col(orderCol))
      .sortWithinPartitions(orderCol)
      .withColumn("_pid", spark_partition_id())
      .persist()

    // Phase 2: per-partition partials -> exclusive offsets (driver-side,
    // numPartitions rows only).
    val partials = parted.groupBy("_pid")
      .agg(sum(col(valueCol).cast("long")).as("_psum"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      partials.map { case (pid, s) => val o = pid -> acc; acc += s; o }.toMap
    }

    // Phase 3: in-partition running sum + broadcast offset. The map is
    // a literal (numPartitions entries), so no join and no shuffle.
    val w = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parted
      .withColumn(outCol,
        sum(col(valueCol).cast("long")).over(w) +
          coalesce(element_at(typedlit(offsets), col("_pid")), lit(0L)))
      .drop("_pid")
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
