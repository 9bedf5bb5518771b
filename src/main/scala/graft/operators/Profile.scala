package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data profiling: one tidy row of stats per column — the
  * first-contact operator for any new 100 TB table (null rates,
  * cardinalities, ranges drive partitioning and quality decisions).
  *
  * Shape: a single wide aggregation computes every column's stats in
  * ONE scan (Catalyst evaluates all aggregates together — never one
  * job per column), then the 1×(4·ncols) row unpivots driver-side
  * into (column, stat…) rows. Min/max compare in the column's native
  * type and render as strings so heterogeneous columns stack into one
  * frame. */
object Profile {

  /** @return one row per column of `df`:
    *         (column, n_nulls, n_distinct, min_value, max_value) —
    *         min/max as strings (native-type ordering, rendered). */
  def profile(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.columns
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        (count(lit(1)) - count(col(c))).as(s"__nulls_$c"),
        count_distinct(col(c)).as(s"__dist_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // an all-null column keeps NULL min/max (distinct from a real ""
    // minimum, and the shape SQL oracles produce)
    cols.zipWithIndex.map { case (c, i) =>
      (c, row.getLong(4 * i), row.getLong(4 * i + 1),
        row.getString(4 * i + 2), row.getString(4 * i + 3))
    }.toSeq
      .toDF("column", "n_nulls", "n_distinct", "min_value", "max_value")
  }
}
