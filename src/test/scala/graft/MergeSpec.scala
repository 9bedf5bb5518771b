package graft

import graft.operators.Merge
import org.apache.spark.sql.functions._

/** Declarative MERGE INTO ([[graft.operators.Merge]]). */
class MergeSpec extends SparkSuite {
  import spark.implicits._

  private lazy val target = Seq(
    (1L, "a", 10.0), // untouched
    (2L, "b", 20.0), // updated
    (3L, "c", 30.0)  // deleted
  ).toDF("k", "status", "price")

  private lazy val source = Seq(
    (2L, "b2", 22.0, "upsert"),
    (3L, "c", 30.0, "delete"),
    (4L, "d", 40.0, "upsert"),  // insert
    (9L, "x", 99.0, "delete")   // delete of an absent key: no-op
  ).toDF("k", "status", "price", "op")

  private def merged = Merge.mergeInto(target, source, Seq("k"),
    deleteWhen = Some(col("op") === "delete"))
    .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
    .toMap

  test("matched rows update, unmatched target rows survive") {
    assert(merged(1L) == (("a", 10.0)))
    assert(merged(2L) == (("b2", 22.0)))
  }

  test("matched delete removes; absent-key delete is a no-op") {
    assert(!merged.contains(3L))
    assert(!merged.contains(9L))
  }

  test("source-only rows insert") {
    assert(merged(4L) == (("d", 40.0)))
  }

  test("output schema is exactly the target's (op column dropped)") {
    val out = Merge.mergeInto(target, source, Seq("k"),
      deleteWhen = Some(col("op") === "delete"))
    assert(out.columns.toSeq == Seq("k", "status", "price"))
  }

  test("without deleteWhen the merge is a pure upsert") {
    val m = Merge.mergeInto(target, source.drop("op"), Seq("k"))
      .collect().map(r => r.getLong(0)).toSet
    assert(m == Set(1L, 2L, 3L, 4L, 9L))
  }

  test("source missing a target column is rejected") {
    intercept[IllegalArgumentException] {
      Merge.mergeInto(target, source.drop("price"), Seq("k"))
    }
  }

  test("one shuffle: exactly one join in the plan, no window, no extra agg") {
    val plan = Merge.mergeInto(target, source, Seq("k"),
      deleteWhen = Some(col("op") === "delete"))
      .queryExecution.executedPlan.toString
    val joins = "(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)".r
      .findAllIn(plan).length
    assert(joins == 1, s"expected exactly 1 join, got $joins:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("CartesianProduct") &&
      !plan.contains("Aggregate"), plan)
  }

  test("case-insensitive sessions resolve differently-cased columns") {
    val srcCased = source.withColumnRenamed("price", "PRICE")
    val out = Merge.mergeInto(target, srcCased, Seq("k"),
      deleteWhen = Some(col("op") === "delete"))
    assert(out.count() == 3) // same merge result as the exact-case source
  }
}
