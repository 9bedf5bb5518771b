package graft

import graft.operators.Diff
import org.apache.spark.sql.functions._

class DiffSpec extends SparkSuite {
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/same, null-safe") {
    val oldDf = Seq(
      (1L, Some("a"), 10),
      (2L, Some("b"), 20),
      (3L, None: Option[String], 30),     // null value survives as same
      (4L, Some("d"), 40),
      (5L, None: Option[String], 50))     // null -> value = changed
      .toDF("id", "v", "x")
    val newDf = Seq(
      (1L, Some("a"), 10),                // same
      (2L, Some("B"), 20),                // changed (v)
      (3L, None: Option[String], 30),     // same (null <=> null)
      (5L, Some("e"), 50),                // changed (null -> e)
      (6L, Some("f"), 60))                // added; 4 removed
      .toDF("id", "v", "x")
    val out = Diff.snapshotDiff(oldDf, newDf, Seq("id"), Seq("v", "x"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "same", 2L -> "changed", 3L -> "same",
      4L -> "removed", 5L -> "changed", 6L -> "added"))
  }

  test("diffSummary counts match the detail rows") {
    val oldDf = (1L to 100L).map(i => (i, s"v$i")).toDF("id", "v")
    val newDf = (11L to 110L).map(i =>
      (i, if (i % 2 == 0) s"v$i" else s"w$i")).toDF("id", "v")
    val sum = Diff.diffSummary(oldDf, newDf, Seq("id"), Seq("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("removed" -> 10L, "added" -> 10L,
      "same" -> 45L, "changed" -> 45L))
  }

  test("composite keys join correctly") {
    val oldDf = Seq(("a", 1, "x"), ("a", 2, "y")).toDF("k1", "k2", "v")
    val newDf = Seq(("a", 1, "x"), ("b", 2, "y")).toDF("k1", "k2", "v")
    val out = Diff.snapshotDiff(oldDf, newDf, Seq("k1", "k2"), Seq("v"))
      .collect().map(r => (r.getString(0), r.getInt(1)) -> r.getString(2))
      .toMap
    assert(out == Map(("a", 1) -> "same", ("a", 2) -> "removed",
      ("b", 2) -> "added"))
  }
}
