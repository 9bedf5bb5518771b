package graft

import graft.operators.Cdc
import java.sql.Timestamp

/** Latest-wins changelog application ([[graft.operators.Cdc]]). */
class CdcSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val base = Seq(
    (1L, "a", 10.0), // untouched
    (2L, "b", 20.0), // updated
    (3L, "c", 30.0), // deleted
    (4L, "d", 40.0), // deleted then re-upserted
    (5L, "e", 50.0)  // two updates, later ts wins
  ).toDF("k", "status", "price")

  private lazy val changelog = Seq(
    (2L, "upsert", ts("2025-01-01 00:00:00"), 1L, Some("b2"), Some(22.0)),
    (3L, "delete", ts("2025-01-01 00:00:00"), 1L, None, None),
    (4L, "delete", ts("2025-01-01 00:00:00"), 1L, None, None),
    (4L, "upsert", ts("2025-01-02 00:00:00"), 2L, Some("d2"), Some(44.0)),
    (5L, "upsert", ts("2025-01-01 00:00:00"), 1L, Some("e1"), Some(51.0)),
    (5L, "upsert", ts("2025-01-03 00:00:00"), 2L, Some("e2"), Some(52.0)),
    (6L, "upsert", ts("2025-01-01 00:00:00"), 1L, Some("new"), Some(60.0))
  ).toDF("k", "op", "ts", "seq", "status", "price")

  private def applied =
    Cdc.applyChangelog(base, changelog, Seq("k"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getDouble(2))))
      .toMap

  test("untouched base keys survive unchanged") {
    assert(applied(1L) == (("a", 10.0)))
  }

  test("an upsert beats the base row") {
    assert(applied(2L) == (("b2", 22.0)))
  }

  test("a delete removes the key") {
    assert(!applied.contains(3L))
  }

  test("delete then later upsert resurrects the key") {
    assert(applied(4L) == (("d2", 44.0)))
  }

  test("later timestamp wins among multiple upserts") {
    assert(applied(5L) == (("e2", 52.0)))
  }

  test("changelog inserts a key absent from the base") {
    assert(applied(6L) == (("new", 60.0)))
  }

  test("same-timestamp updates break ties by seq") {
    val chg = Seq(
      (1L, "upsert", ts("2025-01-01 00:00:00"), 1L, Some("x"), Some(1.0)),
      (1L, "upsert", ts("2025-01-01 00:00:00"), 2L, Some("y"), Some(2.0))
    ).toDF("k", "op", "ts", "seq", "status", "price")
    val out = Cdc.applyChangelog(base, chg, Seq("k"))
      .filter($"k" === 1L).collect()
    assert(out.length == 1 && out.head.getString(1) == "y")
  }

  test("result is one row per surviving key") {
    val out = Cdc.applyChangelog(base, changelog, Seq("k"))
    assert(out.count() == out.select("k").distinct().count())
  }

  test("scd2History: intervals chain, deletes close, re-upserts reopen") {
    val chg = Seq(
      (1L, "upsert", ts("2025-01-01 00:00:00"), 1L, Some("v1"), Some(1.0)),
      (1L, "upsert", ts("2025-01-02 00:00:00"), 2L, Some("v2"), Some(2.0)),
      (2L, "upsert", ts("2025-01-01 00:00:00"), 3L, Some("x1"), Some(9.0)),
      (2L, "delete", ts("2025-01-02 00:00:00"), 4L, None, None),
      (2L, "upsert", ts("2025-01-03 00:00:00"), 5L, Some("x2"), Some(8.0))
    ).toDF("k", "op", "ts", "seq", "status", "price")
    val out = Cdc.scd2History(chg, Seq("k"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getTimestamp(4)).map(_.toString).orNull, r.getBoolean(5)))
    assert(out.toSeq == Seq(
      (1L, "v1", "2025-01-02 00:00:00.0", false),
      (1L, "v2", null, true),
      (2L, "x1", "2025-01-02 00:00:00.0", false), // closed by the delete
      (2L, "x2", null, true)))
  }

  test("duplicate base keys resolve deterministically (greatest payload)") {
    val emptyChg = changelog.limit(0)
    for (rows <- Seq(Seq((1L, "a", 1.0), (1L, "b", 2.0)),
                     Seq((1L, "b", 2.0), (1L, "a", 1.0)))) {
      val dupBase = rows.toDF("k", "status", "price").repartition(3)
      val out = Cdc.applyChangelog(dupBase, emptyChg, Seq("k")).collect()
      assert(out.length == 1 && out.head.getString(1) == "b",
        s"expected the greatest payload ('b') to win, got ${out.toSeq}")
    }
  }
}
