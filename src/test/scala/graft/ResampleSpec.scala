package graft

import graft.operators.Resample
import java.sql.Timestamp

/** Fixed-step resampling with forward fill ([[graft.operators.Resample]]). */
class ResampleSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: days 01, 04 (3-day gap); user 2: one day only;
  // user 1 day 01 has two events (later ts wins) plus a same-ts tie.
  private lazy val events = Seq(
    (1L, ts("2024-01-01 01:00:00"), 10.0, 1L),
    (1L, ts("2024-01-01 09:00:00"), 11.0, 2L),
    (1L, ts("2024-01-01 09:00:00"), 12.0, 3L), // same ts, higher tie wins
    (1L, ts("2024-01-04 05:00:00"), 40.0, 4L),
    (2L, ts("2024-01-02 00:00:00"), 99.0, 5L)
  ).toDF("k", "ts", "v", "id")

  private lazy val out =
    Resample.ffill(events, "k", "ts", "v", 86400L, "id")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).toString, r.getDouble(2),
        r.getBoolean(3)))
      .sortBy(t => (t._1, t._2))

  test("grid covers first..last bucket per key, daily step") {
    assert(out.map(t => (t._1, t._2)) sameElements Array(
      (1L, "2024-01-01 00:00:00.0"), (1L, "2024-01-02 00:00:00.0"),
      (1L, "2024-01-03 00:00:00.0"), (1L, "2024-01-04 00:00:00.0"),
      (2L, "2024-01-02 00:00:00.0")))
  }

  test("within-bucket value = max (ts, tie) row; gaps forward-fill it") {
    val u1 = out.filter(_._1 == 1L).map(_._3)
    assert(u1 sameElements Array(12.0, 12.0, 12.0, 40.0))
  }

  test("observed marks real buckets only") {
    val u1 = out.filter(_._1 == 1L).map(_._4)
    assert(u1 sameElements Array(true, false, false, true))
    assert(out.filter(_._1 == 2L).map(_._4) sameElements Array(true))
  }

  test("sub-daily step keeps intra-day buckets apart") {
    val hourly = Resample.ffill(events.filter($"k" === 1L), "k", "ts", "v",
      3600L, "id")
    // 01:00 .. 04-05:00 inclusive = 77 hourly buckets
    assert(hourly.count() == 77)
    val first = hourly.orderBy("bucket").limit(1).collect().head
    assert(first.getDouble(2) == 10.0 && first.getBoolean(3))
  }

  test("invalid step is rejected") {
    intercept[IllegalArgumentException](
      Resample.ffill(events, "k", "ts", "v", 0L, "id"))
  }
}
