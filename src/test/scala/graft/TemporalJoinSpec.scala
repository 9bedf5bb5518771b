package graft

import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** AsOfJoin / RangeJoin semantics the DuckDB oracle can't pin:
  * tie-breaks, tolerance, direction, null keys, bin boundaries. */
class TemporalJoinSpec extends SparkSuite {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def left(rows: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("lid", "lt", "k")
      .select(col("lid"), to_timestamp(col("lt")).as("lt"), col("k"))
  }
  private def right(rows: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.toDF("rid", "rt", "k")
      .select(col("rid"), to_timestamp(col("rt")).as("rt"), col("k"))
  }

  test("backward: latest at-or-before wins; no candidate -> null") {
    val l = left((1L, "2024-01-01 10:00:00", 7L),
      (2L, "2024-01-01 09:00:00", 7L))
    val r = right((10L, "2024-01-01 09:30:00", 7L),
      (11L, "2024-01-01 08:00:00", 7L),
      (12L, "2024-01-01 11:00:00", 7L))
    val out = AsOfJoin.join(l, r, "k", "lt", "rt")
      .orderBy("lid").collect()
    assert(out.map(r => (r.getLong(0), Option(r.get(3)).map(_.toString)))
      .toSeq == Seq((1L, Some("10")), (2L, Some("11"))))
  }

  test("equal timestamps match (<=); among equal right rows the " +
    "greatest struct wins deterministically") {
    val l = left((1L, "2024-01-01 10:00:00", 7L))
    val r = right((10L, "2024-01-01 10:00:00", 7L),
      (11L, "2024-01-01 10:00:00", 7L))
    val out = AsOfJoin.join(l, r, "k", "lt", "rt").collect()
    assert(out.head.getLong(3) == 11L)
  }

  test("forward: earliest at-or-after wins; tolerance drops far matches") {
    val l = left((1L, "2024-01-01 10:00:00", 7L),
      (2L, "2024-01-01 12:00:00", 7L))
    val r = right((10L, "2024-01-01 10:30:00", 7L),
      (11L, "2024-01-01 16:00:00", 7L))
    val fwd = AsOfJoin.join(l, r, "k", "lt", "rt", direction = "forward")
      .orderBy("lid").collect()
    assert(fwd.map(r => r.getLong(3)).toSeq == Seq(10L, 11L))
    val tol = AsOfJoin.join(l, r, "k", "lt", "rt", direction = "forward",
      toleranceMicros = Some(3600L * 1000000L))
      .orderBy("lid").collect()
    assert(tol.map(r => Option(r.get(3))).toSeq == Seq(Some(10L), None))
  }

  test("composite keys: both components must match; null in any " +
    "component never matches") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-01 10:00:00", 7L, "x"),
      (2L, "2024-01-01 10:00:00", 7L, "y"),
      (3L, "2024-01-01 10:00:00", 7L, null))
      .toDF("lid", "lt", "k1", "k2")
      .select(col("lid"), to_timestamp(col("lt")).as("lt"),
        col("k1"), col("k2"))
    val r = Seq((10L, "2024-01-01 09:00:00", 7L, "x"),
      (11L, "2024-01-01 09:30:00", 7L, "z"))
      .toDF("rid", "rt", "k1", "k2")
      .select(col("rid"), to_timestamp(col("rt")).as("rt"),
        col("k1"), col("k2"))
    val out = AsOfJoin.join(l, r, Seq("k1", "k2"), "lt", "rt",
      "backward", None)
      .orderBy("lid").collect()
      .map(row => (row.getLong(0), Option(row.get(4)).map(_.toString)))
    // (7,x) matches rid 10; (7,y) matches nothing despite k1==7;
    // null k2 matches nothing
    assert(out.toSeq == Seq((1L, Some("10")), (2L, None), (3L, None)))
  }

  test("null keys never match; keys don't leak across groups") {
    val l = left((1L, "2024-01-01 10:00:00", 7L))
      .union(spark.sql(
        "SELECT 2L AS lid, timestamp'2024-01-01 10:00:00' AS lt, CAST(NULL AS LONG) AS k"))
    val r = right((10L, "2024-01-01 09:00:00", 8L)) // different key
    val out = AsOfJoin.join(l, r, "k", "lt", "rt").orderBy("lid").collect()
    assert(out.forall(_.isNullAt(3)))
  }

  test("as-of matches a driver-computed oracle on events (sf0.001)") {
    val got = Queries.asofJoin(spark, "/root/testdata/sf0.001")
      .select("event_id", "click_id").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map { r =>
        val inst = r.getTimestamp(3).toInstant
        // micros, not millis — the operator compares at micros
        (r.getLong(0), r.getLong(1), r.getString(2),
          inst.getEpochSecond * 1000000L + inst.getNano / 1000L)
      }
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val want = ev.filter(_._3 == "purchase").sortBy(_._1).map { p =>
      val best = clicksByUser.getOrElse(p._2, Array.empty)
        .filter(_._4 <= p._4)
      (p._1, if (best.isEmpty) -1L
             else best.maxBy(c => (c._4, c._1))._1)
    }
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("range join: boundaries are [start, end); intervals spanning " +
    "bins match in exactly one bin (no duplicate pairs)") {
    import spark.implicits._
    val pts = Seq((1L, "2024-01-01 00:00:00", 5L), // == start: in
      (2L, "2024-01-01 00:59:59", 5L),             // just inside
      (3L, "2024-01-01 01:00:00", 5L),             // == end: out
      (4L, "2024-01-01 00:30:00", 6L))             // wrong key
      .toDF("pid", "pt", "k")
      .select(col("pid"), to_timestamp(col("pt")).as("pt"), col("k"))
    val ivs = Seq((100L, "2024-01-01 00:00:00", "2024-01-01 01:00:00", 5L))
      .toDF("iid", "st", "en", "k")
      .select(col("iid"), to_timestamp(col("st")).as("st"),
        to_timestamp(col("en")).as("en"), col("k"))
    // bin much smaller than the interval: it spans 4 bins; every
    // matching pair must still appear exactly once
    val out = RangeJoin.pointInInterval(pts, "pt", ivs, "st", "en",
      Seq("k"), binMicros = 15L * 60L * 1000000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq == Seq((1L, 100L), (2L, 100L)))
  }

  test("range join: empty/inverted intervals drop; no key columns " +
    "means a pure temporal join") {
    import spark.implicits._
    val pts = Seq((1L, "2024-01-01 00:30:00"))
      .toDF("pid", "pt").select(col("pid"), to_timestamp(col("pt")).as("pt"))
    val ivs = Seq((100L, "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
      (101L, "2024-01-01 01:00:00", "2024-01-01 01:00:00"), // empty
      (102L, "2024-01-01 02:00:00", "2024-01-01 01:00:00")) // inverted
      .toDF("iid", "st", "en")
      .select(col("iid"), to_timestamp(col("st")).as("st"),
        to_timestamp(col("en")).as("en"))
    val out = RangeJoin.pointInInterval(pts, "pt", ivs, "st", "en",
      Nil, binMicros = 3600L * 1000000L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 100L)))
  }

  test("interval overlap: touching endpoints don't overlap (half-open); " +
    "a pair sharing many bins appears exactly once") {
    import spark.implicits._
    def ivs(rows: (Long, String, String)*) = rows
      .toDF("iid", "st", "en")
      .select(col("iid"), to_timestamp(col("st")).as("st"),
        to_timestamp(col("en")).as("en"))
    val a = ivs((1L, "2024-01-01 00:00:00", "2024-01-01 06:00:00"),
      (2L, "2024-01-01 08:00:00", "2024-01-01 09:00:00"))
      .withColumnRenamed("iid", "aid")
      .withColumnRenamed("st", "a_st").withColumnRenamed("en", "a_en")
    val b = ivs((10L, "2024-01-01 05:59:59", "2024-01-01 07:00:00"),
      (11L, "2024-01-01 06:00:00", "2024-01-01 08:00:00"), // touches 1
      (12L, "2023-12-31 20:00:00", "2024-01-01 12:00:00")) // spans all
      .withColumnRenamed("iid", "bid")
      .withColumnRenamed("st", "b_st").withColumnRenamed("en", "b_en")
    // tiny bins: interval 12 spans 16 hours = 64 quarter-hour bins —
    // the anchor-bin rule must still emit each pair exactly once
    val out = graft.operators.RangeJoin.intervalOverlap(
      a, "a_st", "a_en", b, "b_st", "b_en", Nil,
      binMicros = 15L * 60 * 1000000)
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.sorted.toSeq == Seq((1L, 10L), (1L, 12L), (2L, 12L)))
  }

  test("range join matches the non-equi-join oracle on events (sf0.001)") {
    val got = Queries.rangeJoin(spark, "/root/testdata/sf0.001")
      .select("click_id", "error_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    ev.createOrReplaceTempView("ev_range")
    val want = spark.sql(
      """SELECT c.event_id AS click_id, e.event_id AS error_id
        |FROM ev_range c JOIN ev_range e
        |  ON c.user_id = e.user_id
        |  AND c.event_type = 'click' AND e.event_type = 'error'
        |  AND c.ts >= e.ts AND c.ts < e.ts + INTERVAL 1 DAY""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == want.toSeq)
    assert(got.nonEmpty)
  }

  test("as-of plan: one exchange per side, no nested-loop join") {
    val l = left((1L, "2024-01-01 10:00:00", 7L))
    val r = right((10L, "2024-01-01 09:30:00", 7L))
    val plan = AsOfJoin.join(l, r, "k", "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("broadcastJoin matches join() on a randomized fixture — both " +
    "directions, with and without tolerance, nulls included") {
    val rnd = new scala.util.Random(42)
    val l = left((1 to 200).map(i =>
      (i.toLong, f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00",
        (i % 7).toLong)): _*)
      // null key AND null time rows must behave identically (left
      // join keeps them, nothing matches)
      .unionByName(left((900L, "2024-01-01 12:00:00", 7L))
        .select(col("lid"), col("lt"), lit(null).cast("long").as("k")))
      .unionByName(left((901L, "2024-01-01 12:00:00", 5L))
        .select(col("lid"), lit(null).cast("timestamp").as("lt"), col("k")))
    val r = right((1 to 60).map(i =>
      (100L + i, f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00",
        (i % 7).toLong)): _*)
    for (dir <- Seq("backward", "forward");
         tol <- Seq(None, Some(3600L * 1000000L))) {
      val viaMerge = AsOfJoin.join(l, r, Seq("k"), "lt", "rt", dir, tol)
        .collect().map(_.toSeq).toSet
      val viaBroadcast = AsOfJoin.broadcastJoin(l, r, Seq("k"), "lt", "rt",
        dir, tol)
        .collect().map(_.toSeq).toSet
      assert(viaBroadcast == viaMerge, s"dir=$dir tol=$tol")
    }
  }

  test("broadcastJoin never shuffles the fact side") {
    val l = left((1L, "2024-01-01 10:00:00", 7L))
    val r = right((10L, "2024-01-01 09:30:00", 7L))
    val plan = AsOfJoin.broadcastJoin(l, r, Seq("k"), "lt", "rt")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("broadcastJoin equal-time ties pick join()'s winner") {
    val l = left((1L, "2024-01-01 10:00:00", 7L))
    val r = right((10L, "2024-01-01 10:00:00", 7L),
      (11L, "2024-01-01 10:00:00", 7L))
    for (dir <- Seq("backward", "forward")) {
      val m = AsOfJoin.join(l, r, Seq("k"), "lt", "rt", dir, None)
        .collect().head.getLong(3)
      val b = AsOfJoin.broadcastJoin(l, r, Seq("k"), "lt", "rt", dir, None)
        .collect().head.getLong(3)
      assert(b == m, s"dir=$dir: broadcast picked $b, merge picked $m")
    }
  }

  test("broadcastJoin refuses an oversized right side") {
    val l = left((1L, "2024-01-01 10:00:00", 7L))
    val r = right((1 to 50).map(i =>
      (i.toLong, "2024-01-01 09:00:00", 7L)): _*)
    intercept[IllegalArgumentException] {
      AsOfJoin.broadcastJoin(l, r, Seq("k"), "lt", "rt",
        maxRightRows = 10)
    }
  }

  test("float keys: -0.0 and 0.0 are the same key in both the merge " +
    "and broadcast paths (SQL join equality)") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-01 10:00:00", -0.0d))
      .toDF("lid", "lt", "fk")
      .select(col("lid"), to_timestamp(col("lt")).as("lt"), col("fk"))
    val r = Seq((10L, "2024-01-01 09:00:00", 0.0d))
      .toDF("rid", "rt", "fk")
      .select(col("rid"), to_timestamp(col("rt")).as("rt"), col("fk"))
    val merge = AsOfJoin.join(l, r, Seq("fk"), "lt", "rt",
      "backward", None).collect()
    assert(merge.length == 1 && merge(0).getLong(3) == 10L,
      s"merge path missed the -0.0/0.0 match: ${merge.toSeq}")
    val bcast = AsOfJoin.broadcastJoin(l, r, Seq("fk"), "lt", "rt",
      "backward", None).collect()
    assert(bcast.length == 1 && bcast(0).getLong(3) == 10L,
      s"broadcast path missed the -0.0/0.0 match: ${bcast.toSeq}")
  }

  test("struct keys containing binary match by value in broadcastJoin " +
    "(Row.hashCode has no byte-array special case)") {
    import spark.implicits._
    val l = Seq((1L, "2024-01-01 10:00:00", Array[Byte](1, 2)))
      .toDF("lid", "lt", "kb")
      .select(col("lid"), to_timestamp(col("lt")).as("lt"),
        struct(col("kb")).as("ks"))
    val r = Seq((10L, "2024-01-01 09:00:00", Array[Byte](1, 2)))
      .toDF("rid", "rt", "kb")
      .select(col("rid"), to_timestamp(col("rt")).as("rt"),
        struct(col("kb")).as("ks"))
    val out = AsOfJoin.broadcastJoin(l, r, Seq("ks"), "lt", "rt",
      "backward", None).collect()
    assert(out.length == 1 && out(0).getLong(3) == 10L,
      s"nested-binary key missed: ${out.toSeq}")
  }

  test("range join fail-fasts: a sentinel interval spanning >= MaxBins " +
    "raises an actionable error; a _bin input column is rejected") {
    import spark.implicits._
    val p = Seq((1L, "2024-01-01 10:00:00", 7L)).toDF("pid", "pt", "k")
      .select(col("pid"), to_timestamp(col("pt")).as("pt"), col("k"))
    val iv = Seq((20L, "2024-01-01 00:00:00", "9999-12-31 00:00:00", 7L))
      .toDF("ivid", "st", "en", "k")
      .select(col("ivid"), to_timestamp(col("st")).as("st"),
        to_timestamp(col("en")).as("en"), col("k"))
    val e = intercept[Exception] {
      RangeJoin.pointInInterval(p, "pt", iv, "st", "en", Seq("k"),
        binMicros = 3600L * 1000000L).collect()
    }
    def rootMsg(x: Throwable): String = {
      var c: Throwable = x
      while (c.getCause != null) c = c.getCause
      Option(c.getMessage).getOrElse(x.getMessage)
    }
    assert((rootMsg(e) + e.getMessage).contains("bins"),
      s"unexpected error: ${e.getMessage}")
    val withBin = p.withColumn("_bin", lit(1L))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(withBin, "pt", iv, "st", "en", Seq("k"),
        binMicros = 3600L * 1000000L)
    }
  }
}
