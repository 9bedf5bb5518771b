package graft

import graft.operators.SpatialJoin
import org.apache.spark.sql.functions._

/** Grid-binned point-in-box join ([[graft.operators.SpatialJoin]]). */
class SpatialJoinSpec extends SparkSuite {
  import spark.implicits._

  private lazy val points = Seq(
    (1L, 0.5, 0.5),    // inside box A only
    (2L, 5.0, 5.0),    // inside A and B (overlap region)
    (3L, -3.5, 2.0),   // inside C (negative coords)
    (4L, 100.0, 100.0) // inside nothing
  ).toDF("pid", "px", "py")

  private lazy val boxes = Seq(
    (10L, 0.0, 0.0, 6.0, 6.0),   // A
    (11L, 4.0, 4.0, 20.0, 20.0), // B — spans several 4.0 cells
    (12L, -5.0, 1.0, -1.0, 3.0), // C — fully negative x
    (13L, 50.0, 50.0, 40.0, 40.0) // inverted: matches nothing
  ).toDF("bid", "xmin", "ymin", "xmax", "ymax")

  private def pairs(cell: Double): Set[(Long, Long)] =
    SpatialJoin.pointInBox(points, boxes, "px", "py",
      "xmin", "ymin", "xmax", "ymax", cell)
      .select("pid", "bid").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  private val expected = Set((1L, 10L), (2L, 10L), (2L, 11L), (3L, 12L))

  test("matches the brute-force containment result") {
    assert(pairs(4.0) == expected)
  }

  test("cell size does not change the result (pairs meet exactly once)") {
    assert(pairs(0.7) == expected)
    assert(pairs(100.0) == expected)
  }

  test("boundary points on box edges are inclusive") {
    val p = Seq((9L, 6.0, 6.0)).toDF("pid", "px", "py")
    val out = SpatialJoin.pointInBox(p, boxes, "px", "py",
      "xmin", "ymin", "xmax", "ymax", 4.0)
      .select("bid").collect().map(_.getLong(0)).toSet
    assert(out == Set(10L, 11L)) // corner of A, interior of B
  }

  test("no duplicate pairs even when a box spans many cells") {
    val out = SpatialJoin.pointInBox(points, boxes, "px", "py",
      "xmin", "ymin", "xmax", "ymax", 1.0)
      .select("pid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == out.distinct.length)
  }

  test("plan is an equi hash join, not a nested loop") {
    val plan = SpatialJoin.pointInBox(points, boxes, "px", "py",
      "xmin", "ymin", "xmax", "ymax", 4.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }

  test("invalid cell size is rejected") {
    intercept[IllegalArgumentException](
      SpatialJoin.pointInBox(points, boxes, "px", "py",
        "xmin", "ymin", "xmax", "ymax", 0.0))
  }
}
