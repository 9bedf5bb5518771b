package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial point-in-box join via fixed grid binning — the 2D
  * generalization of [[RangeJoin]] (point-in-interval), and the
  * equi-join answer to "which granule footprints contain which query
  * points" that a naive engine writes as a quadratic
  * BroadcastNestedLoop over 4 inequality conjuncts.
  *
  * Scale shape: a point lands in exactly ONE grid cell
  * (floor-division binning); a box explodes row-locally to every cell
  * its extent overlaps (bounded by area/cell², pick `cellSize` near the
  * typical box size); the join is a hash equi-join on (cx, cy) with the
  * exact containment predicate as a residual filter. Because the
  * point's cell is unique, every matching pair meets in exactly one
  * cell — no dedup shuffle. Hot cells are ordinary hash-join skew,
  * which AQE splits.
  */
object SpatialJoin {

  /** Cells one box may span PER AXIS before the explode fails fast —
    * a degenerate world-spanning box must not silently explode to
    * millions of rows (the [[RangeJoin.MaxBins]] analogue; the 2D
    * blow-up is the per-axis product, so the axis cap keeps a single
    * box under cap² cells). */
  val MaxCellsPerAxis = 4096L

  /** Inner join of points to the boxes containing them (inclusive
    * bounds on all four edges).
    *
    * @param points   frame with `px`, `py` coordinate columns
    * @param boxes    frame with `xmin`, `ymin`, `xmax`, `ymax`
    * @param cellSize grid cell width in coordinate units
    * @return points ⋈ boxes rows (all columns of both inputs)
    */
  def pointInBox(
      points: DataFrame,
      boxes: DataFrame,
      px: String, py: String,
      xmin: String, ymin: String, xmax: String, ymax: String,
      cellSize: Double): DataFrame = {
    require(cellSize > 0, s"cellSize must be positive, got $cellSize")
    // cell coordinates are joined BY NAME — pre-existing __cx/__cy
    // would make the equi-join ambiguous or silently wrong
    val reserved = Seq("__cx", "__cy")
    val clash = (points.columns ++ boxes.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"pointInBox reserves columns ${reserved.mkString(",")}; " +
        s"rename ${clash.distinct.mkString(",")} in the inputs")
    // any OTHER shared name breaks the residual containment filter
    // (ambiguous reference) or silently duplicates output columns —
    // the same requireDisjoint contract as RangeJoin/AsOfJoin
    val shared = points.columns.toSet.intersect(boxes.columns.toSet)
    require(shared.isEmpty,
      s"rename box columns colliding with points: ${shared.mkString(",")}")
    val cell = lit(cellSize)
    val p = points
      .withColumn("__cx", floor(col(px) / cell))
      .withColumn("__cy", floor(col(py) / cell))
    // one axis of box cells, capped: an oversized box (degenerate
    // extent, cellSize far too small) fails fast with an actionable
    // message instead of a runaway multi-million-row explode
    def axisCells(lo: String, hi: String): org.apache.spark.sql.Column = {
      val a = floor(col(lo) / cell)
      val b = floor(col(hi) / cell)
      val guarded = when(b - a >= lit(MaxCellsPerAxis),
        expr("CAST(raise_error('graft spatial join: a box spans " +
          s"$MaxCellsPerAxis grid cells or more on one axis; raise " +
          "cellSize or split the box') AS BIGINT)"))
        .otherwise(b)
      explode(sequence(a, guarded))
    }
    // inverted boxes can match nothing: drop them BEFORE the explode
    // (sequence(a, b) with a > b would count DOWN, not produce empty)
    val b = boxes
      .where(col(xmin) <= col(xmax) && col(ymin) <= col(ymax))
      .withColumn("__cx", axisCells(xmin, xmax))
      .withColumn("__cy", axisCells(ymin, ymax))
    p.join(b, Seq("__cx", "__cy"))
      .where(col(px) >= col(xmin) && col(px) <= col(xmax) &&
        col(py) >= col(ymin) && col(py) <= col(ymax))
      .drop("__cx", "__cy")
  }
}
