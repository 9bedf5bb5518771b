package graft

import graft.expr.SemRouter
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

/** Pure unit tests of the two-level cell router's hostile-input
  * envelope (r13 ADVICE finds): a NaN centroid must never capture the
  * corpus, and malformed-dimension vectors must fail closed. */
class SemRouterSpec extends AnyFunSuite {

  private def arr(xs: Double*) = new GenericArrayData(xs.toArray)

  // coarse 0 is a poisoned (NaN) centroid, coarse 1 is real; fine cell
  // 0 is poisoned, 1 and 2 are real — the exact shape a NaN-trained
  // Lloyd's would produce
  private val router = new SemRouter(
    coarse = Array(Array(Double.NaN, Double.NaN), Array(1.0, 0.0)),
    fine = Array(Array(Double.NaN, Double.NaN), Array(1.0, 0.0),
      Array(0.0, 1.0)),
    owned = Array(Array(0), Array(1, 2)),
    wc = 2, topN = 2)

  test("a NaN centroid never enters the probe or cell buffer") {
    val cells = router.route(arr(1.0, 0.0)).toIntArray().toSeq
    // without the NaN skip, cell 0 (NaN) permanently occupies slot 0
    // of every buffer and with topN=1 would be the ONLY routed cell
    assert(cells == Seq(1, 2), s"routed $cells")
  }

  test("a NaN-element vector routes to zero cells (all dots NaN)") {
    val cells = router.route(arr(Double.NaN, 1.0))
    assert(cells != null && cells.numElements() == 0)
  }

  test("dimension mismatch fails closed: longer AND shorter are null") {
    assert(router.route(arr(1.0, 0.0, 9.9)) == null, "longer truncated")
    assert(router.route(arr(1.0)) == null, "shorter accepted")
    assert(router.route(null) == null)
  }

  test("deterministic (score, id) order with ties broken by id") {
    // both fine cells dot to 0 against this vector — smaller id first
    val r = new SemRouter(
      coarse = Array(Array(1.0, 0.0)),
      fine = Array(Array(0.0, 1.0), Array(0.0, 1.0)),
      owned = Array(Array(0, 1)), wc = 1, topN = 2)
    assert(r.route(arr(1.0, 0.0)).toIntArray().toSeq == Seq(0, 1))
  }
}
