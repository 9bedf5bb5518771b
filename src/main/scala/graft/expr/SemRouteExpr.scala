package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Two-level cell router for [[graft.llm.Similarity.semanticDedup]]'s
  * large-k path: rank coarse centroids by (−dot, id), probe the
  * `wc` nearest coarse cells, and return the `topN` GLOBAL fine-cell
  * ids among those cells' owned fine centroids, ranked by
  * (−dot, global id) — the same deterministic (score, id) ordering as
  * the flat `slice(array_sort(...))` assignment, restricted to the
  * probed candidate set. Per-row cost is O(kc + wc·k/kc) ≈ O(√k)
  * dot products instead of the flat O(k) — the difference between a
  * feasible and an infeasible assignment pass once cells scale with
  * the corpus (k ∝ n keeps in-cell density constant; this keeps the
  * router sub-linear in k). Scores accumulate left-to-right per
  * dimension (the vec_dot order). A null vector, a null element, or a
  * dimension mismatch yields NULL (the row gets no cells — the
  * fail-closed explode, matching the flat path's behavior on
  * malformed vectors). NaN dots are SKIPPED as candidates (treated
  * as −infinity similarity): a NaN never enters the top-n buffer, so
  * a NaN centroid — possible only if Lloyd's trained on NaN data —
  * can never permanently occupy slot 0 of every row's buffer and
  * funnel the whole corpus into one O(n²) mega-cell (r13 ADVICE
  * find). A NaN-element VECTOR NaN-dots every centroid, routes to
  * zero cells, and is dropped by the explode — harmless, since the
  * pair stage's nanvl cosine guard already guaranteed it could never
  * produce an edge; it exits as its own self-representative. */
final class SemRouter(val coarse: Array[Array[Double]],
                      val fine: Array[Array[Double]],
                      val owned: Array[Array[Int]],
                      val wc: Int, val topN: Int) extends Serializable {

  private def dot(vec: ArrayData, c: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < c.length) { s += vec.getDouble(i) * c(i); i += 1 }
    s
  }

  /** topN (score, id)-smallest ids among `cands` (id order broken by
    * smaller id on equal score) — insertion into a tiny sorted
    * buffer; n is 1-4 in practice. */
  private def topIds(vec: ArrayData, cands: Iterator[Int],
                     centroids: Array[Array[Double]], n: Int): Array[Int] = {
    val ids = new Array[Int](n)
    val scores = new Array[Double](n)
    var size = 0
    while (cands.hasNext) {
      val id = cands.next()
      val s = -dot(vec, centroids(id))
      // NaN is not a score: every comparison against it is false, so
      // a buffered NaN could never be displaced or scanned past —
      // skip the candidate entirely (see class doc)
      if (!java.lang.Double.isNaN(s)) {
        var pos = size
        while (pos > 0 && (scores(pos - 1) > s ||
          (scores(pos - 1) == s && ids(pos - 1) > id))) pos -= 1
        if (pos < n) {
          val last = math.min(size, n - 1)
          var j = last
          while (j > pos) { ids(j) = ids(j - 1); scores(j) = scores(j - 1); j -= 1 }
          ids(pos) = id; scores(pos) = s
          if (size < n) size += 1
        }
      }
    }
    java.util.Arrays.copyOf(ids, size)
  }

  def route(vec: ArrayData): ArrayData = {
    if (vec == null) return null
    val d = coarse(0).length
    // strict != (not just <): a LONGER vector would silently truncate
    // here while the flat path dots the full array — the two gated
    // paths must agree on malformed-dimension corpora (fail closed)
    if (vec.numElements() != d) return null
    var i = 0
    while (i < d) { if (vec.isNullAt(i)) return null; i += 1 }
    val cTop = topIds(vec, Iterator.range(0, coarse.length), coarse, wc)
    val cands = cTop.iterator.flatMap(c => owned(c).iterator)
    new GenericArrayData(topIds(vec, cands, fine, topN))
  }
}

/** `vec → array<int>` of routed global cell ids (see [[SemRouter]]).
  * The router tensors ride as a reference object — one broadcast
  * literal, zero per-row plan weight, full codegen. */
case class SemRouteExpr(child: Expression, router: SemRouter)
  extends UnaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else router.route(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val r = ctx.addReferenceObj("semRouter", router,
      classOf[SemRouter].getName)
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${c.isNull}) {
          ${ev.value} = $r.route(${c.value});
          ${ev.isNull} = ${ev.value} == null;
        }""")
  }

  override protected def withNewChildInternal(newChild: Expression)
  : Expression = copy(child = newChild)
}
