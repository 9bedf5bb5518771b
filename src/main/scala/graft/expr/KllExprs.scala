package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (MRL/KLL-style compactor hierarchy):
  * approximate quantiles whose PARTIAL STATE is a storable binary
  * column — the quantile twin of [[Hll]].
  *
  *  - `kll_sketch(col[, k])`   → binary (levels of weighted samples)
  *  - `kll_merge(sketch)`      → binary (aggregate over sketches)
  *  - `kll_quantile(sketch, q)`→ double (scalar rank query)
  *
  * Structure: level i holds up to `k` values, each standing for 2^i
  * inputs. When a level fills, it is sorted and every other element
  * (alternating offset per level — the deterministic Munro-Paterson /
  * MRL compaction, not KLL's random coin: reproducible across runs)
  * is promoted to level i+1. Worst-case rank error is O(log(n/k)/k)
  * of n — at the default k=200 about 1% for corpus-scale inputs,
  * verified against exact percentiles in spec.
  *
  * Unlike the HLL register array, compaction depends on arrival order,
  * so sketch BYTES are not partition-independent — but rank-error
  * bounds hold under any split/merge order (each compaction discards
  * rank information symmetrically), which is the contract a 100 TB
  * pipeline needs: per-partition/day sketches persisted once, merged
  * later for any slice, never rescanning raw data. Spark's own
  * `approx_percentile` (GK) has the same order dependence and no
  * exposed sketch column.
  */
object Kll {
  val DefaultK = 200

  /** levels(i) = capacity-tracked buffer of level-i samples, each
    * standing for 2^i inputs; `sizes(i)` entries are live. */
  final class Sketch(val k: Int) {
    var levels: Array[Array[Double]] = Array(new Array[Double](k))
    var sizes: Array[Int] = Array(0)
    var parity: Array[Boolean] = Array(false)
    var count: Long = 0L

    def add(v: Double): Unit = {
      if (sizes(0) == levels(0).length)
        levels(0) = java.util.Arrays.copyOf(levels(0),
          math.max(k, levels(0).length * 2))
      levels(0)(sizes(0)) = v
      sizes(0) += 1
      count += 1
      if (sizes(0) >= k) compact()
    }

    private def ensureLevel(i: Int): Unit =
      if (i >= levels.length) {
        levels = levels :+ new Array[Double](k)
        sizes = sizes :+ 0
        parity = parity :+ false
      }

    private def appendTo(i: Int, src: Array[Double], srcLen: Int): Unit = {
      val need = sizes(i) + srcLen
      if (need > levels(i).length)
        levels(i) = java.util.Arrays.copyOf(levels(i),
          math.max(need, levels(i).length * 2))
      System.arraycopy(src, 0, levels(i), sizes(i), srcLen)
      sizes(i) = need
    }

    /** Sweep every over-full level bottom-up (a merge can overfill
      * several levels at once, not just level 0). */
    private def compact(): Unit = {
      var i = 0
      while (i < levels.length) {
        if (sizes(i) >= k) {
          ensureLevel(i + 1)
          val n = sizes(i)
          val buf = java.util.Arrays.copyOf(levels(i), n)
          java.util.Arrays.sort(buf)
          // alternating offset: deterministic Munro-Paterson/MRL
          // compaction, unbiased over successive rounds
          val off = if (parity(i)) 1 else 0
          parity(i) = !parity(i)
          val m = n / 2
          // odd leftover keeps the total weight exact
          if (n % 2 == 1) {
            levels(i)(0) = if (off == 0) buf(n - 1) else buf(0)
            sizes(i) = 1
          } else sizes(i) = 0
          val promoted = Array.tabulate(m)(j => buf(2 * j + off))
          appendTo(i + 1, promoted, m)
        }
        i += 1
      }
    }

    def merge(other: Sketch): Unit = {
      require(other.k == k, s"kll: k mismatch ($k vs ${other.k})")
      var i = 0
      while (i < other.levels.length) {
        ensureLevel(i)
        appendTo(i, other.levels(i), other.sizes(i))
        i += 1
      }
      count += other.count
      compact()
    }

    /** Quantile by weighted rank over all retained samples. */
    def quantile(q: Double): Double = quantiles(Seq(q)).head

    /** Several quantiles from ONE flatten+sort pass (the per-call sort
      * dominates rank queries; callers asking for p50/p90/p99 per
      * trigger should not pay it three times). */
    def quantiles(qs: Seq[Double]): Seq[Double] = {
      qs.foreach(q =>
        require(q >= 0.0 && q <= 1.0, s"quantile out of [0,1]: $q"))
      val n = sizes.sum
      if (n == 0) return qs.map(_ => Double.NaN)
      val vals = new Array[Double](n)
      val ws = new Array[Long](n)
      var idx = 0
      levels.indices.foreach { i =>
        val w = 1L << i
        var j = 0
        while (j < sizes(i)) { vals(idx) = levels(i)(j); ws(idx) = w; idx += 1; j += 1 }
      }
      // sort both arrays by value (indirect sort via index permutation)
      val order = Array.range(0, n).sortBy(vals(_))
      val total = ws.sum
      qs.map { q =>
        val target = q * (total - 1)
        var acc = 0L
        var j = 0
        var out = vals(order(n - 1))
        var done = false
        while (j < n && !done) {
          acc += ws(order(j))
          if (acc - 1 >= target) { out = vals(order(j)); done = true }
          j += 1
        }
        out
      }
    }

    def serialize: Array[Byte] = {
      val n = sizes.sum
      val bb = java.nio.ByteBuffer.allocate(
        4 + 8 + 4 + levels.length * (4 + 1) + n * 8)
      bb.putInt(k); bb.putLong(count); bb.putInt(levels.length)
      levels.indices.foreach { i =>
        bb.putInt(sizes(i))
        bb.put(if (parity(i)) 1.toByte else 0.toByte)
        (0 until sizes(i)).foreach(j => bb.putDouble(levels(i)(j)))
      }
      bb.array()
    }
  }

  /** Fails fast on bytes that are not a KLL sketch (like the CMS/HLL
    * siblings): every header field is bounds-checked BEFORE its
    * allocation, and every level length against the remaining
    * payload — garbage bytes must raise, never allocate gigabytes
    * (`new Array(2^30)`) or parse junk doubles into plausible but
    * wrong quantiles. */
  def deserialize(bytes: Array[Byte]): Sketch = {
    require(bytes.length >= 16, s"kll: corrupt sketch (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val k = bb.getInt
    require(k >= 8 && k <= 65536, s"kll: corrupt sketch (k=$k)")
    val s = new Sketch(k)
    s.count = bb.getLong
    require(s.count >= 0, s"kll: corrupt sketch (count=${s.count})")
    val nLevels = bb.getInt
    require(nLevels >= 0 && nLevels <= 64,
      s"kll: corrupt sketch (nLevels=$nLevels)")
    s.levels = new Array[Array[Double]](nLevels)
    s.sizes = new Array[Int](nLevels)
    s.parity = new Array[Boolean](nLevels)
    (0 until nLevels).foreach { i =>
      val len = bb.getInt
      require(len >= 0 && 1L + 8L * len <= bb.remaining(),
        s"kll: corrupt sketch (level $i length $len, " +
          s"${bb.remaining()} bytes left)")
      s.parity(i) = bb.get() == 1
      s.levels(i) = Array.fill(len)(bb.getDouble)
      s.sizes(i) = len
    }
    s
  }
}

abstract class KllAggBase extends TypedImperativeAggregate[Kll.Sketch] {
  def k: Int
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType
  override def createAggregationBuffer(): Kll.Sketch = {
    require(k >= 8 && k <= 65536, s"kll k out of [8, 65536]: $k")
    new Kll.Sketch(k)
  }
  // an empty buffer adopts the other side wholesale (also adopts its k,
  // so kll_merge partials built at the default k cannot clash with
  // sketches built at a non-default k)
  override def merge(buffer: Kll.Sketch, other: Kll.Sketch): Kll.Sketch =
    if (other.count == 0) buffer
    else if (buffer.count == 0) other
    else { buffer.merge(other); buffer }
  override def eval(buffer: Kll.Sketch): Any =
    if (buffer.count == 0) null else buffer.serialize
  override def serialize(buffer: Kll.Sketch): Array[Byte] = buffer.serialize
  override def deserialize(bytes: Array[Byte]): Kll.Sketch =
    Kll.deserialize(bytes)
}

/** `kll_sketch(col[, k])` — build the quantile sketch (input cast to
  * double; nulls and NaNs ignored). */
case class KllSketchAgg(
    child: Expression,
    k: Int = Kll.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def children: Seq[Expression] = Seq(child)

  // k range at ANALYSIS time (see HllSketchAgg): a bad k otherwise
  // launches the job and fails every task at first
  // createAggregationBuffer
  override def checkInputDataTypes(): TypeCheckResult =
    if (k < 8 || k > 65536)
      TypeCheckResult.TypeCheckFailure(s"kll k out of [8, 65536]: $k")
    else if (child.dataType.isInstanceOf[NumericType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_sketch expects a numeric column, got ${child.dataType}")

  override def update(buffer: Kll.Sketch, input: InternalRow): Kll.Sketch = {
    val v = child.eval(input)
    if (v != null) {
      val d = v match {
        case d: Double => d
        case f: Float => f.toDouble
        case l: Long => l.toDouble
        case i: Int => i.toDouble
        case s: Short => s.toDouble
        case b: Byte => b.toDouble
        case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
        case other => throw new IllegalArgumentException(
          s"kll_sketch: non-numeric input ${other.getClass.getSimpleName}")
      }
      if (!d.isNaN) buffer.add(d)
    }
    buffer
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `kll_merge(sketch)` — union pre-built sketches. */
case class KllMergeAgg(
    child: Expression,
    k: Int = Kll.DefaultK,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends KllAggBase {

  override def children: Seq[Expression] = Seq(child)

  // sketch bytes in, at ANALYSIS time — a non-binary child otherwise
  // surfaces as a per-task ClassCastException after job launch
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"kll_merge expects a binary sketch column, got ${child.dataType}")

  // an empty buffer adopts the first input sketch's k rather than
  // assuming the default precision
  override def update(buffer: Kll.Sketch, input: InternalRow): Kll.Sketch = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val in = Kll.deserialize(v.asInstanceOf[Array[Byte]])
      merge(buffer, in)
    }
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `kll_quantile(sketch, q)` — scalar quantile query on a sketch. */
case class KllQuantileExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  // accept any numeric rank argument (SQL parses `0.5` as DECIMAL(1,1);
  // demanding DoubleType would force the non-obvious `0.5d` suffix)
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType &&
        right.dataType.isInstanceOf[NumericType])
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"kll_quantile expects (binary sketch, numeric rank), got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(sk: Any, q: Any): Any = {
    val rank = q match {
      case d: Double => d
      case f: Float => f.toDouble
      case dec: org.apache.spark.sql.types.Decimal => dec.toDouble
      case n: Number => n.doubleValue()
    }
    Kll.deserialize(sk.asInstanceOf[Array[Byte]]).quantile(rank)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
