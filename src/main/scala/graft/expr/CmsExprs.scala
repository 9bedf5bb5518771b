package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch: approximate FREQUENCIES whose partial state is a
  * first-class, storable column — the frequency-counting sibling of
  * the [[Hll]] (distinct) and [[Kll]] (quantile) families.
  *
  * Spark ships `count_min_sketch(...)` but its sketch is an opaque
  * spark-internal blob with no merge aggregate or point-query
  * expression at the SQL layer; this family exposes all three, so an
  * incremental 100 TB pipeline can sketch each day/source ONCE and
  * answer any cross-slice frequency query by merging stored sketches:
  *
  *  - `cms_sketch(col[, depth, width])` → binary (depth x width counts)
  *  - `cms_merge(sketch)`               → binary (cell-wise sum, aggregate)
  *  - `cms_estimate(sketch, item)`      → bigint (min over rows)
  *
  * Guarantees (Cormode & Muthukrishnan 2005): estimate >= true count
  * always; estimate <= true count + (e/width)·N with probability
  * 1 − exp(−depth), N = total updates. Cell-wise ADD is commutative
  * and associative, so one merge serves Catalyst partial aggregation
  * and cross-table unions, and sketch bytes are identical regardless
  * of partitioning or input order — asserted in spec.
  *
  * Buffer layout: Array[Long] of 2 + depth*width — [0]=depth,
  * [1]=width, then row-major cells. Serialized big-endian via
  * ByteBuffer (8 bytes/cell; default 5x2048 ≈ 80 KiB — one sketch per
  * GROUP, not per row, so size is a non-issue at any scale).
  */
object Cms {
  val DefaultDepth = 5
  val DefaultWidth = 2048

  /** Row-i hash: same input canonicalization as [[Hll.hash]], with a
    * per-row seed so the depth rows are independent. */
  def hash(v: Any, row: Int): Long = {
    val seed = 42L + row * 0x9E3779B97F4A7C15L
    v match {
      case l: Long => XXH64.hashLong(l, seed)
      case i: Int => XXH64.hashLong(i.toLong, seed)
      // narrower integral widths canonicalize to the SAME hash as
      // their widened value — a sketch built over a SMALLINT column
      // must agree with an INT/BIGINT probe of the same values
      case s: Short => XXH64.hashLong(s.toLong, seed)
      case b: Byte => XXH64.hashLong(b.toLong, seed)
      case s: UTF8String =>
        XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
      case b: Array[Byte] =>
        XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, seed)
      case other =>
        val bytes = other.toString.getBytes("UTF-8")
        XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, seed)
    }
  }

  def empty(depth: Int, width: Int): Array[Long] = {
    require(depth >= 1 && depth <= 16, s"cms depth out of [1,16]: $depth")
    require(width >= 16 && width <= (1 << 24), s"cms width out of [16,2^24]: $width")
    // serialized size is (2 + d·w)·8 bytes and must fit one byte array
    require(2L + depth.toLong * width <= Int.MaxValue / 8,
      s"cms shape ${depth}x$width serializes past 2 GiB")
    val buf = new Array[Long](2 + depth * width)
    buf(0) = depth; buf(1) = width
    buf
  }

  def add(buf: Array[Long], v: Any): Unit = {
    val depth = buf(0).toInt; val width = buf(1).toInt
    var r = 0
    while (r < depth) {
      val idx = java.lang.Math.floorMod(hash(v, r), width.toLong).toInt
      buf(2 + r * width + idx) += 1L
      r += 1
    }
  }

  def estimate(buf: Array[Long], v: Any): Long = {
    val depth = buf(0).toInt; val width = buf(1).toInt
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = buf(2 + r * width + java.lang.Math.floorMod(hash(v, r), width.toLong).toInt)
      if (c < min) min = c
      r += 1
    }
    min
  }

  def merge(into: Array[Long], from: Array[Long]): Unit = {
    require(into(0) == from(0) && into(1) == from(1),
      s"cms: shape mismatch (${into(0)}x${into(1)} vs ${from(0)}x${from(1)})")
    var i = 2
    while (i < into.length) { into(i) += from(i); i += 1 }
  }

  def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8) // fits: see empty()
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  /** Point estimate straight off the serialized bytes — reads only the
    * header and `depth` cells, no Array[Long] copy. The per-row path
    * of [[CmsEstimateExpr]]: probing a stored sketch against an item
    * column must not copy the whole sketch per row. */
  def estimateBytes(bytes: Array[Byte], v: Any): Long = {
    require(bytes.length >= 24 && bytes.length % 8 == 0,
      s"cms: not a sketch (${bytes.length} bytes)")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val depth = bb.getLong(0).toInt
    val width = bb.getLong(8).toInt
    require(depth >= 1 && width >= 16 &&
      bytes.length == (2L + depth.toLong * width) * 8,
      s"cms: corrupt header (${depth}x$width for ${bytes.length} bytes)")
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      val idx = java.lang.Math.floorMod(hash(v, r), width.toLong).toInt
      val c = bb.getLong(((2L + r.toLong * width + idx) * 8L).toInt)
      if (c < min) min = c
      r += 1
    }
    min
  }

  def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length >= 16 && bytes.length % 8 == 0,
      s"cms: not a sketch (${bytes.length} bytes)")
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    require(out(0) >= 1 && out(1) >= 16 && out.length == 2 + out(0) * out(1),
      s"cms: corrupt header (${out(0)}x${out(1)} for ${out.length - 2} cells)")
    out
  }

  /** Inner-product join-size estimate over two same-shape sketches:
    * min over depth rows of the counter-row dot product. One-sided —
    * never below the true Σ_k f_A(k)·f_B(k) (same seeds put matching
    * keys in matching cells; hash collisions only add). */
  def joinSizeBytes(a: Array[Byte], b: Array[Byte]): Long = {
    val sa = deserialize(a); val sb = deserialize(b)
    require(sa(0) == sb(0) && sa(1) == sb(1),
      s"cms_join_size: shape mismatch (${sa(0)}x${sa(1)} vs ${sb(0)}x${sb(1)})")
    val depth = sa(0).toInt; val width = sa(1).toInt
    var min = Long.MaxValue
    var r = 0
    while (r < depth) {
      // accumulate in double, saturate to Long.MaxValue: one hot key
      // at ~3e9 in both tables makes a single cell product overflow
      // a Long, and a wrapped-negative dot would win the min — the
      // exact skew case a join-size planner exists for. Doubles are
      // exact through 2^53 (far beyond any realistic estimate) and
      // saturation preserves the one-sided >= guarantee.
      var dot = 0.0
      var w = 0
      val base = 2 + r * width
      while (w < width) {
        dot += sa(base + w).toDouble * sb(base + w).toDouble; w += 1
      }
      val capped =
        if (dot >= Long.MaxValue.toDouble) Long.MaxValue else dot.toLong
      if (capped < min) min = capped
      r += 1
    }
    min
  }
}

abstract class CmsAggBase extends TypedImperativeAggregate[Array[Long]] {
  override def dataType: DataType = BinaryType
  override def serialize(buffer: Array[Long]): Array[Byte] = Cms.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] = Cms.deserialize(bytes)
}

/** `cms_sketch(col[, depth, width])` — build a frequency sketch of the
  * column's values. */
case class CmsSketchAgg(
    child: Expression,
    depth: Int = Cms.DefaultDepth,
    width: Int = Cms.DefaultWidth,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CmsAggBase {

  override def children: Seq[Expression] = Seq(child)

  // parameter ranges at ANALYSIS time (see HllSketchAgg): a bad
  // shape otherwise launches the job and fails every task at first
  // createAggregationBuffer
  override def checkInputDataTypes(): TypeCheckResult =
    if (depth < 1 || depth > 16)
      TypeCheckResult.TypeCheckFailure(s"cms depth out of [1,16]: $depth")
    else if (width < 16 || width > (1 << 24))
      TypeCheckResult.TypeCheckFailure(s"cms width out of [16,2^24]: $width")
    else TypeCheckResult.TypeCheckSuccess
  override def nullable: Boolean = false
  // NOTE: shape validation lives here, not the constructor — subclass
  // fields are unset during executor-side Java deserialization of the
  // TypedImperativeAggregate base (same hazard as HllAggBase).
  override def createAggregationBuffer(): Array[Long] = Cms.empty(depth, width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) Cms.add(buffer, v)
    buffer
  }
  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    Cms.merge(buffer, other); buffer
  }
  override def eval(buffer: Array[Long]): Any = Cms.serialize(buffer)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cms_merge(sketch)` — cell-wise sum of pre-built sketches. The
  * buffer adopts the FIRST input sketch's shape (so any depth/width
  * merges correctly); mixed shapes in one group fail fast. */
case class CmsMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends CmsAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true // all-null group → null sketch
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_merge expects a binary sketch, got ${child.dataType}")
  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def fold(buffer: Array[Long], sk: Array[Long]): Array[Long] =
    if (sk.isEmpty) buffer
    else if (buffer.isEmpty) sk.clone()
    else { Cms.merge(buffer, sk); buffer }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else fold(buffer, Cms.deserialize(v.asInstanceOf[Array[Byte]]))
  }
  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    fold(buffer, other)
  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null else Cms.serialize(buffer)
  override def serialize(buffer: Array[Long]): Array[Byte] =
    if (buffer.isEmpty) Array.emptyByteArray else Cms.serialize(buffer)
  override def deserialize(bytes: Array[Byte]): Array[Long] =
    if (bytes.isEmpty) Array.emptyLongArray else Cms.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmsMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `cms_estimate(sketch, item)` — point frequency estimate: min over
  * the sketch's depth rows at the item's hashed cells. */
case class CmsEstimateExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary sketch, item), got ${left.dataType}")

  override protected def nullSafeEval(sk: Any, item: Any): Any =
    Cms.estimateBytes(sk.asInstanceOf[Array[Byte]], item)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `cms_join_size(sketchA, sketchB)` — inner-product join-cardinality
  * estimate (Alon–Matias–Szegedy / Cormode–Muthukrishnan): for two
  * CMS sketches of the join-key columns of A and B (same depth/width/
  * seeds — the defaults guarantee this), `min over rows r of
  * Σ_w a[r][w]·b[r][w]` estimates `|A ⋈ B| = Σ_k f_A(k)·f_B(k)`,
  * NEVER undercounting (every true pair lands in matching cells;
  * collisions only add). The planner primitive: persist per-slice
  * key sketches once, size any prospective join later WITHOUT
  * touching either table.
  */
case class CmsJoinSizeExpr(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_join_size expects two binary sketches, got " +
        s"(${left.dataType}, ${right.dataType})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    Cms.joinSizeBytes(a.asInstanceOf[Array[Byte]],
      b.asInstanceOf[Array[Byte]])

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
