package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog sketch support: distinct counting whose PARTIAL STATE is
  * a first-class, storable column.
  *
  * Spark's own `approx_count_distinct` computes an HLL++ under the hood
  * but never exposes the sketch — you cannot persist per-partition
  * sketches and union them later, which is exactly what an incremental
  * 100 TB pipeline wants (count distinct users per day ONCE, then answer
  * any date-range distinct query by unioning the daily sketches instead
  * of rescanning raw data — the DataSketches / Delta pattern).
  *
  *  - `hll_sketch(col[, p])`  → binary: dense HLL registers (2^p bytes)
  *  - `graft_hll_union(sketch)`     → binary: register-wise max (aggregate)
  *  - `hll_estimate(sketch)`  → bigint: cardinality estimate (scalar)
  *
  * Register-wise max is idempotent/commutative/associative, so the same
  * merge serves Catalyst's partial aggregation and cross-table unions;
  * sketch bytes are bit-identical regardless of partitioning or input
  * order (update is a max too) — asserted in spec.
  */
object Hll {
  val DefaultP = 12 // 4096 registers ≈ 1.6% relative standard error

  def hash(v: Any): Long = v match {
    case l: Long => XXH64.hashLong(l, 42L)
    case i: Int => XXH64.hashLong(i.toLong, 42L)
    // narrower integral widths canonicalize to the SAME hash as
    // their widened value — sketches over SMALLINT/TINYINT columns
    // must union/probe consistently with INT/BIGINT twins
    case s: Short => XXH64.hashLong(s.toLong, 42L)
    case b: Byte => XXH64.hashLong(b.toLong, 42L)
    case s: UTF8String =>
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
    case b: Array[Byte] =>
      XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    case other =>
      val bytes = other.toString.getBytes("UTF-8")
      XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, 42L)
  }

  /** Fold one hashed value into the register array (mutates). */
  def add(registers: Array[Byte], hash: Long): Unit = {
    val p = Integer.numberOfTrailingZeros(registers.length)
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    // rank of the first 1-bit in the remaining 64-p bits, 1-based;
    // w == 0 means all remaining bits are zero → max rank
    val rank = if (w == 0) (64 - p + 1) else java.lang.Long.numberOfLeadingZeros(w) + 1
    if (rank > (registers(idx) & 0xff)) registers(idx) = rank.toByte
  }

  def merge(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into.length == from.length,
      s"hll: precision mismatch (${into.length} vs ${from.length} registers)")
    var i = 0
    while (i < into.length) {
      if ((from(i) & 0xff) > (into(i) & 0xff)) into(i) = from(i)
      i += 1
    }
  }

  /** Standard HLL estimator with linear-counting small-range correction.
    * (64-bit hash ⇒ no large-range correction needed.) */
  def estimate(registers: Array[Byte]): Long = {
    require(registers.length >= 16 &&
      Integer.bitCount(registers.length) == 1,
      s"hll: not a sketch (${registers.length} bytes)")
    val m = registers.length
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var z = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = registers(i) & 0xff
      z += java.lang.Math.scalb(1.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / z
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }
}

abstract class HllAggBase extends TypedImperativeAggregate[Array[Byte]] {
  def p: Int
  // NOTE: validation must NOT live in the constructor body — the abstract
  // `p` is a subclass field, unset while the superclass deserializes on
  // executors (Java serialization), which would throw "unable to create
  // instance". Validate lazily at first buffer creation instead.
  override def nullable: Boolean = false
  override def createAggregationBuffer(): Array[Byte] = {
    require(p >= 4 && p <= 18, s"hll precision p out of [4,18]: $p")
    new Array[Byte](1 << p)
  }
  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    Hll.merge(buffer, other); buffer
  }
  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes
}

/** `hll_sketch(col[, p])` — build the dense register sketch. */
case class HllSketchAgg(
    child: Expression,
    p: Int = Hll.DefaultP,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends HllAggBase {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = BinaryType

  // parameter range at ANALYSIS time (driver-side, post-construction
  // — the constructor itself must stay empty for Java deserialization
  // of unset subclass fields): a bad p otherwise launches the job and
  // fails every task at first createAggregationBuffer
  override def checkInputDataTypes(): TypeCheckResult =
    if (p < 4 || p > 18)
      TypeCheckResult.TypeCheckFailure(s"hll precision p out of [4,18]: $p")
    else TypeCheckResult.TypeCheckSuccess

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.add(buffer, Hll.hash(v))
    buffer
  }
  override def eval(buffer: Array[Byte]): Any = buffer

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_hll_union(sketch)` — union pre-built sketches (register max).
  * The buffer is sized lazily from the FIRST input sketch, so sketches
  * built at any precision union correctly (a fixed-size buffer would
  * reject every p except the default); mixed precisions in one group
  * still fail fast in [[Hll.merge]]. */
case class HllUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends HllAggBase {

  override def p: Int = Hll.DefaultP // unused: buffer adopts input size
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray
  override def nullable: Boolean = true // all-null group → null sketch

  override def children: Seq[Expression] = Seq(child)

  // sketch bytes in, at ANALYSIS time — a non-binary child otherwise
  // surfaces as a per-task ClassCastException after job launch
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType || child.dataType == NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll_union expects a binary sketch column, got ${child.dataType}")
  override def dataType: DataType = BinaryType

  private def fold(buffer: Array[Byte], sk: Array[Byte]): Array[Byte] =
    if (sk.isEmpty) buffer
    else if (buffer.isEmpty) sk.clone()
    else { Hll.merge(buffer, sk); buffer }

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer else fold(buffer, v.asInstanceOf[Array[Byte]])
  }
  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    fold(buffer, other)
  override def eval(buffer: Array[Byte]): Any =
    if (buffer.isEmpty) null else buffer

  override def withNewMutableAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `hll_estimate(sketch)` — scalar cardinality estimate of a sketch. */
case class HllEstimateExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hll_estimate expects a binary sketch, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    Hll.estimate(input.asInstanceOf[Array[Byte]])

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
