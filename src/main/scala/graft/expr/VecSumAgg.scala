package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `vec_sum_micros(vec)` — element-wise vector sum aggregate in exact
  * integer micro-units: each element is snapped to
  * `floor(v·10⁶ + 0.5)` (identical algebra to SQL
  * `CAST(floor(v*1000000 + 0.5) AS BIGINT)`, so an external oracle
  * reproduces it bit for bit) and summed as longs — order-free,
  * partition-proof, engine-proof, unlike a double sum whose value
  * depends on addition order.
  *
  * Why an aggregate and not `posexplode` + groupBy(dim): a centroid
  * computed by exploding dims multiplies the shuffle by the vector
  * width (64× here) and shuffles every element of the corpus; this
  * buffer sums map-side like any sketch (HLL/KLL/CMS/minhash_union
  * pattern) and ships ONE long[dim] row per group per partition.
  * Use: per-label/source mean embeddings (class prototypes, domain
  * drift tracking), divide by `count(*)` for the centroid.
  */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // analysis-time rejection, like the sibling sketch expressions —
  // never a per-task runtime surprise
  override def checkInputDataTypes()
  : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_sum_micros expects array<float|double>, got $other")
    }

  private lazy val elemType: DataType = child.dataType match {
    case ArrayType(et @ (FloatType | DoubleType), _) => et
    case other => throw new IllegalArgumentException(
      s"vec_sum_micros expects array<float|double>, got $other")
  }

  override def createAggregationBuffer(): Array[Long] = Array.empty

  private def elem(a: ArrayData, i: Int): Double = elemType match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  private def micros(v: Double): Long =
    math.floor(v * 1000000.0 + 0.5).toLong

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val arr = v.asInstanceOf[ArrayData]
      val n = arr.numElements()
      // a zero-length vector would alias the 'no input yet' empty
      // buffer and silently skip the mismatch guard — fail loud
      require(n > 0, "vec_sum_micros: empty vector")
      val out = if (buffer.isEmpty) new Array[Long](n) else buffer
      require(out.length == n,
        s"vec_sum_micros: dimension mismatch (${out.length} vs $n)")
      var i = 0
      while (i < n) {
        require(!arr.isNullAt(i),
          s"vec_sum_micros: null element at index $i")
        out(i) += micros(elem(arr, i)); i += 1
      }
      out
    }
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other.clone()
    else {
      require(buffer.length == other.length,
        s"vec_sum_micros: dimension mismatch (${buffer.length} vs ${other.length})")
      var i = 0
      while (i < buffer.length) { buffer(i) += other(i); i += 1 }
      buffer
    }

  override def eval(buffer: Array[Long]): Any =
    if (buffer.isEmpty) null
    else new GenericArrayData(buffer.map(x => x: Any))

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buffer.length * 8)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VecSumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
