package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** `minhash_union(sig)` — SURVEY §7.6's nominated sketch aggregate: the
  * MinHash signature of the UNION of the input documents' shingle
  * sets, computed as the elementwise minimum over their per-document
  * signatures (min-of-mins = min over the united set — the defining
  * algebraic property of MinHash). Mergeable partial aggregation falls
  * out of the same property, so Catalyst runs it map-side like any
  * sketch (HLL-style): one long[] buffer per group, O(numHashes) per
  * row, no shuffle amplification.
  *
  * Use: corpus-level similarity — `jaccard(groupA, groupB)` estimated
  * from two group sketches without touching pairs of documents. */
case class MinhashUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  // array<long> signatures in, at ANALYSIS time — a wrong-typed
  // child otherwise surfaces as a per-task ClassCastException after
  // job launch
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) | NullType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_union expects an array<bigint> signature column, " +
          s"got $other")
    }
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] = Array.empty

  private def mergeInto(buf: Array[Long], sig: ArrayData): Array[Long] = {
    val n = sig.numElements()
    if (buf.isEmpty) {
      val out = new Array[Long](n)
      var i = 0
      while (i < n) { out(i) = sig.getLong(i); i += 1 }
      out
    } else {
      require(buf.length == n,
        s"minhash_union: signature width mismatch (${buf.length} vs $n)")
      var i = 0
      while (i < n) {
        val v = sig.getLong(i)
        if (v < buf(i)) buf(i) = v
        i += 1
      }
      buf
    }
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buffer
    else mergeInto(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other.clone()
    else {
      require(buffer.length == other.length,
        s"minhash_union: signature width mismatch (${buffer.length} vs ${other.length})")
      var i = 0
      while (i < buffer.length) {
        if (other(i) < buffer(i)) buffer(i) = other(i)
        i += 1
      }
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

  override def withNewMutableAggBufferOffset(newOffset: Int): MinhashUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinhashUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}
