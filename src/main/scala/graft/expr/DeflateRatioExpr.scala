package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_ratio(text)` — compressed/raw byte ratio of the UTF-8
  * text under DEFLATE (level 6, raw stream): the classic cheap
  * quality/repetition signal — boilerplate, template spam, and
  * repeated spans compress far below natural prose (~0.3–0.6), while
  * high-entropy junk sits near (or above) 1.0. Deterministic for a
  * given JVM zlib level; NOT oracle-comparable across engines (DuckDB
  * has no deflate), so queries over it are unit-gated like the
  * multimodal family. Empty text → 0.0.
  *
  * Per-row imperative work (Deflater) — a CodegenFallback expression,
  * kept out of wide hot paths; the intended use is a one-pass corpus
  * quality projection where the deflate cost IS the work.
  */
case class DeflateRatioExpr(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects a string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    if (bytes.isEmpty) 0.0
    else {
      val d = new java.util.zip.Deflater(6, true)
      try {
        d.setInput(bytes)
        d.finish()
        val buf = new Array[Byte](math.max(64, bytes.length / 2))
        var total = 0L
        while (!d.finished()) total += d.deflate(buf)
        total.toDouble / bytes.length
      } finally d.end()
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): Expression = copy(child = newChild)
}
