package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import java.time.LocalDate
import java.util.regex.Pattern

/** Single-pass evaluator for the F1 date cascade (reference
  * `regex.py:30-83`), shared by interpreted eval and codegen. */
object DateCascade extends Serializable {

  private val strategies: Array[(Pattern, Int)] = Array(
    (Pattern.compile("(?:_|-)(\\d{4}-\\d{2}-\\d{2})"), 0),
    (Pattern.compile("(?:_|-)(\\d{8})"), 1),
    (Pattern.compile("(?:_|-)(\\d{6})"), 2),
    (Pattern.compile("(?:_|-)(\\d{4})"), 3))

  private val MicrosPerDay = 86400000000L

  private def parse(s: String, fmt: Int): Long = {
    val d = fmt match {
      case 0 => LocalDate.of(s.substring(0, 4).toInt,
        s.substring(5, 7).toInt, s.substring(8, 10).toInt)
      case 1 => LocalDate.of(s.substring(0, 4).toInt,
        s.substring(4, 6).toInt, s.substring(6, 8).toInt)
      case 2 => LocalDate.of(s.substring(0, 4).toInt,
        s.substring(4, 6).toInt, 1)
      case _ => LocalDate.of(s.toInt, 1, 1)
    }
    d.toEpochDay * MicrosPerDay
  }

  private def monthRange(micros: Long): (Long, Long) = {
    val d = LocalDate.ofEpochDay(micros / MicrosPerDay)
    (d.withDayOfMonth(1).toEpochDay * MicrosPerDay,
      d.withDayOfMonth(d.lengthOfMonth()).toEpochDay * MicrosPerDay)
  }

  private def yearRange(micros: Long): (Long, Long) = {
    val d = LocalDate.ofEpochDay(micros / MicrosPerDay)
    (LocalDate.of(d.getYear, 1, 1).toEpochDay * MicrosPerDay,
      LocalDate.of(d.getYear, 12, 31).toEpochDay * MicrosPerDay)
  }

  /** NULL result = the reference's raise (no date found / bad parse).
    * Exactly one of (start,end) or single is populated. */
  def extract(name: UTF8String, range: UTF8String): InternalRow = {
    val s = name.toString
    var dates: List[Long] = Nil
    var i = 0
    while (dates.isEmpty && i < strategies.length) {
      val (p, fmt) = strategies(i)
      val m = p.matcher(s)
      val buf = List.newBuilder[Long]
      var bad = false
      while (m.find()) {
        try buf += parse(m.group(1), fmt)
        catch { case _: Exception => bad = true }
      }
      if (bad) return null // unparseable hit = reference ValueError
      dates = buf.result()
      i += 1
    }
    if (dates.isEmpty) return null // reference raises "No dates provided"
    if (dates.length > 1) {
      val sorted = dates.sorted
      new GenericInternalRow(Array[Any](sorted.head, sorted.last, null))
    } else {
      val single = dates.head
      if (range == null)
        new GenericInternalRow(Array[Any](null, null, single))
      else range.toString match {
        case "month" =>
          val (a, b) = monthRange(single)
          new GenericInternalRow(Array[Any](a, b, null))
        case "year" =>
          val (a, b) = yearRange(single)
          new GenericInternalRow(Array[Any](a, b, null))
        case _ => null // unknown range key = reference KeyError
      }
    }
  }
}

/** F1 as a native Catalyst expression (SURVEY §7.3's nominated custom
  * Expression): one pass over the filename instead of the 4-regex
  * declarative cascade, with full codegen so it stays inside
  * WholeStageCodegen spans. Registered as the SQL function
  * `extract_dates` by [[graft.GraftFunctions]]. */
case class ExtractDatesExpr(filename: Expression, datetimeRange: Expression)
  extends Expression {

  override def children: Seq[Expression] = Seq(filename, datetimeRange)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("start_datetime", TimestampType),
    StructField("end_datetime", TimestampType),
    StructField("single_datetime", TimestampType)))

  override def eval(input: InternalRow): Any = {
    val f = filename.eval(input)
    if (f == null) null
    else {
      val r = datetimeRange.eval(input)
      DateCascade.extract(f.asInstanceOf[UTF8String],
        if (r == null) null else r.asInstanceOf[UTF8String])
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val f = filename.genCode(ctx)
    val r = datetimeRange.genCode(ctx)
    val helper = ctx.addReferenceObj("dateCascade", DateCascade,
      DateCascade.getClass.getName)
    ev.copy(code =
      code"""
        ${f.code}
        ${r.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${f.isNull}) {
          ${ev.value} = $helper.extract(${f.value},
            (org.apache.spark.unsafe.types.UTF8String)
              (${r.isNull} ? null : ${r.value}));
          ${ev.isNull} = ${ev.value} == null;
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(filename = newChildren(0), datetimeRange = newChildren(1))
}
