package graft

import graft.expr.ExtractDatesExpr
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.StringType

/** SQL-surface registration for the engine's custom expressions.
  *
  * Two entry points:
  *  - cluster config: `spark.sql.extensions=graft.GraftExtensions`
  *  - runtime: `GraftFunctions.register(spark)`
  *
  * Registered functions:
  *  - `extract_dates(filename[, range])` → struct<start_datetime,
  *    end_datetime, single_datetime> (the F1 cascade as one native
  *    codegen'd expression).
  */
object GraftFunctions {

  private val extractDatesBuilder: Seq[Expression] => Expression = {
    case Seq(f) => ExtractDatesExpr(f, Literal(null, StringType))
    case Seq(f, r) => ExtractDatesExpr(f, r)
    case other => throw new IllegalArgumentException(
      s"extract_dates expects 1 or 2 arguments, got ${other.size}")
  }

  private val registrations = Seq(
    (FunctionIdentifier("extract_dates"),
      new ExpressionInfo(classOf[ExtractDatesExpr].getName,
        "extract_dates"),
      extractDatesBuilder))

  /** Runtime registration on an existing session. */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(id, info, builder)
    }

  /** SparkSessionExtensions hook (for `spark.sql.extensions`). */
  def injectInto(ext: SparkSessionExtensions): Unit =
    registrations.foreach(ext.injectFunction)
}

/** `spark.sql.extensions=graft.GraftExtensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.injectInto(ext)
}
