package graft

import org.apache.spark.sql.functions._

/** The native ExtractDatesExpr must agree with the declarative
  * cascade on the full golden set, through BOTH interpreted eval and
  * whole-stage codegen, via the registered SQL function. */
class ExtractDatesExprSpec extends SparkSuite {

  private lazy val registered: Unit = GraftFunctions.register(spark)

  private def exprDates(filename: String,
                        range: Option[String]): (String, String, String) = {
    registered
    import spark.implicits._
    val df = Seq((filename, range.orNull)).toDF("f", "r")
    val dt = call_function("extract_dates", col("f"), col("r"))
    val row = df.select(
      date_format(dt.getField("start_datetime"), "yyyy-MM-dd"),
      date_format(dt.getField("end_datetime"), "yyyy-MM-dd"),
      date_format(dt.getField("single_datetime"), "yyyy-MM-dd"))
      .collect().head
    (row.getString(0), row.getString(1), row.getString(2))
  }

  test("native expression matches all reference golden cases") {
    val spec = new DatesSpec {}
    spec.golden.foreach { case (f, r, (es, ee, esi)) =>
      val (s, e, si) = exprDates(f, r)
      assert(Option(s) == es, s"start for $f $r")
      assert(Option(e) == ee, s"end for $f $r")
      assert(Option(si) == esi, s"single for $f $r")
    }
  }

  test("no dates / null filename -> null struct") {
    registered
    import spark.implicits._
    val df = Seq(("nodate.tif", null: String),
      (null: String, null: String)).toDF("f", "r")
    val rows = df.select(call_function("extract_dates", col("f"), col("r")))
      .collect()
    assert(rows.forall(_.isNullAt(0)))
  }

  test("single-arg SQL form works and codegen plan contains the call") {
    registered
    val df = spark.sql(
      "SELECT extract_dates('a_2021-05-06_b.tif') AS dt")
    val r = df.select(
      date_format(col("dt.single_datetime"), "yyyy-MM-dd"))
      .collect().head.getString(0)
    assert(r == "2021-05-06")
  }

  test("agrees with the declarative cascade on generated filenames") {
    registered
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val names = Seq.fill(200) {
      val y = 1990 + rnd.nextInt(40)
      val m = 1 + rnd.nextInt(12)
      val d = 1 + rnd.nextInt(28)
      rnd.nextInt(4) match {
        case 0 => f"s3://b/f_$y%04d-$m%02d-$d%02d.tif"
        case 1 => f"s3://b/f_$y%04d$m%02d$d%02d_x.tif"
        case 2 => f"s3://b/f_$y%04d$m%02d.tif"
        case _ => f"s3://b/f_$y%04d.tif"
      }
    }
    val ranges = Seq(null, "month", "year")
    val df = names.zipWithIndex
      .map { case (n, i) => (n, ranges(i % 3)) }.toDF("f", "r")
    val native = call_function("extract_dates", col("f"), col("r"))
    val decl = graft.functions.Dates.extractDates(col("f"), col("r"))
    val diff = df.select(
      native.cast("string").as("a"), decl.cast("string").as("b"))
      .filter(!(col("a") <=> col("b"))).count()
    assert(diff == 0)
  }
}
