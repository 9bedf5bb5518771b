package graft

import graft.functions.Dates
import org.apache.spark.sql.functions._

/** F1 golden cases — verbatim port of the reference's
  * `lambdas/build-stac/tests/test_regex.py:7-135` (14 parametrized
  * cases: single dates in 4 formats, dateranges, month/year widening). */
class DatesSpec extends SparkSuite {

  /** (filename, datetime_range, expected (start, end, single) as
    * "yyyy-MM-dd HH:mm:ss" strings or null). */
  val golden: Seq[(String, Option[String],
      (Option[String], Option[String], Option[String]))] = Seq(
    ("s3://foo/bar/foo_2010-10-31_bar.tif", None,
      (None, None, Some("2010-10-31"))),
    ("s3://foo/bar/foo_20051212_bar.tif", None,
      (None, None, Some("2005-12-12"))),
    ("s3://foo/bar/foo_200507_bar.tif", None,
      (None, None, Some("2005-07-01"))),
    ("s3://foo/bar/foo_2012_bar.tif", None,
      (None, None, Some("2012-01-01"))),
    ("s3://foo/bar/foo_2005-07-02_to_2006-09-29_bar.tif", None,
      (Some("2005-07-02"), Some("2006-09-29"), None)),
    ("s3://foo/bar/foo_20050702_to_20060929_bar.tif", None,
      (Some("2005-07-02"), Some("2006-09-29"), None)),
    ("s3://foo/bar/foo_2005_2006_2007_bar.tif", None,
      (Some("2005-01-01"), Some("2007-01-01"), None)),
    ("s3://foo/bar/foo_2005-01-02.tif", Some("month"),
      (Some("2005-01-01"), Some("2005-01-31"), None)),
    ("s3://foo/bar/foo_2005-02-02.tif", Some("month"),
      (Some("2005-02-01"), Some("2005-02-28"), None)),
    ("s3://foo/bar/foo_20050302_bar.tif", Some("month"),
      (Some("2005-03-01"), Some("2005-03-31"), None)),
    ("s3://foo/bar/foo_20050402_bar.tif", Some("month"),
      (Some("2005-04-01"), Some("2005-04-30"), None)),
    ("s3://foo/bar/foo_2005-01-02.tif", Some("year"),
      (Some("2005-01-01"), Some("2005-12-31"), None)),
    ("s3://foo/bar/foo_2005-02-02.tif", Some("year"),
      (Some("2005-01-01"), Some("2005-12-31"), None)),
    ("s3://foo/bar/foo_20050302_bar.tif", Some("year"),
      (Some("2005-01-01"), Some("2005-12-31"), None)),
    ("s3://foo/bar/foo_20050402_bar.tif", Some("year"),
      (Some("2005-01-01"), Some("2005-12-31"), None)))

  test("extract_dates matches the 14 reference golden cases") {
    import spark.implicits._
    val df = golden.map { case (f, r, _) => (f, r.orNull) }
      .toDF("filename", "range")
    val dt = Dates.extractDates(col("filename"), col("range"))
    val fmt = (c: String) =>
      date_format(dt.getField(c), "yyyy-MM-dd").as(c)
    val rows = df.select(fmt("start_datetime"), fmt("end_datetime"),
      fmt("single_datetime")).collect()
    golden.zip(rows).foreach { case ((f, r, (es, ee, esi)), row) =>
      def g(i: Int): Option[String] = Option(row.getString(i))
      assert(g(0) == es, s"start for $f range=$r")
      assert(g(1) == ee, s"end for $f range=$r")
      assert(g(2) == esi, s"single for $f range=$r")
    }
  }

  test("no extractable date yields a NULL struct (reference raises)") {
    import spark.implicits._
    val df = Seq("s3://foo/bar/nodates.tif").toDF("filename")
    val out = df.select(Dates.extractDates(col("filename"),
      lit(null: String)).as("dt")).collect()
    assert(out.head.isNullAt(0))
  }

  test("widening keeps the time-of-day semantics of the reference") {
    import spark.implicits._
    // month end via relativedelta(day=31) == last day of that month
    val df = Seq("x_20240205.tif").toDF("f")
    val dt = Dates.extractDates(col("f"), lit("month"))
    val r = df.select(
      date_format(dt.getField("start_datetime"),
        "yyyy-MM-dd'T'HH:mm:ss").as("s"),
      date_format(dt.getField("end_datetime"),
        "yyyy-MM-dd'T'HH:mm:ss").as("e")).collect().head
    assert(r.getString(0) == "2024-02-01T00:00:00")
    assert(r.getString(1) == "2024-02-29T00:00:00") // leap year
  }
}
