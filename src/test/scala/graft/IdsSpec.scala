package graft

import graft.functions.Ids
import org.apache.spark.sql.functions._

/** F2/F3/F10 golden cases — item-id cases ported verbatim from
  * `lambdas/build-stac/tests/test_regex.py:138-167`, stem/suffix
  * semantics from pathlib. */
class IdsSpec extends SparkSuite {

  private def itemIdOf(url: String, idRegex: Option[String],
                       productId: Option[String] = None): String = {
    import spark.implicits._
    Seq((url, productId.orNull)).toDF("url", "pid")
      .select(Ids.itemId(col("url"), idRegex, col("pid")))
      .collect().head.getString(0)
  }

  test("item_id via id_regex (reference golden case 1)") {
    assert(itemIdOf(
      "s3://OMNO2d_HRM/OMI_trno20.10x0.10_201601_Col3_V4.nc.tif",
      Some("s3://([^/]*)/(.+).tif$")) ==
      "OMNO2d_HRM-OMI_trno20.10x0.10_201601_Col3_V4.nc")
  }

  test("item_id via id_regex (reference golden case 2)") {
    assert(itemIdOf(
      "s3://OMNO2d_HRMDifference/OMI_trno20.10x0.10_201601_Col3_V4.nc.tif",
      Some("s3://([^/]*)/(.+).tif$")) ==
      "OMNO2d_HRMDifference-OMI_trno20.10x0.10_201601_Col3_V4.nc")
  }

  test("item_id priority: product_id beats stem; stem is fallback") {
    assert(itemIdOf("s3://b/path/file.tif", None, Some("PROD-1")) == "PROD-1")
    assert(itemIdOf("s3://b/path/file.tif", None) == "file")
  }

  test("id_regex must match exactly once (reference asserts)") {
    import spark.implicits._
    val out = Seq("s3://b/x.tif/y.tif").toDF("url")
      .select(Ids.itemId(col("url"), Some("([a-z])\\.tif"),
        lit(null).cast("string")))
      .collect().head
    assert(out.isNullAt(0)) // two matches -> null (reference raises)
  }

  test("stem strips only the last extension, like pathlib") {
    import spark.implicits._
    val df = Seq("a/b/foo.nc.tif", "a/.bashrc", "a/noext", "x.tar.gz")
      .toDF("u")
    val got = df.select(Ids.stem(col("u"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("foo.nc", ".bashrc", "noext", "x.tar"))
  }

  test("suffix and ext") {
    import spark.implicits._
    val df = Seq("a/b/foo.nc.tif", "a/noext").toDF("u")
    assert(df.select(Ids.suffix(col("u"))).collect()
      .map(_.getString(0)).toSeq == Seq(".tif", ""))
    assert(df.select(Ids.ext(col("u"))).collect()
      .map(_.getString(0)).toSeq == Seq("tif", ""))
  }

  test("sanitizeName strips everything outside [a-zA-Z0-9_-]") {
    import spark.implicits._
    val got = Seq("My Collection (v2)!").toDF("n")
      .select(Ids.sanitizeName(col("n"))).collect().head.getString(0)
    assert(got == "MyCollectionv2")
  }

  test("extDispatch tries .ext then ext then default") {
    import spark.implicits._
    val m = Map(".tif" -> "A", "nc" -> "B")
    val df = Seq("f.tif", "f.nc", "f.hdr").toDF("u")
    val got = df.select(Ids.extDispatch(col("u"), m, Some("D")))
      .collect().map(_.getString(0))
    assert(got.toSeq == Seq("A", "B", "D"))
  }
}
