package graft

import graft.pipeline.EventJson
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Real-world config-corpus compatibility: every one of the
  * reference's 28 production pipeline configs (the JSON files under
  * `data/step_function_inputs`) must parse into a
  * [[graft.model.PipelineEvent]] with usable fields — the "a user of
  * the reference could switch" check for the event surface. */
class EventCorpusSpec extends SparkSuite {

  private val corpusDir = Paths.get("/root/reference/data/step_function_inputs")

  test("all 28 reference pipeline configs parse and are runnable shapes") {
    assume(Files.isDirectory(corpusDir), "reference corpus not present")
    val files = Files.list(corpusDir).iterator().asScala
      .filter(_.toString.endsWith(".json")).toSeq.sortBy(_.toString)
    assert(files.size == 28)
    val events = files.flatMap { f =>
      val evs = EventJson.parseAll(Files.readString(f))
      assert(evs.nonEmpty, s"no events parsed from $f")
      evs.map(f.getFileName.toString -> _)
    }
    events.foreach { case (src, ev) =>
      assert(ev.collection.nonEmpty, s"$src: empty collection")
      assert(Set("s3", "cmr", "inventory").contains(ev.discovery),
        s"$src: unknown discovery '${ev.discovery}'")
      // every regex in the config must compile on the JVM
      (ev.filenameRegex.toSeq ++ ev.idRegex.toSeq ++
        ev.dataFileRegex.toSeq).foreach { re =>
        java.util.regex.Pattern.compile(re)
      }
      // discovery-specific requirements the Runner depends on
      ev.discovery match {
        case "inventory" =>
          assert(ev.inventoryUrl.isDefined, s"$src: inventory without url")
        case "s3" =>
          assert(ev.bucket.isDefined || ev.prefix.nonEmpty,
            s"$src: s3 discovery without bucket/prefix")
        case "cmr" =>
          assert(ev.version.isDefined || ev.mode.isDefined ||
            ev.linkRel.isDefined || ev.temporal.nonEmpty,
            s"$src: cmr discovery without query fields")
      }
      // datetime_range, when present, must be a widening the engine knows
      ev.datetimeRange.foreach(r => assert(Set("month", "year").contains(r),
        s"$src: unknown datetime_range '$r'"))
    }
    // the corpus exercises cmr + inventory discovery (no shipped config
    // uses s3 listing — that path is covered by DiscoverySpec) and both
    // union-typed asset config forms
    val evs = events.map(_._2)
    assert(evs.map(_.discovery).toSet == Set("cmr", "inventory"))
    assert(evs.exists(_.assetRolesMap.nonEmpty) ||
      evs.exists(_.assetRolesList.isDefined))
    assert(evs.exists(_.assetMediaTypeMap.nonEmpty) ||
      evs.exists(_.assetMediaTypeScalar.isDefined))
    assert(evs.exists(_.dataFileRegex.isDefined), "no multi-asset config")
  }

  test("all reference collection docs load, validate, and broadcast-join") {
    val dir = Paths.get("/root/reference/data/collections")
    assume(Files.isDirectory(dir), "reference corpus not present")
    val nFiles = Files.list(dir).iterator().asScala
      .count(_.toString.endsWith(".json"))
    val cols = graft.sources.Collections.load(spark, dir.toString)
    assert(cols.count() == nFiles && nFiles >= 31)
    val validity = graft.sources.Collections.withValidity(cols)
    import org.apache.spark.sql.functions.col
    assert(validity.filter(!col("valid")).count() == 0,
      "reference collection doc failed validation")
    // ids unique; the J2 dimension join finds every collection
    assert(cols.select("id").distinct().count() == nFiles)
    import spark.implicits._
    val items = cols.select(col("id").as("collection"))
      .withColumn("item_id", col("collection"))
    val joined = graft.sources.Collections.joinItems(items, cols)
    assert(joined.filter(col("collection_title").isNull).count() == 0)
  }
}
