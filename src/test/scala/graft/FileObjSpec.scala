package graft

import graft.model.FileObj
import graft.sources.Discovery
import graft.model.PipelineEvent
import java.nio.file.Files

/** Typed Dataset[FileObj] round-trip over the discovery output. */
class FileObjSpec extends SparkSuite {

  test("discovery output round-trips through Dataset[FileObj]") {
    val csv = Files.createTempFile("fo", ".csv")
    Files.writeString(csv, "s3_path\ns3://b/x_2020.tif\n")
    val ev = PipelineEvent(collection = "c", discovery = "inventory",
      inventoryUrl = Some(csv.toString), upload = true)
    val df = Discovery.inventory(spark, ev)
    val ds = FileObj.toDataset(df)
    val obj = ds.collect().head
    assert(obj.collection == "c" &&
      obj.remote_fileurl == "s3://b/x_2020.tif" &&
      obj.upload.contains(true) &&
      obj.product_id.contains("x_2020"))
    // and back: typed rows -> canonical DataFrame
    val back = FileObj.toDF(Seq(obj), spark)
    assert(back.count() == 1 &&
      back.columns.contains("remote_fileurl"))
  }
}
