package graft

import graft.model.PipelineEvent
import graft.streaming.Publication
import java.nio.file.Files

/** T1 — the real readStream publication path, run with a processing
  * trigger against a file-drop directory. */
class StreamingSpec extends SparkSuite {

  test("readStream drop-dir -> micro-batch -> partitioned catalog") {
    val ev = PipelineEvent(collection = "sc")
    val inDir = Files.createTempDirectory("q-in").toString
    val catalog = Files.createTempDirectory("q-cat").toString + "/t"
    val dlq = Files.createTempDirectory("q-dlq").toString + "/d"
    val ckpt = Files.createTempDirectory("q-ckpt").toString
    Files.writeString(java.nio.file.Paths.get(inDir, "batch1.json"),
      """{"collection":"sc","remote_fileurl":"s3://b/a_2021.tif","upload":false,"user_shared":false,"ingest":true,"cogify":false,"attempt":0}
        |{"collection":"sc","remote_fileurl":"s3://b/b_2022.tif","upload":false,"user_shared":false,"ingest":true,"cogify":false,"attempt":0}
        |""".stripMargin)
    val q = Publication.start(spark, ev, inDir, catalog, dlq, ckpt,
      maxAttempts = 2, triggerInterval = "1 second")
    try {
      val deadline = System.currentTimeMillis() + 60000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(500)
        done = try spark.read.parquet(catalog).count() == 2
          catch { case _: Exception => false }
      }
      assert(done, "streamed items did not reach the catalog in time")
      val ids = spark.read.parquet(catalog)
        .select("id").collect().map(_.getString(0)).sorted
      assert(ids.toSeq == Seq("a_2021", "b_2022"))
      // catalog is partitioned by collection (T7)
      assert(Files.exists(java.nio.file.Paths.get(catalog, "collection=sc")))
    } finally q.stop()
  }
}
