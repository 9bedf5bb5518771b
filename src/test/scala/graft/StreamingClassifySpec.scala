package graft

import graft.llm.Classifier
import graft.streaming.StreamingClassify
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class StreamingClassifySpec extends SparkSuite {
  import spark.implicits._

  private val train = Seq(
    (1L, "good clean prose text here", true),
    (2L, "good text text prose words", true),
    (3L, "spam spam junk junk spam buy", false),
    (4L, "junk buy buy spam junk", false)
  ).toDF("id", "txt", "pos")

  test("stream scoring equals batch scoring, across micro-batches") {
    val modelDir = Files.createTempDirectory("sc-model").toString
    val inDir = Files.createTempDirectory("sc-in").toString
    val outDir = Files.createTempDirectory("sc-out").toString + "/scored"
    val ckpt = Files.createTempDirectory("sc-ckpt").toString
    val (w, c) = Classifier.nbTrain(train, "id", "txt", "pos")
    StreamingClassify.persistModel(w, c, modelDir)

    // two micro-batches of fresh docs (file source: one file per batch)
    Files.writeString(java.nio.file.Paths.get(inDir, "b1.json"),
      """{"id":10,"txt":"good prose"}""" + "\n" +
        """{"id":11,"txt":"spam junk buy"}""")
    Files.writeString(java.nio.file.Paths.get(inDir, "b2.json"),
      """{"id":12,"txt":"zzz unseen tokens"}""" + "\n" +
        """{"id":13,"txt":"good clean words"}""")

    val schema = StructType(Seq(StructField("id", LongType),
      StructField("txt", StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val q = StreamingClassify.scoreTo(stream, "id", "txt",
      modelDir, outDir)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val fresh = Seq((10L, "good prose"), (11L, "spam junk buy"),
      (12L, "zzz unseen tokens"), (13L, "good clean words"))
      .toDF("id", "txt")
    val expect = Classifier.nbScore(fresh, w, c, "id", "txt")
      .orderBy("doc_id").collect().toSeq
    val got = spark.read.parquet(outDir)
      .select("doc_id", "n_terms", "score_e6", "pred") // drop batch col
      .orderBy("doc_id").collect().toSeq
    assert(got == expect)
    // idempotent layout: two micro-batches, each in its own batch dir
    assert(spark.read.parquet(outDir).select("batch").distinct()
      .count() == 2)
  }
}
