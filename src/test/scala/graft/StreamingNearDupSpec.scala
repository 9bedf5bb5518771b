package graft

import graft.streaming.{StreamingNearDup, StreamingSpans}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Streaming MinHash-LSH near-dup flagging (flatMapGroupsWithState
  * keyed by band bucket). */
class StreamingNearDupSpec extends SparkSuite {
  import spark.implicits._

  // ~60 distinct words so a single-word edit leaves Jaccard ~0.85,
  // comfortably above the 0.7 flag threshold (k=5 shingles: one edit
  // perturbs at most 5 of ~56 shingles)
  private val base =
    "the quick brown fox jumps over the lazy dog and then runs far " +
      "away into the deep dark forest to hide from every hunter while " +
      "rivers flow gently beneath ancient stone bridges where merchants " +
      "once carried spices silk and silver between distant mountain " +
      "villages trading stories about storms harvests festivals and the " +
      "slow turning of seasons under a wide patient northern sky"
  private val nearDup = base.replace("lazy", "sleepy") // one word off
  private val unrelated =
    "completely different content about distributed query engines " +
      "processing petabytes of tokenized text with columnar formats " +
      "shuffle partitions adaptive execution broadcast joins codegen " +
      "stages and vectorized parquet readers across elastic clusters"

  test("streaming: a near-dup arriving in a LATER micro-batch is " +
    "flagged against the earlier representative; unrelated docs pass") {
    val inDir = Files.createTempDirectory("snd-in").toString
    val ckpt = Files.createTempDirectory("snd-ckpt").toString
    val files = Seq(
      "b1.json" -> s"""{"doc_id":"orig","text":"$base"}""",
      "b2.json" ->
        (s"""{"doc_id":"dup","text":"$nearDup"}""" + "\n" +
          s"""{"doc_id":"other","text":"$unrelated"}"""))
    files.zipWithIndex.foreach { case ((name, content), i) =>
      val p = java.nio.file.Paths.get(inDir, name)
      Files.writeString(p, content)
      Files.setLastModifiedTime(p,
        java.nio.file.attribute.FileTime.fromMillis(1000000L + i * 60000))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    // no stateTtl: processing-time timers keep AvailableNow re-triggering
    val flagged = StreamingNearDup.candidates(stream, "doc_id", "text")
    val q = flagged.writeStream
      .format("memory").queryName("snd_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val rows = spark.sql(
      "SELECT DISTINCT id, dup_of FROM snd_out")
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq == Seq(("dup", "orig")))
    val est = spark.sql("SELECT max(est) FROM snd_out").collect()
      .head.getDouble(0)
    assert(est >= 0.7 && est <= 1.0)
  }

  test("batch mode: flags planted near-dups from the documents table " +
    "consistently with the batch LSH pipeline") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val flagged = StreamingNearDup.candidates(docs, "doc_id", "text",
      threshold = 0.7)
      .groupBy(col("id")).agg(max(col("est")).as("est"))
    val got = flagged.select("id").collect().map(_.getString(0)).toSet
    // the batch pipeline's verified near-dup pairs (exact Jaccard):
    // every flagged id must belong to some true near-dup pair, and
    // most true pairs must have a flagged member (LSH is probabilistic
    // per band, but 16 bands at j>=0.9 miss with prob ~0)
    val truePairs = graft.llm.Dedup.nearDuplicates(
      docs, "doc_id", "text", threshold = 0.7)
      .select(col("id_a").cast("string"), col("id_b").cast("string"))
      .collect().map(r => (r.getString(0), r.getString(1)))
    val inPair = truePairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(got.nonEmpty)
    assert(got.subsetOf(inPair),
      s"streaming flagged ids not in any true pair: ${got.diff(inPair)}")
    // at least one member of most true pairs got flagged
    val covered = truePairs.count(p => got(p._1) || got(p._2))
    assert(covered >= (truePairs.length * 0.9).toInt,
      s"covered $covered of ${truePairs.length} true pairs")
  }

  test("stream-static: arriving docs flagged against a frozen catalog " +
    "across micro-batches; fresh docs pass") {
    import graft.llm.Dedup
    val corpus = Seq((1L, base), (2L, unrelated)).toDF("doc_id", "text")
    val buckets = StreamingNearDup.catalogBuckets(
      Dedup.signatureCatalog(corpus, "doc_id", "text",
        k = 5, numHashes = 64)).localCheckpoint(true)
    val inDir = Files.createTempDirectory("scd-in").toString
    val ckpt = Files.createTempDirectory("scd-ckpt").toString
    val fresh = "an entirely new essay on mountain weather patterns " +
      "glacier melt rates alpine meadows and the quiet economics of " +
      "high altitude farming with terraces irrigation channels yaks"
    Seq(
      "b1.json" -> s"""{"doc_id":"hit","text":"$nearDup"}""",
      "b2.json" -> s"""{"doc_id":"miss","text":"$fresh"}""")
      .zipWithIndex.foreach { case ((name, content), i) =>
        val p = java.nio.file.Paths.get(inDir, name)
        Files.writeString(p, content)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(2000000L + i * 60000))
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val flagged = StreamingNearDup.flagAgainstCatalog(
      stream, "doc_id", "text", buckets)
    val q = flagged.writeStream
      .format("memory").queryName("scd_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val rows = spark.sql("SELECT DISTINCT id, cat_id FROM scd_out")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == Seq(("hit", 1L)),
      s"only the near-dup may flag, against catalog doc 1; got ${rows.toSeq}")
    val est = spark.sql("SELECT max(est) FROM scd_out")
      .collect().head.getDouble(0)
    assert(est >= 0.7 && est <= 1.0)
  }

  test("stream-static: arriving docs flag shared SPANS against a " +
    "frozen span catalog at shifted offsets; fresh docs pass") {
    import graft.llm.Dedup
    // aperiodic 110-char block planted in the corpus; the arriving hit
    // doc carries it at a different (non-aligned) offset
    val block = TestText.letters(110, 3)
    val corpus = Seq((1L, block + TestText.letters(40, 91)))
      .toDF("doc_id", "text")
    val catalog = Dedup.spanCatalog(corpus, "doc_id", "text")
      .localCheckpoint(true)
    val inDir = Files.createTempDirectory("ssp-in").toString
    val ckpt = Files.createTempDirectory("ssp-ckpt").toString
    val hitText = TestText.letters(7, 31) + block + TestText.letters(40, 32)
    val freshText = TestText.letters(160, 55)
    Seq(
      "b1.json" -> s"""{"doc_id":"hit","text":"$hitText"}""",
      "b2.json" -> s"""{"doc_id":"miss","text":"$freshText"}""")
      .zipWithIndex.foreach { case ((name, content), i) =>
        val p = java.nio.file.Paths.get(inDir, name)
        Files.writeString(p, content)
        Files.setLastModifiedTime(p,
          java.nio.file.attribute.FileTime.fromMillis(3000000L + i * 60000))
      }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(inDir)
    val flagged = StreamingSpans.flagCatalogSpans(
      stream, "doc_id", "text", catalog)
    val q = flagged.writeStream
      .format("memory").queryName("ssp_out")
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try assert(q.awaitTermination(120000), "query did not finish in time")
    finally q.stop()
    val ids = spark.sql("SELECT DISTINCT id FROM ssp_out")
      .collect().map(_.getString(0)).toSeq
    assert(ids == Seq("hit"),
      s"only the shifted-block doc may flag; got $ids")
  }
}
