package graft

import org.apache.spark.sql.functions._

/** Pins the [[Materializer]] seam: the default strategy reproduces
  * the lazy localCheckpoint behavior, and swapping in
  * [[Materializer.PersistedTable]] (the cluster deployment move)
  * changes WHERE reuse points live — real parquet tables on disk —
  * without changing a single output row. */
class MaterializerSpec extends SparkSuite {

  import spark.implicits._

  private val docs = Seq(
    (1L, "good clean prose text here", "A", true),
    (2L, "good clean prose text here", "A", true),
    (3L, "spam junk spam junk buy buy", "A", false),
    (4L, "good prose text words here again", "B", true),
    (5L, "good clean text words prose print", "B", true)
  ).toDF("doc_id", "text", "source", "is_en")

  test("PersistedTable strategy: identical results, reuse points " +
    "written as parquet tables named by their site") {
    val base = graft.llm.Curate
      .pipeline(docs, "doc_id", "text", "source", "is_en")
      .orderBy("doc_id").collect().toSeq
    val lmBase = graft.llm.LangModel
      .unigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val dir = java.nio.file.Files
      .createTempDirectory("graft_materializer").toString
    Materializer.set(Materializer.PersistedTable(dir))
    try {
      val got = graft.llm.Curate
        .pipeline(docs, "doc_id", "text", "source", "is_en")
        .orderBy("doc_id").collect().toSeq
      assert(got === base)
      val lmGot = graft.llm.LangModel
        .unigramNll(docs, "doc_id", "text")
        .orderBy("doc_id").collect().toSeq
      assert(lmGot === lmBase)
      // the reuse points are now inspectable tables under their sites
      for (site <- Seq("curate_dedup_survivors", "classifier_tf",
          "langmodel_unigram_tf"))
        assert(new java.io.File(s"$dir/$site").isDirectory,
          s"missing persisted reuse table $site")
      // and they are REAL parquet: readable back with rows
      assert(spark.read.parquet(s"$dir/curate_dedup_survivors")
        .count() > 0)
    } finally {
      Materializer.reset()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("PersistedTable: two invocations of the SAME site keep " +
    "distinct tables — no silent overwrite across branches") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_materializer3").toString
    // branch B sees a DIFFERENT corpus (docs 1-3 only), so its tf
    // table differs from branch A's — serving B's table to A would
    // change A's NLL VALUES, which the row-level compare catches
    val docsB = docs.filter(col("doc_id") <= 3)
    val expectA = graft.llm.LangModel.unigramNll(docs, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    val expectB = graft.llm.LangModel.unigramNll(docsB, "doc_id", "text")
      .orderBy("doc_id").collect().toSeq
    Materializer.set(Materializer.PersistedTable(dir))
    try {
      // two branches of one composed job hit the same reuse site;
      // the read-back is lazy, so with a shared table name branch A
      // would silently serve branch B's rows after the overwrite
      val a = graft.llm.LangModel.unigramNll(docs, "doc_id", "text")
      val b = graft.llm.LangModel.unigramNll(docsB, "doc_id", "text")
      assert(a.orderBy("doc_id").collect().toSeq === expectA)
      assert(b.orderBy("doc_id").collect().toSeq === expectB)
      // both invocations' tables exist side by side
      val tables = new java.io.File(dir).list().toSeq
        .filter(_.startsWith("langmodel_unigram_tf"))
      assert(tables.size >= 2, s"expected per-invocation tables, got $tables")
    } finally {
      Materializer.reset()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("reset restores the lazy localCheckpoint default") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_materializer2").toString
    Materializer.set(Materializer.PersistedTable(dir))
    Materializer.reset()
    try {
      // after reset, running a reuse-point operator writes NO tables
      graft.llm.LangModel.unigramNll(docs, "doc_id", "text").collect()
      assert(Option(new java.io.File(dir).list()).forall(_.isEmpty))
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }
}
