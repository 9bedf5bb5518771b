package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

class IncrementalDedupSpec extends SparkSuite {
  import spark.implicits._

  private def sentence(seed: Int, n: Int = 30): String = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)(s"w${rnd.nextInt(400)}").mkString(" ")
  }

  private val corpus = (1L to 50L).map(i => (i, sentence(i.toInt)))
    .toDF("doc_id", "text")

  test("batch clone flagged against a parquet-persisted signature catalog") {
    val dir = java.nio.file.Files.createTempDirectory("sigcat").toString
    Dedup.signatureCatalog(corpus, "doc_id", "text", k = 5, numHashes = 64)
      .write.mode("overwrite").parquet(dir)
    // the persistence contract: candidates come from the STORED
    // signatures (array<long> through parquet), not a recompute
    val catSigs = spark.read.parquet(dir)
    val batch = Seq(
      (101L, sentence(7)),              // exact clone of doc 7
      (102L, sentence(7) + " extra"),   // near clone of doc 7
      (103L, sentence(9999)))           // fresh — matches nothing
      .toDF("doc_id", "text")
    val out = Dedup.nearDuplicatesAgainstCatalog(batch, "doc_id", "text",
      catSigs, corpus, threshold = 0.9, k = 5, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byNew = out.groupBy(_._1)
    assert(byNew(101L).exists(t => t._2 == 7L && t._3 == 1.0),
      s"exact clone must hit doc 7 at jaccard 1.0; got ${out.toSeq}")
    assert(byNew(102L).exists(t => t._2 == 7L && t._3 >= 0.9),
      s"near clone must hit doc 7 above threshold; got ${out.toSeq}")
    assert(!byNew.contains(103L),
      s"fresh doc must match nothing; got ${out.toSeq}")
  }

  test("crossCandidates never pairs within a side, and caps buckets") {
    // DISJOINT id ranges so within-side leakage is observable: the
    // right side re-publishes every left text under id+1000, and the
    // left side contains exact dup pairs (1,2) and (3,4) that must
    // NOT surface — output pairs are (new, cat) only, by construction
    val leftDocs = (1L to 25L).map(i =>
      (i, if (i == 2L) sentence(1) else if (i == 4L) sentence(3)
          else sentence(i.toInt))).toDF("doc_id", "text")
    val rightDocs = (1L to 25L).map(i => (i + 1000L, sentence(i.toInt)))
      .toDF("doc_id", "text")
    val ls = Dedup.signatureCatalog(leftDocs, "doc_id", "text",
      k = 5, numHashes = 64)
    val rs = Dedup.signatureCatalog(rightDocs, "doc_id", "text",
      k = 5, numHashes = 64)
    val pairs = Dedup.crossCandidates(ls, rs, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.forall { case (n, c) => n <= 25L && c > 1000L },
      s"every pair must cross new->catalog; got ${pairs.toSeq}")
    assert(!pairs.contains((1L, 2L)) && !pairs.contains((3L, 4L)),
      "within-side exact dups must never pair")
    // every left doc's text exists on the right: all 25 must hit
    val hits = pairs.filter { case (n, c) =>
      c == n + 1000L || (n == 2L && c == 1001L) || (n == 4L && c == 1003L) }
    assert(hits.map(_._1).distinct.length == 25,
      s"all 25 cross-set exact dups must surface; got ${pairs.toSeq}")
    // maxBucketSize = 0 drops every bucket: no candidates at all
    val none = Dedup.crossCandidates(ls, rs, numHashes = 64,
      bands = 16, maxBucketSize = 0).count()
    assert(none == 0L)
  }

  test("verify prunes the corpus with a semi-join before shingling") {
    val sigs = Dedup.signatureCatalog(corpus, "doc_id", "text",
      k = 5, numHashes = 64)
    val batch = Seq((101L, sentence(3))).toDF("doc_id", "text")
    val plan = Dedup.nearDuplicatesAgainstCatalog(batch, "doc_id", "text",
      sigs, corpus, threshold = 0.9, k = 5, numHashes = 64, bands = 16)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"),
      s"corpus shingling must be gated by a semi-join on candidate ids:\n$plan")
  }
}
