package graft

import graft.llm.Masking
import org.apache.spark.sql.functions._

/** Deterministic token masking ([[graft.llm.Masking]]). */
class MaskingSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "a completely different second document with its own words"),
    (3L, "")
  ).toDF("doc_id", "text")

  test("masking is deterministic across runs and partitionings") {
    def run(parts: Int) =
      Masking.maskTokens(docs.repartition(parts), "doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(run(1) == run(7))
  }

  test("masked token count matches the <mask> occurrences") {
    val rows = Masking.maskTokens(docs, "doc_id", "text").collect()
    rows.foreach { r =>
      val masked = r.getString(1)
      val occurrences = masked.split(" ").count(_ == "<mask>")
      assert(occurrences == r.getLong(4),
        s"doc ${r.getLong(0)}: $occurrences vs ${r.getLong(4)}")
    }
  }

  test("targets are exactly the masked-out tokens in order") {
    val rows = Masking.maskTokens(docs, "doc_id", "text", rate = 0.5).collect()
    rows.foreach { r =>
      val orig = Seq(r.getLong(0)).map(id => docs.filter($"doc_id" === id)
        .collect().head.getString(1)).head
        .trim.toLowerCase.split("\\s+").toSeq
      val masked = r.getString(1).split(" ").toSeq
      val targets = if (r.getString(2).isEmpty) Seq.empty
        else r.getString(2).split(" ").toSeq
      val recovered = masked.zip(orig).map {
        case ("<mask>", o) => Some(o)
        case _ => None
      }.flatten
      assert(recovered == targets)
    }
  }

  test("rate 0 masks nothing; rate 1 masks everything") {
    val none = Masking.maskTokens(docs, "doc_id", "text", rate = 0.0)
      .agg(sum("n_masked")).collect().head.getLong(0)
    assert(none == 0L)
    val all = Masking.maskTokens(docs, "doc_id", "text", rate = 1.0)
      .collect()
    all.foreach(r => assert(r.getLong(3) == r.getLong(4)))
  }

  test("empty docs are excluded") {
    assert(Masking.maskTokens(docs, "doc_id", "text")
      .filter($"doc_id" === 3L).count() == 0)
  }

  test("observed mask rate is near the requested rate on a big doc") {
    val big = Seq((1L, (1 to 2000).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    val r = Masking.maskTokens(big, "doc_id", "text", rate = 0.15)
      .collect().head
    val observed = r.getLong(4).toDouble / r.getLong(3)
    assert(observed > 0.10 && observed < 0.20, s"observed $observed")
  }
}
