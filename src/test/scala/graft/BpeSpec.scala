package graft

import graft.llm.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSuite {
  import spark.implicits._

  test("learnMerges: classic low/lower/newest/widest example") {
    // frequencies engineered so the first merges are deterministic:
    // corpus: "low" x5, "lower" x2  ->  most frequent pair is (l,o)
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower"))
      .mkString(" ").split("@@").toSeq.toDF("text") // one row
    val merges = Bpe.learnMerges(docs, "text", numMerges = 3)
    assert(merges.head === ("l", "o"))
    assert(merges(1) === ("lo", "w"))
    // third merge: "low</w>" (5) beats "lowe" (2)
    assert(merges(2) === ("low", Bpe.EndOfWord))
  }

  test("encodeWord applies merges by rank") {
    val ranks = Map(("l", "o") -> 0, ("lo", "w") -> 1,
      ("low", Bpe.EndOfWord) -> 2)
    assert(Bpe.encodeWord("low", ranks) === Vector("low</w>"))
    assert(Bpe.encodeWord("lower", ranks) ===
      Vector("low", "e", "r", Bpe.EndOfWord))
    assert(Bpe.encodeWord("cab", Map.empty) ===
      Vector("c", "a", "b", Bpe.EndOfWord))
  }

  test("tokenCount: exact counts with and without merges") {
    val docs = Seq((1L, "low low lower"), (2L, ""), (3L, "zz"))
      .toDF("doc_id", "text")
    // no merges: every char + end marker is a token
    val raw = Bpe.tokenCount(docs, "text", Seq.empty)
      .select("doc_id", "n_bpe_exact").as[(Long, Int)].collect().toMap
    assert(raw === Map(1L -> (4 + 4 + 6), 2L -> 0, 3L -> 3))

    val merges = Bpe.learnMerges(docs.filter(col("doc_id") === 1), "text", 3)
    val enc = Bpe.tokenCount(docs, "text", merges)
      .select("doc_id", "n_bpe_exact").as[(Long, Int)].collect().toMap
    // "low" -> [low</w>] = 1 token; "lower" -> low,e,r,</w> = 4
    assert(enc(1L) === 1 + 1 + 4)
    assert(enc(2L) === 0)
  }

  test("learning is deterministic and consistent at corpus scale") {
    val docs = Tables.t(spark, "/root/testdata/sf0.001", "documents")
    val m1 = Bpe.learnMerges(docs, "text", numMerges = 50, maxVocab = 2000)
    val m2 = Bpe.learnMerges(docs.repartition(7), "text",
      numMerges = 50, maxVocab = 2000)
    assert(m1 === m2, "merge list depends on partitioning")
    val counted = Bpe.tokenCount(docs.select("doc_id", "text"), "text", m1)
    // more merges can only shrink or keep token counts vs char-level
    val charLevel = Bpe.tokenCount(docs.select("doc_id", "text"), "text",
      Seq.empty, outCol = "n_chars_tok")
    val joined = counted.join(charLevel, "doc_id")
      .select(col("n_bpe_exact"), col("n_chars_tok"))
      .as[(Int, Int)].collect()
    assert(joined.forall { case (b, c) => b <= c && b > 0 })
  }
}
