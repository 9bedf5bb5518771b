package graft

import graft.llm.Packing
import graft.operators.Prefix
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("chunkWindows: sliding windows with short tail") {
    val df = Seq((1L, "a b c d e f g")).toDF("doc_id", "text")
    val out = Packing.chunkWindows(df, "doc_id", "text", window = 3, stride = 2)
      .orderBy("chunk_id")
      .select("chunk_id", "n_chunk_tokens", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    assert(out === Seq((0, 3, "a b c"), (1, 3, "c d e"),
      (2, 3, "e f g"), (3, 1, "g")))
  }

  test("chunkWindows: whitespace-only docs produce no chunks") {
    val df = Seq((1L, "   "), (2L, "x y")).toDF("doc_id", "text")
    val out = Packing.chunkWindows(df, "doc_id", "text", 4, 4)
    assert(out.select("doc_id").as[Long].collect().toSeq === Seq(2L))
  }

  test("chunkWindows: stride larger than window skips tokens") {
    val df = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val out = Packing.chunkWindows(df, "doc_id", "text", window = 2, stride = 4)
      .orderBy("chunk_id").select("chunk_text").as[String].collect().toSeq
    assert(out === Seq("a b", "e"))
  }

  test("Prefix.runningSum matches the single-partition window") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(100).toLong))
    // shuffled input order, forced multi-partition
    val df = spark.createDataFrame(rnd.shuffle(rows)).toDF("id", "v")
      .repartition(7)
    val fast = Prefix.runningSum(df, "id", "v", "cum", numPartitions = 5)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    val naive = Prefix.runningSumNaive(df, "id", "v", "cum")
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(fast === naive)
    assert(fast(500L) === rows.map(_._2).sum)
  }

  test("packConcat: seq assignment and boundary spans") {
    val df = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("doc_id", "n_tokens")
    val out = Packing.packConcat(df, "doc_id", "n_tokens", capacity = 8)
      .orderBy("doc_id")
      .select("doc_id", "seq_id", "spans_boundary")
      .as[(Long, Long, Boolean)].collect().toSeq
    // stream positions: [0,5) [5,10) [10,15); cuts at 8 and 16
    assert(out === Seq((1L, 0L, false), (2L, 0L, true), (3L, 1L, false)))
  }

  test("packGreedy: first-fit bins, oversized docs isolated, per-group reset") {
    val df = Seq(
      ("en", 1L, 5L), ("en", 2L, 4L), ("en", 3L, 3L), ("en", 4L, 9L),
      ("de", 10L, 20L), ("de", 11L, 2L)
    ).toDF("lang", "doc_id", "n_tokens")
    val out = Packing.packGreedy(df, "lang", "doc_id", "n_tokens", capacity = 8)
      .orderBy("lang", "doc_id")
      .select("lang", "doc_id", "bin").as[(String, Long, Long)]
      .collect().toSeq
    assert(out === Seq(
      // de: oversized first doc gets bin 0 alone; next starts bin 1
      ("de", 10L, 0L), ("de", 11L, 1L),
      // en: 5 | 4+3 | 9
      ("en", 1L, 0L), ("en", 2L, 1L), ("en", 3L, 1L), ("en", 4L, 2L)))
  }

  test("packGreedy: non-numeric ids keep their type and sort order") {
    val df = Seq(("en", "doc-b", 5L), ("en", "doc-a", 5L), ("en", "doc-c", 5L))
      .toDF("lang", "doc_id", "n_tokens")
    val out = Packing.packGreedy(df, "lang", "doc_id", "n_tokens", 10)
      .select("doc_id", "bin").as[(String, Long)].collect().toMap
    // string order: a,b fill bin 0; c opens bin 1
    assert(out === Map("doc-a" -> 0L, "doc-b" -> 0L, "doc-c" -> 1L))
  }

  test("packGreedy: null group is distinct from the string 'null'") {
    val df = Seq((Option("null"), 1L, 5L), (Option.empty[String], 2L, 5L),
      (Option("null"), 3L, 5L), (Option.empty[String], 4L, 5L))
      .toDF("lang", "doc_id", "n_tokens")
    val out = Packing.packGreedy(df, "lang", "doc_id", "n_tokens", 8)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    // two independent groups of two docs each: bins restart per group
    assert(out === Map(1L -> 0L, 3L -> 1L, 2L -> 0L, 4L -> 1L))
  }

  test("packGreedy: null token counts pack as zero") {
    val df = Seq(("en", 1L, Some(5L)), ("en", 2L, None), ("en", 3L, Some(5L)))
      .toDF("lang", "doc_id", "n_tokens")
    val out = Packing.packGreedy(df, "lang", "doc_id", "n_tokens", 10)
      .select("doc_id", "bin").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 0L, 2L -> 0L, 3L -> 0L))
  }

  test("Prefix.runningSum: null values add zero") {
    val df = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("id", "v")
    val out = Prefix.runningSum(df, "id", "v", "cum", numPartitions = 2)
      .select("id", "cum").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 5L, 2L -> 5L, 3L -> 12L))
  }

  test("packGreedy: bins never exceed capacity unless a single doc does") {
    val rnd = new scala.util.Random(11)
    val rows = (1L to 300L).map(i => ("g" + (i % 3), i, 1L + rnd.nextInt(60)))
    val df = rnd.shuffle(rows).toDF("lang", "doc_id", "n_tokens")
    val bins = Packing.packGreedy(df, "lang", "doc_id", "n_tokens", 100)
      .groupBy("lang", "bin")
      .agg(sum("n_tokens").as("tot"), count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    bins.foreach { case (_, _, tot, n) =>
      assert(tot <= 100 || n === 1L)
    }
    // nothing lost
    assert(bins.map(_._3).sum === rows.map(_._3).sum)
  }
}
