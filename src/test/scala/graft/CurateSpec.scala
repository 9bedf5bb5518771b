package graft

import graft.llm.Curate
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSuite {
  import spark.implicits._

  // src A: two identical good docs (exact dedup keeps id 1), one spam;
  // src B: good docs that overflow a tiny budget; one doc under
  // minTokens that must fall at the quality gate
  private val docs = Seq(
    (1L, "good clean prose text here", "A", true),
    (2L, "good clean prose text here", "A", true),   // exact dup of 1
    (3L, "spam junk spam junk buy buy", "A", false),
    (4L, "good prose text words here again", "B", true),
    (5L, "good clean text words prose print", "B", true),
    (6L, "tiny doc", "B", true)                      // 2 tokens < 5
  ).toDF("doc_id", "text", "source", "is_en")

  test("every stage bites: gate, dedup, classifier, budget, split") {
    val out = Curate.pipeline(docs, "doc_id", "text", "source", "is_en",
      minTokens = 5, maxTokens = 100, budgetPerSource = 6)
      .orderBy("doc_id").collect()
    val ids = out.map(_.getLong(0)).toSeq
    // 2 (exact dup), 3 (negative score), 6 (too short) are gone;
    // src B's budget of 6 tokens admits only its best-scoring doc
    assert(ids.intersect(Seq(2L, 3L, 6L)).isEmpty)
    assert(ids.contains(1L))
    assert(out.count(_.getString(1) == "B") == 1)
    // split is the deterministic md5 bucket — recompute and compare
    for (r <- out) {
      val b = Integer.parseInt(org.apache.commons.codec.digest.DigestUtils
        .md5Hex(r.getLong(0).toString).substring(0, 2), 16)
      val expect = if (b < 230) "train" else if (b < 243) "val" else "test"
      assert(r.getString(4) == expect)
    }
  }

  test("budget admits by score order, not id order") {
    // make doc 11 clearly better-scoring than doc 10 (more positive
    // vocabulary mass); with a budget fitting only one, 11 must win
    val d = Seq(
      (10L, "good prose junk spam buy sell", "S", true),
      (11L, "good prose clean text nice words", "S", true),
      (12L, "spam junk buy sell trash waste", "S", false)
    ).toDF("doc_id", "text", "source", "is_en")
    val out = Curate.pipeline(d, "doc_id", "text", "source", "is_en",
      minTokens = 1, maxTokens = 100, budgetPerSource = 6)
      .collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(11L))
  }

  test("perplexity buckets: exact integer tertiles per language") {
    // lang X: 7 docs with distinct surprisal ranks -> 2/3/2 by
    // r*3<=n / r*3<=2n; lang Y: 1 doc (r=1, 3>1 and 3>2 -> tail)
    val scored = (
      (1 to 7).map(i => (i.toLong, "X", 10L, i * 1000000L)) :+
        (8L, "Y", 10L, 1000000L)
      ).toDF("doc_id", "lang", "n_terms", "sum_nll_e6")
    val out = Curate.perplexityBuckets(scored)
      .orderBy("doc_id").collect()
    assert(out.map(_.getString(4)).toSeq == Seq(
      "head", "head", "middle", "middle", "tail", "tail", "tail",
      "tail"))
    // tie on the sort key falls to doc_id: swap surprisals so docs
    // 1 and 2 tie; labels must not change
    val tied = Seq(
      (1L, "X", 10L, 5000000L), (2L, "X", 10L, 5000000L),
      (3L, "X", 10L, 9000000L)).toDF(
      "doc_id", "lang", "n_terms", "sum_nll_e6")
    assert(Curate.perplexityBuckets(tied).orderBy("doc_id")
      .collect().map(_.getString(4)).toSeq ==
      Seq("head", "middle", "tail"))
  }

  test("perplexity buckets: histogram path == windowed spec twin, " +
    "incl. ties, one-doc languages, and single-bin concentration") {
    // deterministic fixture: 3 langs of very different sizes, heavy
    // key ties (17 distinct surprisals across 400 docs), plus a lang
    // whose keys all land in ONE 1e4-wide bin (forces the degenerate
    // all-straddler path)
    val rows =
      (1 to 400).map { i =>
        (i.toLong, "en", 10L, ((i % 17) + 3) * 10000000L)
      } ++
      (401 to 430).map { i =>
        (i.toLong, "fr", 7L, ((i % 5) + 2) * 7000000L)
      } ++
      Seq((431L, "de", 10L, 50000000L)) ++
      (432 to 460).map { i =>          // all keys in [5e6, 5e6+1e3)
        (i.toLong, "xx", 1000L, 5000000000L + (i % 9) * 1000L)
      }
    val scored = rows.toDF("doc_id", "lang", "n_terms", "sum_nll_e6")
    for (parts <- Seq(1, 13)) {
      val d = if (parts == 1) scored else scored.repartition(parts)
      val fast = Curate.perplexityBuckets(d)
        .orderBy("doc_id").collect().toSeq
      val spec = Curate.perplexityBucketsWindowed(d)
        .orderBy("doc_id").collect().toSeq
      assert(fast == spec, s"parts=$parts")
    }
  }

  test("budget pre-pass == single-window spec twin on an adversarial " +
    "mega-source, under ties, boundary sums, and any partitioning") {
    // one source carries 50% of the corpus (the real LLM-mix shape the
    // pre-pass exists for); heavy score ties (17 distinct scores over
    // 600 docs) so the doc_id tie-break matters; token counts chosen
    // so some admitted prefix hits the budget EXACTLY (cum == budget
    // must stay admitted); a second tiny source; plus zero-token rows
    // (never advance the prefix, always admitted) and a null source
    val rows =
      (1 to 600).map(i => (i.toLong, "common-crawl",
        (i % 7 + 1).toLong, ((i % 17) + 1) * 1000000L)) ++
      (601 to 620).map(i => (i.toLong, "github", 5L, 3000000L)) ++
      Seq((621L, "github", 0L, 99000000L),
          (622L, null.asInstanceOf[String], 4L, 2000000L))
    val joined = rows.toDF("doc_id", "source", "n_tokens", "score_e6")
    for (budget <- Seq(0L, 25L, 100L, 1000L); parts <- Seq(1, 13)) {
      val d = if (parts == 1) joined else joined.repartition(parts)
      val fast = Curate.budgetFilter(d, budget)
        .orderBy("doc_id").collect().toSeq
      val spec = Curate.budgetFilter(d, budget, prePass = false)
        .orderBy("doc_id").collect().toSeq
      assert(fast == spec, s"budget=$budget parts=$parts")
    }
    // exact-boundary check is real in this fixture: budget=25 admits a
    // github prefix of 5+5+5+5+5 = 25 == budget plus the zero-token doc
    val b25 = Curate.budgetFilter(joined, 25L)
      .filter(col("source") === "github").collect()
    assert(b25.count(_.getLong(2) > 0) == 5 && b25.exists(_.getLong(2) == 0L))
  }

  test("pipeline is partitioning-independent") {
    val a = Curate.pipeline(docs, "doc_id", "text", "source", "is_en")
      .orderBy("doc_id").collect().toSeq
    val b = Curate.pipeline(docs.repartition(7), "doc_id", "text",
      "source", "is_en").orderBy("doc_id").collect().toSeq
    assert(a == b)
  }
}
