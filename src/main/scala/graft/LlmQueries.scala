package graft

import graft.llm.{Classifier, Curate, Dedup, Dsir, IvfPq, Pq, GroupSimilarity, LangModel, Mixing, Packing, Retrieval, Similarity, Text, Winnow}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Materializer.MaterializeOps

/** LLM-training-data pipeline queries: text analysis, dedup families,
  * similarity search over the `documents` / `embeddings` tables.
  *
  * Self-dup construction: several dedup queries union the corpus with a
  * clone of itself (ids offset by [[LlmQueries.CloneOffset]]) so that
  * every document has exactly one known near-duplicate — making the
  * minhash-LSH / embedding-LSH pipelines oracle-checkable end to end
  * (identical inputs must collide in every band and score 1.0). */
object LlmQueries {
  import Tables.t

  val CloneOffset = 100000L

  private def docsWithClones(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    d.unionByName(d.select((col("doc_id") + CloneOffset).as("doc_id"),
      col("text")))
  }

  /** Text stats per language: token counts, punctuation, marker words. */
  def textStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(Text.tokenCount(col("text"))).cast("bigint").as("n_tokens"),
        sum(Text.punctCount(col("text"))).cast("bigint").as("n_punct"),
        sum(Text.substringCount(
          concat(lit(" "), lower(col("text")), lit(" ")), " the "))
          .cast("bigint").as("n_the"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
      .orderBy("lang")

  /** Per-doc quality components: token/stopword counts + decile bucket. */
  def textQuality(s: SparkSession, dir: String): DataFrame = {
    val tc = Text.tokenCount(col("text"))
    val sc = Text.stopwordCount(col("text"))
    t(s, dir, "documents").select(col("doc_id"),
      tc.as("n_tokens"), sc.as("n_stop"),
      floor((sc * 10).cast("double") / tc).cast("int").as("stop_decile"))
      .orderBy("doc_id")
  }

  /** BPE-ish token estimate (GPT-2-style pre-tokenizer approximation)
    * per document, next to the whitespace count. */
  def textBpeTokens(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      Text.bpeTokenCount(col("text")).as("n_bpe"),
      Text.tokenCount(col("text")).as("n_ws"))
      .orderBy("doc_id")

  /** Composite C4/Gopher-style quality score. */
  def textQualityScore(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      Text.qualityScore(col("text")).as("quality"))
      .orderBy("doc_id")

  /** Heuristic language ID (marker-word argmax). */
  def textLangId(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"), col("lang"),
      Text.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  /** Character-distribution entropy stats ([[Text.charEntropy]]):
    * exact integer (n_cp, sum c*round(ln c * 1e6)) per doc — the
    * gibberish/binary detection signal. */
  def charEntropy(s: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(s)
    t(s, dir, "documents")
      .select(col("doc_id"), Text.charEntropy(col("text")).as("e"))
      .select(col("doc_id"), col("e.n_chars").as("n_cp"),
        col("e.sum_clnc_e6").as("sum_clnc_e6"))
      .orderBy("doc_id")
  }

  /** Rolling-hash fingerprint: collision-free distinct count equals the
    * distinct normalized-text count. */
  def fingerprintDistinct(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .agg(countDistinct(Text.fingerprint(col("text"))).as("n_distinct"))

  /** Exact dedup stats: total vs distinct md5 keys. */
  def dedupExactStats(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(Dedup.exactKey(col("text"))).as("n_distinct"))

  /** Exact dup groups on the cloned corpus: every text appears at
    * least twice (its clone), and texts duplicated in the BASE corpus
    * merge into one larger group; keep-id is the lowest original. */
  def dedupExactGroups(s: SparkSession, dir: String): DataFrame =
    Dedup.exactDupGroups(docsWithClones(s, dir), "doc_id", "text")
      .orderBy("keep_id")

  /** MinHash-LSH near-dup detection on the cloned corpus: each doc must
    * pair with its clone at jaccard 1.0 (identical shingle sets collide
    * in every band). Banded LSH + verify join — no all-pairs. */
  def minhashNearDups(s: SparkSession, dir: String): DataFrame =
    Dedup.nearDuplicates(docsWithClones(s, dir), "doc_id", "text",
      threshold = 0.9, k = 5, numHashes = 64, bands = 16)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .orderBy("id_a", "id_b")

  /** Greedy near-dup removal over the original corpus: survivors are
    * docs never appearing as the higher id of a >= 0.9 Jaccard pair. */
  def dedupKeep(s: SparkSession, dir: String): DataFrame =
    Dedup.dropNearDuplicates(t(s, dir, "documents"), "doc_id", "text",
      threshold = 0.9, k = 5, numHashes = 64, bands = 16)
      .select(col("doc_id"))
      .orderBy("doc_id")

  /** Full cleaning pipeline: quality gate + exact dedup + near-dup
    * removal, oracle-checked end to end (the DuckDB oracle replays the
    * same stage order: token gate, then true-Jaccard pair drop over
    * the survivors). */
  def cleanCorpus(s: SparkSession, dir: String): DataFrame =
    graft.llm.Clean.corpus(t(s, dir, "documents"), "doc_id", "text",
      graft.llm.Clean.Config(minTokens = 5, nearDupThreshold = 0.9,
        numHashes = 64, bands = 16))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")

  /** SimHash near-dup pipeline with an exact verify stage: distance-0
    * candidates (identical 64-bit simhash) filtered to pairs whose
    * normalized texts are equal. Identical texts always collide in
    * every simhash band, so the result provably equals the set of
    * norm-equal pairs — which is what the DuckDB oracle computes.
    *
    * Scale shape: the verify join carries only (rolling-hash
    * fingerprint, normalized length) per side — 12 bytes — never the
    * corpus text. Fingerprint+length equality stands in for norm
    * equality (a false positive needs a 64-bit polynomial-hash
    * collision between same-length strings that also share a 64-bit
    * simhash — far below any corpus scale). */
  def simhashNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = docsWithClones(s, dir)
    // spread: the simhash+fingerprint+normalize chain must not run at
    // scan width (1-2 partitions); localCheckpoint: without it the
    // join's isnotnull key conditions push `fingerprintexpr(text)` down
    // INTO both sides' parquet scans and broadcast builds — the heavy
    // chain evaluated 4x, twice at scan width. The checkpointed table
    // is (id, sh, fp, nlen) — 28 bytes/doc — and carries ALL the
    // per-doc hashes in ONE corpus pass: the banding stage reads its
    // (doc_id, sh) projection instead of running a second scan +
    // simhash kernel pass of its own; lazy so the first consumer
    // populates the blocks (NOTES_r10 §6).
    val n = Dedup.spread(d, col("doc_id")).select(col("doc_id"),
      Dedup.simhash(col("text")).as("sh"),
      Text.fingerprint(col("text")).as("fp"),
      length(Text.normalize(col("text"))).as("nlen"))
      .materialized("q_simhash_spread")
    Dedup.simhashNearDupsFromHashes(n.select("doc_id", "sh"), maxDist = 0)
      .join(n.select(col("doc_id").as("id_a"), col("fp").as("fp_a"),
        col("nlen").as("nlen_a")), "id_a")
      .join(n.select(col("doc_id").as("id_b"), col("fp").as("fp_b"),
        col("nlen").as("nlen_b")), "id_b")
      .filter(col("fp_a") === col("fp_b") && col("nlen_a") === col("nlen_b"))
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy("id_a", "id_b")
  }

  /** n-gram Jaccard over sampled candidate pairs (deterministic pair
    * construction: doc i vs doc i+1 within the same lang). */
  def ngramJaccardPairs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val pairs = d.select(col("doc_id").as("id_a"), col("lang"))
      .join(d.select(col("doc_id").as("id_b"), col("lang")), "lang")
      .filter(col("id_b") === col("id_a") + 1)
      .select("id_a", "id_b")
    Dedup.ngramJaccard(pairs, d, "doc_id", "text", k = 3)
      .select(col("id_a"), col("id_b"),
        (floor(col("jaccard") * 1000)).cast("bigint").as("jaccard_mills"))
      .orderBy("id_a")
  }

  /** Brute-force cosine top-1 neighbor for the first 25 vectors. */
  def annBruteForceTop1(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.bruteForceTopK(e, e.filter(col("vec_id") < 25), k = 1)
      .select(col("query_id"), col("nn_id"))
      .orderBy("query_id")
  }

  /** LSH-bucketed ANN (rows-only; recall is asserted in ScalaTest). */
  def annLsh(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.lshTopK(e, e.filter(col("vec_id") < 25), k = 1, dim = 64,
      nBits = 6)
      .select(col("query_id"), col("nn_id"), col("rank"))
      .orderBy("query_id")
  }

  /** Embedding-cosine near-dups on a cloned corpus: every vector pairs
    * with its clone (cosine ~ 1.0 >= 0.999) via LSH buckets. */
  def embeddingNearDups(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    val both = e.unionByName(e.select(
      (col("vec_id") + CloneOffset).as("vec_id"), col("embedding")))
    Similarity.embeddingNearDups(both, threshold = 0.999, dim = 64,
      nBits = 8)
      .select(col("id_a"), col("id_b"))
      .orderBy("id_a", "id_b")
  }

  /** Corpus card — the dataset-documentation summary per source in
    * ONE aggregation pass: volume (docs, tokens), exact-dup rate
    * (distinct text hashes), length distribution (exact median), and
    * language mix. The "datasheet for the dataset" every corpus
    * release ships; each stat is an existing verified primitive
    * (tokenCount, exactKey, percentile) composed into one shuffle. */
  def corpusCard(s: SparkSession, dir: String): DataFrame = {
    val nTok = Text.tokenCount(col("text")).cast("bigint")
    t(s, dir, "documents")
      .select(col("source"), col("lang"), nTok.as("n_tokens"),
        Dedup.exactKey(col("text")).as("th"))
      .groupBy("source")
      .agg(
        count(lit(1)).cast("bigint").as("n_docs"),
        sum(col("n_tokens")).cast("bigint").as("n_tokens"),
        countDistinct(col("th")).cast("bigint").as("n_distinct_texts"),
        round(expr("percentile(n_tokens, 0.5)"), 6).as("p50_tokens"),
        sum(when(col("lang") === "en", 1L).otherwise(0L))
          .cast("bigint").as("n_en"))
      .orderBy("source")
  }

  /** Deterministic shuffle-and-shard plan
    * ([[graft.operators.Layout.shuffledShards]]): every doc's shard
    * and within-shard position, reproducible on any engine — the
    * write-the-training-corpus stage. The oracle recomputes the hash
    * shard and md5-order rank exactly. */
  def shardPlan(s: SparkSession, dir: String): DataFrame = {
    val sharded = graft.operators.Layout.shuffledShards(
      t(s, dir, "documents").select("doc_id"), col("doc_id"), 8)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard")
      .orderBy(md5(col("doc_id").cast("string")),
        col("doc_id").cast("string"))
    sharded.withColumn("pos",
        row_number().over(w).cast("bigint"))
      .orderBy("shard", "pos")
  }

  /** Deterministic weighted sampling without replacement
    * ([[graft.llm.Sampling.weightedSample]]): 100 docs biased by
    * n_chars — the reproducible importance-sampling primitive. The
    * DuckDB oracle computes the identical hash-derived rank keys. */
  def weightedSample(s: SparkSession, dir: String): DataFrame =
    graft.llm.Sampling.weightedSample(
      t(s, dir, "documents").select("doc_id", "source", "n_chars"),
      col("doc_id"), col("n_chars"), n = 100)
      .orderBy("doc_id")

  /** End-to-end curation pipeline ([[graft.llm.Curate.pipeline]]):
    * quality gate → exact dedup → in-corpus NB classifier → 300-token
    * per-source budget (best-scored first) → hash split. The whole
    * composed chain is gated against one DuckDB oracle replaying
    * every stage. */
  def curatePipeline(s: SparkSession, dir: String): DataFrame =
    Curate.pipeline(
      t(s, dir, "documents").withColumn("is_en", col("lang") === "en"),
      "doc_id", "text", "source", "is_en",
      minTokens = 5, maxTokens = 1000000, budgetPerSource = 300L)
      .orderBy("doc_id")

  /** Cross-document shared-span report ([[Dedup.crossDocSpans]]):
    * maximal word spans covered by 5-grams occurring in 2+ documents —
    * the exact-substring dedup signal at word-gram granularity. The
    * corpus has ~1k naturally repeated 5-grams, so the report is
    * non-trivial without any constructed clones. */
  def crossDocSpans(s: SparkSession, dir: String): DataFrame =
    Dedup.crossDocSpans(t(s, dir, "documents"), "doc_id", "text",
      k = 5, maxDocFreq = 1000)
      .orderBy("doc_id", "span_start")

  /** SemDeDup-style semantic dedup ([[Similarity.semanticDedup]]) on a
    * constructed corpus: every vector gets an exact clone (cosine 1)
    * and every 3rd additionally a first-element-perturbed near-clone
    * (cosine ≥ 0.9998 for unit vectors — comfortably above the 0.999
    * cut, while unrelated pairs stay ≤ ~0.55). Clusters of 2 and 3
    * must resolve by connected components inside KMeans cells; the
    * DuckDB oracle replays exact all-pairs cosine + a recursive-CTE
    * closure, so cell assignment (assignTop=2), in-cell pair
    * generation, and the stars loop are all gated end to end.
    *
    * Parity honesty: the codebook is deterministic (sample-trained
    * driver-side Lloyd's — bit-identical under any partitioning), and
    * exact-clone pairs co-cell by construction, so their edges can
    * never be missed; near-clone pairs could in principle straddle a
    * Voronoi boundary into disjoint top-2 cell sets — that recall gap
    * is inherent to cluster-partitioned dedup (the reason assignTop
    * exists) and is empirically zero on this frozen corpus. */
  def semDedup(s: SparkSession, dir: String): DataFrame = {
    val (all, ne) = semCorpus(s, dir)
    // cells ∝ corpus: k = n/300 keeps per-cell density (and with it
    // the in-cell quadratic compare) CONSTANT as the corpus grows —
    // the sf1 probe measured fixed-16 at 34-47 s vs scaled at 4.2 s
    // with bit-identical keep sets (SemScaleProbe; exact clones
    // co-cell at any k, assignTop=2 covers boundary near-clones).
    // n derives from the base-table count (an unfiltered count() is
    // a parquet-footer metadata read, no data scan): the constructed
    // corpus is 2 clones per base row + one near-dup per 3rd row.
    // Floor 16 keeps sf0.01/sf0.1 results literally unchanged.
    val k = math.max(16, ((2 * ne + (ne + 2) / 3) / 300L).toInt)
    Similarity.semanticDedup(all, threshold = 0.999,
      nCentroids = k, assignTop = 2)
      .orderBy("vec_id")
  }

  /** The frozen semdedup corpus: base embeddings + exact clones +
    * a near-dup (first dim +0.02) for every third base vector. */
  private def semCorpus(s: SparkSession, dir: String)
  : (DataFrame, Long) = {
    val e = t(s, dir, "embeddings").select("vec_id", "embedding")
    val near = e.filter(pmod(col("vec_id"), lit(3)) === 0)
      .select((col("vec_id") + 200000L).as("vec_id"),
        concat(array(element_at(col("embedding"), 1) + lit(0.02f)),
          slice(col("embedding"), lit(2), size(col("embedding")) - 1))
          .as("embedding"))
    val all = e
      .unionByName(e.select((col("vec_id") + CloneOffset).as("vec_id"),
        col("embedding")))
      .unionByName(near)
    (all, e.count())
  }

  /** Hierarchical-router twin of [[semDedup]] (r13 judge ask #2): the
    * k ≥ hierK scale path — exact-collapse pre-pass + two-level
    * O(√k) router — was spec-pinned and sf10-diff-measured but had no
    * DuckDB hash gate. This query forces `hierK` BELOW its cell count
    * so the scale path runs at every sf against the SAME exact
    * all-pairs-closure oracle as q_semdedup: zero false merges AND
    * full recall through the coarse→fine route are hash-gated every
    * round. The conf override is scoped to plan construction (the
    * router embeds at build time) and restored after. */
  def semDedupHier(s: SparkSession, dir: String): DataFrame = {
    val (all, ne) = semCorpus(s, dir)
    // force k over the lowered gate but keep cells ∝ corpus above it
    val k = math.max(64, ((2 * ne + (ne + 2) / 3) / 300L).toInt)
    // save/restore rather than unset: a pre-existing session-level
    // override of these knobs must survive this query's build
    val prevK = s.conf.getOption("spark.graft.semdedup.hierK")
    val prevProbes = s.conf.getOption("spark.graft.semdedup.coarseProbes")
    s.conf.set("spark.graft.semdedup.hierK", "64")
    // deeper routing than q_semdedup's flat assignTop=2: the gate
    // demands EXACT agreement with the all-pairs closure, and at
    // 2 coarse probes × 2 fine cells six sf1 near-pairs straddled the
    // route (base and near vector probing disjoint fine sets — the
    // r14 sweep caught it at 0.013%). 4×4 keeps the per-row cost
    // O(√k) and recalls every pair at sf0.01/sf0.1/sf1 — the measured
    // dial between "scale path" and "zero loss on the gated corpus"
    s.conf.set("spark.graft.semdedup.coarseProbes", "4")
    try Similarity.semanticDedup(all, threshold = 0.999,
      nCentroids = k, assignTop = 4).orderBy("vec_id")
    finally {
      prevK.fold(s.conf.unset("spark.graft.semdedup.hierK"))(
        v => s.conf.set("spark.graft.semdedup.hierK", v))
      prevProbes.fold(s.conf.unset("spark.graft.semdedup.coarseProbes"))(
        v => s.conf.set("spark.graft.semdedup.coarseProbes", v))
    }
  }

  /** PII redaction audit: deterministic PII synthesized onto each doc
    * (email + IPv4 + phone), then redacted; the oracle replays the
    * same RE2-compatible patterns. */
  def piiRedact(s: SparkSession, dir: String): DataFrame = {
    val withPii = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" reach me at user"), col("doc_id"), lit("@mail.example"),
        lit(" or 10.0."), pmod(col("doc_id"), lit(256)), lit(".7"),
        lit(" tel 1 (415) 555-01"),
        lpad(pmod(col("doc_id"), lit(100)).cast("string"), 2, "0"))
        .as("text"))
    val red = Text.redactPii(col("text"))
    withPii.select(col("doc_id"),
      (Text.substringCount(red, "<EMAIL>") +
        Text.substringCount(red, "<IP>") +
        Text.substringCount(red, "<PHONE>")).as("n_pii"),
      call_function("right", red, lit(60)).as("redacted_tail"))
      .orderBy("doc_id")
  }

  /** Word-repetition quality signal per doc (Gopher-style). */
  def dupWordRatio(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents").select(col("doc_id"),
      floor(Text.dupWordRatio(col("text")) * 1000).cast("bigint")
        .as("dup_mills"))
      .orderBy("doc_id")

  /** Train/test decontamination: the eval set is every 7th doc; any
    * training doc sharing an 8-word shingle with it (itself, its
    * planted near-dups, boilerplate twins) is dropped. */
  def decontaminateKeep(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.llm.Clean.decontaminate(d,
      d.filter(pmod(col("doc_id"), lit(7)) === 0), "doc_id", "text", k = 8)
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  /** Contamination fraction report: every doc's distinct 8-shingle
    * overlap with the eval slice (doc_id %% 7 == 0) — the GPT-3-style
    * published overlap measurement; eval docs themselves report 100%%. */
  def contamination(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.llm.Clean.contaminationReport(d,
      d.filter(pmod(col("doc_id"), lit(7)) === 0), "doc_id", "text", k = 8)
      .orderBy("doc_id")
  }

  /** Per-doc repeated-span stats: winnowing-sampled 64-char windows
    * whose exact content recurs anywhere in the corpus (substring-
    * level dedup signal — catches boilerplate that document-level
    * dedup misses, at any byte alignment). */
  def repeatedSpanStats(s: SparkSession, dir: String): DataFrame =
    Dedup.repeatedSpans(t(s, dir, "documents"), "doc_id", "text",
      spanChars = 64, winnowW = 31)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("n_sites") > 1, 1).otherwise(0)).cast("bigint")
          .as("n_repeated"))
      .orderBy("doc_id")

  /** Repeated-span REMOVAL (the Lee et al. ExactSubstr transform,
    * winnowing-sampled): every repeated 64-char window is excised
    * except its globally first occurrence; the oracle replays the
    * winnow selection AND the running-cursor surgery on the actual
    * span strings. */
  def spanRemoval(s: SparkSession, dir: String): DataFrame =
    Dedup.removeRepeatedSpans(t(s, dir, "documents"), "doc_id", "text",
      spanChars = 64, winnowW = 31)
      .orderBy("doc_id")

  /** INCREMENTAL span removal (crawl-snapshot shape): a span catalog
    * built from the doc_id %% 7 == 0 "corpus" slice excises every
    * matching sampled window from the remaining "batch" docs — no
    * keeper, the corpus holds the canonical copy, and the corpus is
    * never re-read at match time. */
  def spanRemovalIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val catalog = Dedup.spanCatalog(
      d.filter(pmod(col("doc_id"), lit(7)) === 0), "doc_id", "text")
    Dedup.removeCatalogSpans(
      d.filter(pmod(col("doc_id"), lit(7)) =!= 0), "doc_id", "text",
      catalog)
      .orderBy("doc_id")
  }

  /** Deterministic synthetic URL per doc (both engines derive the
    * SAME string from source + doc_id arithmetic, so the oracle
    * replays it): mixed-case scheme/host, rotating TLD pool covering
    * every PSL rule shape — plain TLDs, two-label exacts (co.uk,
    * com.au), a wildcard TLD (`*.ck`), a two-label wildcard base
    * (`*.kawasaki.jp`), a three-label exact (act.edu.au), the
    * exception zones (`!www.ck`, `!city.kawasaki.jp`), a
    * private-section platform suffix (blogspot.com), and a DEEP
    * wildcard (`*.compute.amazonaws.com`, suffix of four labels) —
    * plus a default port on every third doc, tracking params and a
    * fragment, so every canonicalization AND suffix-matching rule
    * fires. */
  private def syntheticUrl: Column = concat(
    when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTPS://WWW."))
      .otherwise(lit("http://Blog.")),
    col("source"), lit("-news."),
    element_at(typedlit(Seq("com", "co.uk", "org", "com.au", "de",
      "ck", "kawasaki.jp", "act.edu.au", "www.ck", "city.kawasaki.jp",
      "blogspot.com", "us-west-2.compute.amazonaws.com")),
      (pmod(col("doc_id"), lit(12)) + 1).cast("int")),
    when(pmod(col("doc_id"), lit(3)) === 0, lit(":443")).otherwise(lit("")),
    lit("/articles/"), col("doc_id").cast("string"),
    lit("?utm_source=rss&ref=home&utm_campaign=x&page="),
    pmod(col("doc_id"), lit(7)).cast("string"), lit("#sec"))

  /** URL canonicalization + registrable-domain extraction over the
    * derived URLs ([[graft.llm.Domains]]): lowercased scheme/host,
    * default-port strip, tracking-param removal, fragment drop,
    * multi-part public-suffix handling. */
  def urlCanon(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(col("doc_id"), syntheticUrl.as("url"))
      // materialize host in its OWN projection: registrableDomain's
      // generated when-chain references the host ~50 times, and
      // inlining the hostOf regex tree at every site blew the plan up
      // ~5x (compile cost + 64KB-codegen-limit pressure). hostOf is
      // non-cheap, so CollapseProject keeps the stage split and the
      // regex runs once per row.
      .select(col("doc_id"), col("url"),
        graft.llm.Domains.hostOf(col("url")).as("host"))
      .select(col("doc_id"), col("url"),
        graft.llm.Domains.canonicalUrl(col("url")).as("canon_url"),
        col("host"),
        graft.llm.Domains.registrableDomain(col("host")).as("domain"))
      .orderBy("doc_id")

  /** Per-registrable-domain corpus stats (doc/URL/char counts) — the
    * table a domain quality prior or blocklist review reads. */
  def domainStats(s: SparkSession, dir: String): DataFrame =
    graft.llm.Domains.domainStats(
      t(s, dir, "documents").withColumn("url", syntheticUrl),
      "url", "text")
      .orderBy("domain")

  /** URL-level exact dedup: docs mapped onto 50 canonical URLs (mod
    * arithmetic; every 97th doc gets an unparseable URL and passes
    * through fail-open for dedup, fail-closed for blocklists) — keep
    * the minimum doc_id per canonical URL. */
  def urlDedup(s: SparkSession, dir: String): DataFrame = {
    val url = when(pmod(col("doc_id"), lit(97)) === 0, lit("not a url"))
      .otherwise(concat(lit("https://www.example."),
        element_at(typedlit(Seq("com", "co.uk", "org")),
          (pmod(col("doc_id"), lit(50)) % 3 + 1).cast("int")),
        lit("/p/"), pmod(col("doc_id"), lit(50)).cast("string"),
        lit("?utm_source=x&n="), pmod(col("doc_id"), lit(50)).cast("string")))
    graft.llm.Domains.dropUrlDuplicates(
      t(s, dir, "documents").withColumn("url", url), "doc_id", "url")
      .select(col("doc_id"))
      .orderBy("doc_id")
  }

  /** The full Gopher rule battery as exact integer counts + the keep
    * verdict. The fixtures' repetitive synthetic text exercises the
    * word-count / mean-word-length / stopword / top- and dup-n-gram
    * rules hard; the line/bullet rules are degenerate here (single
    * line, no bullets) and are pinned by GopherSpec instead. */
  def gopherFlags(s: SparkSession, dir: String): DataFrame = {
    graft.GraftFunctions.register(s)
    val r = graft.llm.Gopher.report(col("text"))
    t(s, dir, "documents")
      .select(col("doc_id"), r.as("r"),
        graft.llm.Gopher.keep(r).as("keep"),
        graft.llm.Gopher.keepRepetition(r).as("rep_keep"))
      .select(col("doc_id"),
        col("r.word_count").as("word_count"),
        col("r.sum_word_chars").as("sum_word_chars"),
        col("r.alpha_words").as("alpha_words"),
        col("r.stopword_hits").as("stopword_hits"),
        col("r.total_chars").as("total_chars"),
        col("r.top2_chars").as("top2_chars"),
        col("r.top3_chars").as("top3_chars"),
        col("r.top4_chars").as("top4_chars"),
        col("r.dup5_chars").as("dup5_chars"),
        col("r.dup7_chars").as("dup7_chars"),
        col("r.dup10_chars").as("dup10_chars"),
        col("keep"), col("rep_keep"))
      .orderBy("doc_id")
  }

  /** C4 cleaning pass over a deterministically punctuated twin of the
    * fixture text (a period+newline after every 5 words — the fixtures
    * carry no punctuation, so the raw text would degenerate to
    * keep=false everywhere). Line retention, sentence floor, and the
    * token blocklist ("spark" appears in the fixture vocabulary) all
    * discriminate; the oracle replays the punctuation and every rule. */
  def c4Clean(s: SparkSession, dir: String): DataFrame = {
    val punct = regexp_replace(col("text"),
      "(\\w+ \\w+ \\w+ \\w+ \\w+)", "$1.\n")
    val r = graft.llm.C4.report(punct,
      graft.llm.C4.Config(blocklist = Seq("spark")))
    t(s, dir, "documents")
      .select(col("doc_id"), r.as("r"))
      .select(col("doc_id"),
        col("r.clean_text").as("clean_text"),
        col("r.n_lines_kept").as("n_lines_kept"),
        col("r.n_sentences").as("n_sentences"),
        col("r.has_badword").as("has_badword"),
        col("r.keep").as("keep"))
      .orderBy("doc_id")
  }

  /** Distinct counting: exact + approx (approx is rows-only territory,
    * so the oracle-checked columns are the exact ones + error bound). */
  def distinctCounts(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    e.agg(countDistinct(col("user_id")).as("n_exact"),
      (abs(approx_count_distinct(col("user_id"), 0.02).cast("double") -
        countDistinct(col("user_id")).cast("double")) /
        countDistinct(col("user_id")).cast("double") <= 0.1)
        .as("approx_within_10pct"))
  }

  /** Deterministic train/val/test split by md5-bucket of the row key
    * ([[graft.llm.Sampling]]): reproducible across engines and runs —
    * per-stratum counts oracle-checked against DuckDB computing the
    * same hash buckets. */
  def detSplit(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("split", graft.llm.Sampling.split(col("event_id")))
      .groupBy("event_type", "split")
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("n_users"))
      .orderBy("event_type", "split")

  /** Sliding token-window chunking (window 16, stride 8) — the
    * long-document splitter of [[graft.llm.Packing]]. Pure per-row
    * explode, no shuffle. */
  def chunkWindows(s: SparkSession, dir: String): DataFrame =
    Packing.chunkWindows(t(s, dir, "documents"), "doc_id", "text", 16, 8)
      .orderBy("doc_id", "chunk_id")

  /** GPT-style concat-and-split packing at capacity 200: per-sequence
    * doc/token/boundary-crossing stats. The global running sum uses the
    * two-phase distributed prefix scan, not a one-task window. */
  def packConcat(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("doc_id"),
      Text.tokenCount(col("text")).cast("long").as("n_tokens"))
    Packing.packConcat(d, "doc_id", "n_tokens", 200)
      .groupBy("seq_id")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_tokens").cast("bigint").as("seq_tokens"),
        sum(when(col("spans_boundary"), 1).otherwise(0)).cast("bigint")
          .as("n_spanning"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("seq_id")
  }

  /** First-fit greedy packing (no doc splitting) per language at
    * capacity 200 — streamed sorted-group walk, O(1) state per group. */
  def packGreedy(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select(col("lang"), col("doc_id"),
      Text.tokenCount(col("text")).cast("long").as("n_tokens"))
    Packing.packGreedy(d, "lang", "doc_id", "n_tokens", 200)
      .groupBy("lang", "bin")
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        sum("n_tokens").cast("bigint").as("bin_tokens"),
        min("doc_id").as("first_doc"),
        max("doc_id").as("last_doc"))
      .orderBy("lang", "bin")
  }

  /** Corpus TF-IDF: top-25 terms by total term frequency, with document
    * frequency and smoothed idf = ln((N+1)/(df+1)) + 1. Ranking is by
    * integer counts (term asc tiebreak), so it is exactly reproducible;
    * only the reported idf is floating point, rounded to 6 dp. */
  def tfidfTerms(s: SparkSession, dir: String): DataFrame = {
    val docs = t(s, dir, "documents")
    val terms = docs.select(col("doc_id"),
      explode(graft.expr.AlphaTokens(col("text")))
        .as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("term").agg(
      count(lit(1)).cast("bigint").as("df"),
      sum("tf").cast("bigint").as("total_tf"))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    stats.crossJoin(broadcast(n))
      .withColumn("idf",
        round(log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))) + 1.0, 6))
      .select("term", "df", "total_tf", "idf")
      .orderBy(desc("total_tf"), asc("term"))
      .limit(25)
  }

  /** BM25 retrieval ([[graft.llm.Retrieval]]): top-20 documents for a
    * 4-term query — the ranking step of retrieval-based curation /
    * decontamination. One corpus shuffle; terms pruned pre-shuffle. */
  def bm25Search(s: SparkSession, dir: String): DataFrame =
    Retrieval.bm25TopK(t(s, dir, "documents"), "doc_id", "text",
      Seq("join", "hash", "vector", "scan"), k = 20)

  /** Domain-mixture materialization ([[graft.llm.Mixing]]): weighted
    * up/down-sampling of sources into a training mix, deterministic by
    * md5-bucket — both engines pick the identical rows and copy counts. */
  def mixtureMaterialize(s: SparkSession, dir: String): DataFrame =
    Mixing.materializeMixture(
      t(s, dir, "documents").select("doc_id", "source"),
      "doc_id", "source",
      Map("src0" -> 3.0, "src1" -> 2.0, "src2" -> 1.5, "src3" -> 1.0),
      targetRows = 777)
      .select(col("source"), col("doc_id"), col("copy").cast("int").as("copy"))
      .orderBy("source", "doc_id", "copy")

  /** Mergeable HLL sketches ([[graft.expr.Hll]]): per-group sketches
    * whose UNION answers the global distinct question without
    * re-scanning raw data (the incremental-pipeline pattern). Exact
    * per-group distincts are oracle-checked; the sketch estimates are
    * asserted within 5% (3σ at p=12) — deterministic, no RNG. */
  def hllUsers(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    // checkpoint: `per` (one row per event_type) feeds BOTH the
    // per-group branch and the union branch — without it the grouped
    // sketch aggregation over events runs twice
    val per = e.groupBy("event_type").agg(
      expr("hll_sketch(user_id)").as("sk"),
      countDistinct(col("user_id")).cast("bigint").as("n_exact"))
      .materialized("q_hll_users_per_type") // lazy: first branch populates (r10 §6)
    val perOut = per.select(col("event_type"), col("n_exact"),
      (abs(expr("hll_estimate(sk)").cast("double") - col("n_exact")) /
        col("n_exact") <= 0.05).as("within_5pct"))
    val allOut = per.agg(expr("hll_estimate(graft_hll_union(sk))").as("est"))
      .crossJoin(broadcast(
        e.agg(countDistinct(col("user_id")).cast("bigint").as("n_exact"))))
      .select(lit("__all__").as("event_type"), col("n_exact"),
        (abs(col("est").cast("double") - col("n_exact")) /
          col("n_exact") <= 0.05).as("within_5pct"))
    perOut.unionByName(allOut).orderBy("event_type")
  }

  /** Mergeable KLL quantile sketches ([[graft.expr.Kll]]): per-group
    * sketches merged into a global one, estimates checked against
    * exact rank bounds — the quantile analog of q_hll_users. The
    * booleans assert the sketch's ±2% rank contract: the estimated
    * median must fall between the exact 48th and 52nd percentiles
    * (deterministic — MRL compaction has no RNG). */
  def kllQuantiles(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    val per = e.groupBy("event_type").agg(
      expr("kll_sketch(value)").as("sk"),
      round(expr("percentile(value, 0.48)"), 6).as("lo"),
      round(expr("percentile(value, 0.52)"), 6).as("hi"),
      count(lit(1)).cast("bigint").as("n"))
      .materialized("q_kll_per_type") // lazy: first branch populates (r10 §6)
    val perOut = per.select(col("event_type"), col("n"),
      expr("kll_quantile(sk, 0.5d)").between(col("lo"), col("hi"))
        .as("median_within_2pct_rank"))
    val allOut = per.agg(expr("kll_quantile(kll_merge(sk), 0.5d)").as("m"))
      .crossJoin(broadcast(e.agg(
        round(expr("percentile(value, 0.48)"), 6).as("lo"),
        round(expr("percentile(value, 0.52)"), 6).as("hi"),
        count(lit(1)).cast("bigint").as("n"))))
      .select(lit("__all__").as("event_type"), col("n"),
        col("m").between(col("lo"), col("hi"))
          .as("median_within_2pct_rank"))
    perOut.unionByName(allOut).orderBy("event_type")
  }

  /** Mergeable count-min sketches ([[graft.expr.Cms]]): per-bucket
    * partial sketches cell-wise-summed into one, point-queried per
    * event type against exact counts. The boolean asserts the CMS
    * contract — never an undercount, overcount within (e/width)·N —
    * deterministic (fixed per-row hash seeds, no RNG). */
  def cmsEventCounts(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
    // the incremental shape: sketch each slice once, merge the slices
    val merged = e.groupBy(pmod(col("user_id"), lit(8)).as("bucket"))
      .agg(expr("cms_sketch(event_type)").as("sk"))
      .agg(expr("cms_merge(sk)").as("sk"))
    // checkpoint: per-type counts feed both the output rows and the
    // N-total for the error bound — one events scan, not two (the
    // sketch branch is the only other scan of the raw table)
    val per = e.groupBy("event_type")
      .agg(count(lit(1)).cast("bigint").as("n_exact"))
      .materialized("q_cms_per_type") // lazy: first branch populates (r10 §6)
    val tot = per.agg(sum(col("n_exact")).cast("bigint").as("n_total"))
    val est = expr("cms_estimate(sk, event_type)")
    per
      .crossJoin(broadcast(merged))
      .crossJoin(broadcast(tot))
      .select(col("event_type"), col("n_exact"),
        (est >= col("n_exact") && est <= col("n_exact") +
          ceil(lit(math.E / graft.expr.Cms.DefaultWidth) *
            col("n_total")).cast("bigint")).as("cms_ok"))
      .orderBy("event_type")
  }

  /** Duplicate-cluster assignment: near-dup pairs from the banded
    * minhash-LSH pipeline, resolved into connected components by the
    * alternating-stars algorithm ([[Dedup.connectedComponentsStars]] —
    * O(log n) rounds, no neighborhood blow-up), labeled by min member
    * id. Docs in no pair form singleton clusters. The DuckDB oracle
    * replays exact all-pairs Jaccard + a recursive-CTE transitive
    * closure — oracle-checking the iterative distributed algorithm
    * end to end. */
  def dupClusters(s: SparkSession, dir: String): DataFrame = {
    val d = docsWithClones(s, dir)
    val pairs = Dedup.nearDuplicates(d, "doc_id", "text",
      threshold = 0.9, k = 5, numHashes = 64, bands = 16)
      .select("id_a", "id_b")
    val comps = Dedup.connectedComponentsStars(pairs)
      .withColumnRenamed("id", "doc_id")
      .withColumnRenamed("component", "cluster_id")
    // materialize the compact (doc_id, cluster_id) assignment ONCE —
    // two longs per row — instead of re-running the corpus-union join
    // for each of its two consumers (the size agg and the final join);
    // LAZY: both consumers run inside the one final action, whose
    // first-touching branch populates the blocks (no separate
    // materialization job scheduled)
    val assigned = d.select("doc_id")
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .localCheckpoint(false)
    // size via map-side-combinable groupBy + join-back (the
    // keepBestPerCluster shape), NOT count-over-window: a 10⁶-member
    // viral cluster reduces to per-partition counters under the agg,
    // while the window would sort all members in one unsplittable task
    val sizes = assigned.groupBy("cluster_id")
      .agg(count(lit(1)).cast("bigint").as("n_members"))
    assigned.join(sizes, "cluster_id")
      .select("doc_id", "cluster_id", "n_members")
      .orderBy("doc_id")
  }

  /** Quality-aware dedup keeper over the same cloned corpus and
    * LSH+CC clusters as [[dupClusters]]: per cluster keep the LONGEST
    * member (min doc_id tie-break) — the FineWeb-style policy, which
    * diverges from keep-lowest-id exactly on the planted near-dup
    * pairs whose texts differ in length. The oracle replays all-pairs
    * truth + transitive closure + the argmax. */
  def dedupBest(s: SparkSession, dir: String): DataFrame = {
    val d = docsWithClones(s, dir)
    val pairs = Dedup.nearDuplicates(d, "doc_id", "text",
      threshold = 0.9, k = 5, numHashes = 64, bands = 16)
      .select("id_a", "id_b")
    val comps = Dedup.connectedComponentsStars(pairs)
      .withColumnRenamed("id", "doc_id")
      .withColumnRenamed("component", "cluster_id")
    // the keeper decision needs only (id, priority, cluster) — three
    // longs a row — and keepBestPerCluster reads its input twice
    // (min-agg + semi-join probe): project the priority BEFORE the
    // cluster join and materialize the compact frame once, instead of
    // re-running the corpus-union-with-text join for both consumers
    val clustered = d
      .select(col("doc_id"),
        (length(col("text")).cast("long") * -1).as("__prio"))
      .join(comps, Seq("doc_id"), "left")
      .withColumn("cluster_id",
        coalesce(col("cluster_id"), col("doc_id")))
      // lazy: keepBestPerCluster's min-agg branch populates the blocks
      // inside the final action; no separate materialization job
      .localCheckpoint(false)
    Dedup.keepBestPerCluster(clustered, "doc_id", "cluster_id",
      col("__prio"))
      .select("doc_id")
      .orderBy("doc_id")
  }

  /** IVF ANN vs the exact answer: the sample-trained-Lloyd cell
    * inverted-file search ([[Similarity.ivfTopK]]) must recover the
    * true cosine top-1 for every query — the DuckDB oracle computes
    * the exact neighbor independently, so this gates the whole
    * codebook/assign/probe/rank path, not a self-comparison.
    * assignTop=2 (soft assignment): near-uniform vectors put several
    * true NNs right on cell boundaries — the FAISS-style recall knob,
    * 2× index size instead of probing yet more cells. */
  def annIvf(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    Similarity.ivfTopK(e, e.filter(col("vec_id") < 25), k = 1,
      nCentroids = 16, nProbe = 12, assignTop = 2)
      .select(col("query_id"), col("nn_id"))
      .orderBy("query_id")
  }

  /** PQ-compressed ANN ([[graft.llm.Pq]]): 16 nibble codes per vector
    * (32× smaller than the 64 floats), ADC shortlist of 128, exact
    * rerank — must recover the true cosine top-1 for all 25 queries
    * against the same independent exact-NN oracle as q_ann_ivf.
    * Train → encode → search all inside the query (codebooks are
    * KB-scale driver literals, the ivfSearch pattern). */
  /** Per-path row-count memo for the ANN recall knobs: the count
    * only SCALES recall floors, so one counting job per table per
    * process is enough — re-counting inside every invocation paid an
    * extra full Spark job per (timed) run. A process that appends to
    * the table mid-run would see stale knobs; the knobs are floors,
    * and a deployment re-tuning an index re-counts explicitly. */
  private val annCountMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()
  private def annCorpusSize(e: org.apache.spark.sql.DataFrame,
                            dir: String): Long =
    annCountMemo.computeIfAbsent(s"$dir/embeddings",
      _ => java.lang.Long.valueOf(e.count()))

  def annPq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // m=16 (4-dim subspaces): these embeddings are near-uniform on the
    // sphere — PQ's adversarial case (no per-subspace cluster
    // structure, tiny cosine margins between candidates), so recall
    // needs quantization resolution, not shortlist depth (m=8 missed
    // the true top-1 even at a 192-deep shortlist). iters=3: codebook
    // quality only shapes the ADC shortlist (rerank is exact) and each
    // Lloyd round pays a fresh Janino compile of the assignment chain.
    // CORPUS-SCALED shortlist: exact-top-1 recovery through a fixed-
    // resolution quantizer needs the rerank window to grow with the
    // candidate density — 128 was tuned at 2k vectors and missed 3/25
    // at 20k (AnnScaleProbe: n/16 ≥ 1024 recovers 25/25 there); the
    // floor keeps the gate-scale plans and hashes unchanged
    val n = annCorpusSize(e, dir)
    val cb = Pq.train(e, dim = 64, m = 16, k = 16, iters = 3)
    val codes = Pq.encode(e, cb)
    Pq.searchTopK(codes, e, e.filter(col("vec_id") < 25), cb,
      kTop = 1, shortlist = math.max(128, (n / 16).toInt))
      .select(col("query_id"), col("nn_id"))
      .orderBy("query_id")
  }

  /** IVF-PQ composed ANN ([[graft.llm.IvfPq]]): coarse cells + PQ
    * residual codes — probes 14/16 cells (near-uniform vectors
    * put several true NNs in far cells at cosine ~0.3 — the honest
    * hard case, like q_ann_ivf's 12/16), ADC shortlist 192, exact
    * rerank; must recover the exact top-1
    * for all 25 queries against the shared oracle. */
  def annIvfPq(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
    // CORPUS-SCALED recall knobs (AnnScaleProbe at 20k vectors:
    // nProbe 14 plateaus at 22/25 regardless of shortlist — the
    // misses sit in unprobed cells — while nProbe 15 + shortlist
    // ≥ 512 recovers 25/25): probe one more cell per 20k vectors
    // (capped at all 16) and grow the ADC shortlist with candidate
    // density. Floors keep the gate-scale plans and hashes unchanged.
    // At real 100 TB scale an IVF index would also scale nCells ~ √n
    // and trade recall explicitly; this query's contract (EXACT top-1
    // recovery on a near-uniform corpus, the adversarial case) forces
    // near-exhaustive probing instead, which the fixed-16-cell layout
    // makes affordable.
    val n = annCorpusSize(e, dir)
    val (coarse, rcb) = IvfPq.train(e, nCells = 16, m = 16, k = 16,
      iters = 3)
    val codes = IvfPq.encode(e, coarse, rcb)
    IvfPq.searchTopK(codes, e, e.filter(col("vec_id") < 25), coarse,
      rcb, kTop = 1,
      nProbe = math.min(16, 14 + (n / 20000).toInt),
      shortlist = math.max(192, (n / 16).toInt))
      .select(col("query_id"), col("nn_id"))
      .orderBy("query_id")
  }

  /** Word trigrams of the alpha-token stream. HOF (interpreted) — fine
    * here: trigram expansion is a few ops per token, unlike the minhash
    * chains that earned native expressions; the heavy sketch path runs
    * post-explode. */
  private[graft] def wordTrigrams(text: Column): Column =
    // tokens bound once — element_at(ws, i) with an inline tokenizer
    // would re-run the regex per element (Text.bindOnce scaladoc)
    graft.llm.Text.bindOnce(graft.llm.LangModel.tokens(text)) { ws =>
      when(size(ws) >= 3,
        transform(sequence(lit(1), size(ws) - 2),
          i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
            element_at(ws, i + 2))))
        .otherwise(array().cast("array<string>"))
    }

  /** Corpus-level set similarity from mergeable MinHash sketches
    * ([[graft.llm.GroupSimilarity]]): per-language trigram-set Jaccard
    * estimated from one union sketch per language — no pairwise element
    * join. The exact intersection/union counts are oracle-checked
    * against DuckDB; `est_ok` asserts the sketch estimate lands within
    * 0.1 of exact Jaccard (≥3.7σ at 128 hashes; deterministic — fixed
    * permutation seed, no RNG at runtime, bound verified at sf0.01 and
    * sf0.1). */
  def setJaccardLangs(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    // ONE trigram-keyed aggregation builds the whole layout both
    // branches need: per-trigram sorted lang set. That single shuffle
    // replaces the r8 shape (distinct by (lang,sh) + a second
    // sh-keyed self-join with its two exchanges and sorts) — the
    // exact intersection falls out of in-row lang pairs, never an
    // element join. localCheckpoint: one row per distinct trigram
    // (small next to the corpus), reused by sketch + exact branches.
    val bySh = Dedup.spread(d, col("doc_id"))
      .select(col("lang"), explode(wordTrigrams(col("text"))).as("sh"))
      .groupBy("sh")
      .agg(sort_array(collect_set(col("lang"))).as("langs"))
      .materialized("q_set_jaccard_shingles") // lazy: first branch populates (r10 §6)
    // (lang, sh) pairs are distinct by construction of collect_set
    val tri = bySh.select(explode(col("langs")).as("lang"), col("sh"))
    val est = GroupSimilarity.setJaccard(tri, "lang", "sh", numHashes = 128)
    // exact |A∩B|: every in-row unordered lang pair counts one shared
    // trigram; pairs per row are bounded by C(|langs|, 2) — a handful
    // for any real lang column, regardless of corpus size
    val pairs = flatten(transform(col("langs"), (a, i) =>
      transform(
        slice(col("langs"), i + lit(2), size(col("langs")) - i - 1),
        b => struct(a.as("group_a"), b.as("group_b")))))
    val inter = bySh.select(explode(pairs).as("p"))
      .groupBy(col("p.group_a").as("group_a"),
        col("p.group_b").as("group_b"))
      .agg(count(lit(1)).cast("bigint").as("n_inter"))
    inter.join(est, Seq("group_a", "group_b"))
      .select(col("group_a").as("lang_a"), col("group_b").as("lang_b"),
        col("n_a"), col("n_b"), col("n_inter"),
        (abs(col("jaccard_est") - col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
          <= 0.1).as("est_ok"))
      .orderBy("lang_a", "lang_b")
  }

  /** DSIR importance scores ([[graft.llm.Dsir]]): every document
    * scored by the hashed-ngram log ratio between the English subset
    * (the "target" reference) and the whole corpus — the
    * label-free data-selection signal, exact in integer micro-nats
    * so the DuckDB oracle replays it bit-for-bit. */
  def dsirScores(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    // subset-target form: the en-slice bucket counts are a partial sum
    // of the corpus (id, bucket, cnt) table — bit-identical scores,
    // one tokenize+md5 pass over the slice removed
    Dsir.importanceScoresSubset(d, col("lang") === "en",
      "doc_id", "text", nBuckets = 1024)
      .orderBy("doc_id")
  }

  /** DSIR end-to-end ([[graft.llm.Dsir]] +
    * [[graft.llm.Sampling.logWeightedSample]]): importance-score the
    * corpus against the English reference slice, then Gumbel-top-k
    * resample 100 docs with P ∝ exp(score) — the full importance-
    * resampling recipe of Xie et al. 2023, deterministic end to end. */
  def dsirResample(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    val scored = Dsir.importanceScoresSubset(d, col("lang") === "en",
      "doc_id", "text", nBuckets = 1024)
    graft.llm.Sampling.logWeightedSample(scored, col("doc_id"),
      col("score_e6") / lit(1000000.0), n = 100)
      .orderBy("doc_id")
  }

  /** Naive-Bayes quality classifier trained and applied in-corpus
    * ([[graft.llm.Classifier]]): English docs are the "high-quality"
    * reference class, everything else the background — the
    * model-based filtering stage of corpus curation, scored in exact
    * integer micro-nats so both engines agree bit-for-bit. */
  def qualityClassifier(s: SparkSession, dir: String): DataFrame =
    Classifier.nbTrainScore(
      t(s, dir, "documents").withColumn("is_en", col("lang") === "en"),
      "doc_id", "text", "is_en")
      .orderBy("doc_id")

  /** Unigram LM surprisal per document ([[graft.llm.LangModel]]) — the
    * perplexity-filter quality signal, integer-scaled so both engines
    * aggregate exactly. */
  def unigramNll(s: SparkSession, dir: String): DataFrame =
    LangModel.unigramNll(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  /** Bigram Stupid Backoff LM ([[graft.llm.LangModel
    * .stupidBackoffNll]]): train on a ~1/49 slice, score the 1/7
    * held-out slice — the small model makes the seen-bigram and
    * backoff branches split the scored positions ~50/50 (2243/1972 at
    * sf0.01; a 6/7 model over the tiny fixture vocabulary saw all but
    * ONE bigram). The OOV-unigram floor cannot fire here (every vocab
    * word appears even in 10 docs) — LangModelSpec pins it. */
  def bigramBackoff(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    LangModel.stupidBackoffNll(
      d.filter(pmod(col("doc_id"), lit(49)) === 1),
      d.filter(pmod(col("doc_id"), lit(7)) === 0),
      "doc_id", "text")
      .orderBy("doc_id")
  }

  /** CCNet perplexity tiers ([[graft.llm.Curate.perplexityBuckets]]):
    * every scored document labeled head/middle/tail within its
    * language by exact integer tertile rank of per-token surprisal. */
  def ccnetBuckets(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents")
    graft.llm.Curate.perplexityBuckets(
      LangModel.unigramNll(d, "doc_id", "text")
        .join(d.select(col("doc_id"), col("lang")), "doc_id"))
      .orderBy("doc_id")
  }

  /** Deterministic per-source cap ([[graft.llm.Sampling.capPerGroup]]):
    * at most 15 docs per source by md5-rank of doc_id — the per-domain
    * cap of corpus curation, reproducible on any engine. */
  def capPerSource(s: SparkSession, dir: String): DataFrame =
    graft.llm.Sampling.capPerGroup(
      t(s, dir, "documents").select("source", "doc_id"),
      "source", "doc_id", n = 15)
      .orderBy("source", "doc_id")

  /** Winnowed (MOSS) fingerprints per document
    * ([[graft.llm.Winnow.fingerprints]], k=3 word-grams, window 4). */
  def winnowFingerprints(s: SparkSession, dir: String): DataFrame =
    Winnow.fingerprints(t(s, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id", "fp_pos", "fp_hash")

  /** Document pairs sharing >= 3 rare winnowed fingerprints
    * ([[graft.llm.Winnow.sharedFingerprintPairs]], doc-freq cap 20) —
    * local-overlap detection between exact-hash and set-minhash. */
  def winnowPairs(s: SparkSession, dir: String): DataFrame =
    Winnow.sharedFingerprintPairs(t(s, dir, "documents"), "doc_id", "text",
      minShared = 3, maxDocFreq = 20)
      .orderBy("id_a", "id_b")

  /** Incremental batch-vs-catalog near-dup detection
    * ([[graft.llm.Dedup.nearDuplicatesAgainstCatalog]]): a simulated
    * incoming batch — clones of every 7th==0 doc (must be flagged
    * against their source) plus word-reversed every 7th==3 docs (same
    * vocabulary, disjoint 5-shingles — must match nothing) — dedups
    * against the corpus via its [[graft.llm.Dedup.signatureCatalog]];
    * the corpus is only touched for candidate verification. */
  def dedupIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val batch = d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select((col("doc_id") + 300000L).as("doc_id"),
          array_join(reverse(graft.llm.Text.words(
            graft.llm.Text.normalize(col("text")))), " ").as("text")))
    val catSigs = Dedup.signatureCatalog(d, "doc_id", "text",
      k = 5, numHashes = 64)
    Dedup.nearDuplicatesAgainstCatalog(batch, "doc_id", "text",
      catSigs, d, threshold = 0.9, k = 5, numHashes = 64, bands = 16)
      .orderBy("id_new", "id_cat")
  }

  /** Incremental winnow match ([[graft.llm.Winnow.matchAgainstCatalog]]):
    * the q_dedup_incremental batch (clones + word-reversed docs)
    * matched against the corpus's build-time-capped
    * [[graft.llm.Winnow.fingerprintCatalog]] — winnow grams are
    * order-sensitive, so reversed docs share nothing while clones
    * share every fingerprint. */
  def winnowIncremental(s: SparkSession, dir: String): DataFrame = {
    val d = t(s, dir, "documents").select("doc_id", "text")
    val batch = d.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select((col("doc_id") + 200000L).as("doc_id"), col("text"))
      .unionByName(d.filter(pmod(col("doc_id"), lit(7)) === 3)
        .select((col("doc_id") + 300000L).as("doc_id"),
          array_join(reverse(graft.llm.Text.words(
            graft.llm.Text.normalize(col("text")))), " ").as("text")))
    val catalog = Winnow.fingerprintCatalog(d, "doc_id", "text",
      maxDocFreq = 20)
    Winnow.matchAgainstCatalog(batch, "doc_id", "text", catalog,
      minShared = 3)
      .orderBy("id_new", "id_cat")
  }

  /** Edit-distance verification of LSH near-dup candidates on the
    * cloned corpus ([[graft.llm.Dedup.editDistanceVerify]]): the
    * order-sensitive precision pass after the set-level recall pass. */
  def editDistanceNearDups(s: SparkSession, dir: String): DataFrame = {
    val d = docsWithClones(s, dir)
    val pairs = Dedup.nearDuplicates(d, "doc_id", "text",
      threshold = 0.9, k = 5, numHashes = 64, bands = 16)
      .select("id_a", "id_b")
    Dedup.editDistanceVerify(pairs, d, "doc_id", "text")
      .select("id_a", "id_b", "lev", "lev_sim")
      .orderBy("id_a", "id_b")
  }

  /** Line-level cross-document dedup ([[graft.llm.LineDedup]], the C4
    * recipe): every doc gets two planted boilerplate sentences; lines
    * occurring in 2+ distinct docs (the plants, plus content lines of
    * exact-dup docs) are removed everywhere and documents reassembled
    * in order. The oracle groups by the normalized line STRING — same
    * identity the 64-bit hash keys, minus the 2⁻⁶⁴ collision. */
  def lineDedup(s: SparkSession, dir: String): DataFrame = {
    val planted = t(s, dir, "documents").select(col("doc_id"),
      concat(lit("all rights reserved worldwide. "), col("text"),
        lit(". cookie policy applies here")).as("text"))
    graft.llm.LineDedup.dropSharedLines(planted, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Deterministic token masking ([[graft.llm.Masking]]): 15% of
    * tokens masked by md5-fraction of (doc, pos) — the reproducible
    * span-corruption stage; the oracle replays the identical hash
    * arithmetic and reassembly. */
  def maskTokens(s: SparkSession, dir: String): DataFrame =
    graft.llm.Masking.maskTokens(t(s, dir, "documents"),
        "doc_id", "text", rate = 0.15)
      .orderBy("doc_id")

  /** URL extraction + domain stats ([[graft.llm.Text.urls]]): docs get
    * deterministic synthetic links appended; extraction, host parse,
    * and per-domain doc/occurrence counts — the domain
    * blocklist/reweighting primitive of crawl curation. */
  def urlDomains(s: SparkSession, dir: String): DataFrame = {
    val withLinks = t(s, dir, "documents").select(col("doc_id"),
      concat(col("text"),
        lit(" see https://site"), pmod(col("doc_id"), lit(20)),
        lit(".example.com/p/"), col("doc_id"),
        lit(" and http://cdn"), pmod(col("doc_id"), lit(7)),
        lit(".example.org/x")).as("text"))
    withLinks
      .select(col("doc_id"),
        explode(graft.llm.Text.urls(col("text"))).as("url"))
      .select(col("doc_id"), graft.llm.Text.urlDomain(col("url")).as("domain"))
      .groupBy("domain")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_urls"))
      .orderBy("domain")
  }

  /** 7-day rolling distinct users from MERGEABLE daily HLL sketches
    * ([[graft.expr]] hll family): daily sketches are built ONCE from
    * the events, then each rolling window is answered by register-max
    * union of ≤7 sketch rows — never rescanning raw events per window
    * (the sliding-window twin of q_hll_users; q_rolling_dau is the
    * exact baseline). Output gates the exact count plus a deterministic
    * 5%-bound flag on the sketch estimate. */
  def rollingWauHll(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
    // one sketch + exact-distinct row per day, built once
    val daily = e.groupBy("day")
      .agg(expr("hll_sketch(user_id)").as("sk"))
      .materialized("q_rolling_wau_daily") // lazy: first branch populates (r10 §6)
    val served = daily
      .select(explode(sequence(lit(0), lit(6))).as("off"), col("day"), col("sk"))
      .select(date_add(col("day"), col("off")).as("day"), col("sk"))
    val est = served
      .join(daily.select("day"), Seq("day"), "left_semi")
      .groupBy("day")
      .agg(expr("hll_estimate(graft_hll_union(sk))").cast("double").as("est"))
    // exact baseline = the q_rolling_dau pipeline, reused not re-derived
    val exact = Queries.rollingDau(s, dir)
    exact.join(est, "day")
      .select(col("day"), col("wau"),
        (abs(col("est") - col("wau").cast("double")) /
          col("wau").cast("double") <= 0.05).as("within_5pct"))
      .orderBy("day")
  }

  /** Join-cardinality estimation from CMS sketches
    * ([[graft.expr.CmsJoinSizeExpr]]): sketch the join keys of two
    * event slices in ONE scan (conditional sketch aggregates), then
    * estimate |A ⋈ B| = Σ_k f_A(k)·f_B(k) by counter-row inner
    * product — the planner primitive that sizes a prospective join
    * from persisted per-slice sketches without touching either table.
    * Gated: the estimate can never undercount (one-sided), and must
    * sit within 3× the expected collision mass of the exact value
    * (deterministic for the fixed seeds — holds at sf0.01 and sf0.1). */
  def cmsJoinSize(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "events")
      .select(col("user_id"), pmod(col("event_id"), lit(2)).as("par"))
    val sk = e.agg(
      expr("cms_sketch(CASE WHEN par = 0 THEN user_id END)").as("ska"),
      expr("cms_sketch(CASE WHEN par = 1 THEN user_id END)").as("skb"),
      sum(when(col("par") === 0, 1L).otherwise(0L)).as("na"),
      sum(when(col("par") === 1, 1L).otherwise(0L)).as("nb"))
    val exact = e.groupBy("user_id").agg(
        sum(when(col("par") === 0, 1L).otherwise(0L)).as("fa"),
        sum(when(col("par") === 1, 1L).otherwise(0L)).as("fb"))
      .agg(sum(col("fa") * col("fb")).as("exact_join_size"))
    sk.crossJoin(exact)
      .withColumn("_est", expr("cms_join_size(ska, skb)"))
      .select(col("exact_join_size"),
        (col("_est") >= col("exact_join_size")).as("est_at_least_exact"),
        (col("_est") <= col("exact_join_size") + lit(3L) * col("na") *
          col("nb") / lit(graft.expr.Cms.DefaultWidth.toLong))
          .as("est_within_bound"))
  }

  /** Per-label embedding centroids via the [[graft.expr.VecSumAgg]]
    * `vec_sum_micros` aggregate: element-wise sums in exact integer
    * micro-units (order-free longs — a double sum would be
    * partitioning-dependent), map-side combined like any sketch, ONE
    * long[dim] row per group per partition through the shuffle —
    * never the 64× posexplode shuffle amplification. */
  def labelCentroids(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .groupBy("label")
      // count the VECTORS summed, not all rows: vec_sum_micros skips
      // null embeddings, so a null row must not deflate the centroid
      .agg(count(col("embedding")).as("n"),
        expr("vec_sum_micros(embedding)").as("sm"))
      .select(col("label"), col("n"),
        posexplode(col("sm")).as(Seq("dim", "sum_micros")))
      .select(col("label"), col("dim"), col("n"), col("sum_micros"),
        round((col("sum_micros").cast("double") / col("n").cast("double")) /
          1000000.0, 6).as("centroid"))
      .orderBy("label", "dim")

  /** PMI phrase mining ([[graft.llm.Phrases]]): top adjacent bigrams
    * by count with their pointwise-mutual-information scores — exact
    * integer counts, PMI double computed from them identically in both
    * engines. */
  def pmiBigrams(s: SparkSession, dir: String): DataFrame =
    graft.llm.Phrases.pmiBigrams(
        t(s, dir, "documents"), "doc_id", "text", minCount = 5L)
      .orderBy(desc("n_ab"), col("a"), col("b"))
      .limit(100)

  /** Inverted-index build ([[graft.llm.Retrieval.invertedIndex]]):
    * the 50 highest-df terms with exact df/total_tf and their capped
    * deterministic posting lists (tf desc, doc asc) as strings. */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    Retrieval.invertedIndex(t(s, dir, "documents"), "doc_id", "text",
        maxPostings = 5)
      .orderBy(desc("df"), col("term"))
      .limit(50)

  /** HTML boilerplate removal ([[graft.llm.Html]]): documents wrapped
    * in deterministic page chrome (title/style/comment, a nav anchor,
    * every 3rd doc a script block) must come back out as clean text —
    * tag/script/comment strip, entity decode, whitespace collapse —
    * plus the link-density drop signal. Pure codegen'd per-row regex
    * chains; the oracle replays the identical RE2-safe patterns. */
  def htmlExtract(s: SparkSession, dir: String): DataFrame = {
    import graft.llm.Html
    val html = concat(
      lit("<html><head><title>Doc</title><style>p{color:red}</style></head>"),
      lit("<body><!-- hdr --><p>"), substring(col("text"), 1, 200),
      lit(" &amp; more</p>"),
      when(pmod(col("doc_id"), lit(3)) === 0,
        lit("<script>var x = 1 < 2;</script>")).otherwise(lit("")),
      lit("<a href=\"/nav\">next page</a></body></html>"))
    t(s, dir, "documents")
      .select(col("doc_id"), html.as("_h"))
      .select(col("doc_id"),
        Html.extractText(col("_h")).as("clean"),
        length(Html.extractText(col("_h"))).as("clean_len"),
        round(Html.linkDensity(col("_h")), 6).as("link_density"))
      .orderBy("doc_id")
  }
}
