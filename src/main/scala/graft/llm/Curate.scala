package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Materializer.MaterializeOps

/** End-to-end corpus curation — the composed recipe a training run
  * actually executes, built entirely from this engine's verified
  * stages: token-count quality gate → exact dedup (keep min id per
  * identical text) → Naive-Bayes quality classifier (train on the
  * surviving corpus, keep positive scores) → per-source token budget
  * (highest-scoring docs first, deterministic tie-break) →
  * hash-bucket train/val/test split. Everything is deterministic
  * integer/hash arithmetic — the same corpus comes out on every
  * engine, run, and cluster size, which is the property that makes a
  * training mix reproducible.
  *
  * Scale shape: exact dedup is a map-side-combinable min(id) per
  * 16-byte text hash + semi join (skew-immune — a mega-duplicated doc
  * partial-aggregates instead of serializing into one window task),
  * then the classifier's tf shuffle + vocab join, and one window
  * shuffle on source for the budget. The budget window is guarded by
  * a per-partition pre-filter ([[budgetFilter]]): real LLM mixes are
  * NOT per-domain — `source ∈ {common-crawl, c4, github, …}` and the
  * dominant source is half the corpus, so an unguarded
  * `Window.partitionBy(source)` would serialize half of 100 TB into
  * ONE sort task AQE cannot split. The pre-pass caps what reaches the
  * window at ~budget/min_tokens rows per source per input partition,
  * provably without changing the output. The dedup survivors
  * are checkpointed once and feed classifier training, scoring, and
  * the final attribute join — the corpus text is never recomputed. */
object Curate {

  /** Returns the curated corpus: `(doc_id, source, n_tokens,
    * score_e6, split)` — one row per kept document.
    * `labelCol` is the boolean "high-quality reference" marker the
    * classifier trains on; `budgetPerSource` caps the running token
    * total per source, admitting docs in (score desc, id) order. */
  def pipeline(docs: DataFrame, idCol: String, textCol: String,
               sourceCol: String, labelCol: String,
               minTokens: Int = 5, maxTokens: Int = 1000000,
               budgetPerSource: Long = 300): DataFrame = {
    // tokenize ONCE at the gate: project the count, filter on the
    // column (filter-then-project would evaluate the split per row in
    // BOTH operators), and carry the 8-byte count through the dedup
    // semi-join into the survivor checkpoint — the attrs branch below
    // used to re-run the whole split kernel over every survivor's text
    val nTok = Text.tokenCount(col(textCol)).cast("bigint")
    val q = docs.withColumn("__n_tokens", nTok)
      .filter(col("__n_tokens").between(minTokens, maxTokens))
    // exact dedup via min(id)-per-hash + semi join, NOT a row_number
    // window: a mega-duplicated doc is an unsplittable window
    // partition, while the aggregate partial-combines per partition
    val survivors = Dedup.dropExactDuplicates(q, idCol, textCol)
      .select(col(idCol), col(textCol), col(sourceCol), col(labelCol),
        col("__n_tokens"))
      .materialized("curate_dedup_survivors") // lazy: first consumer populates (r10 §6)
    val scored = Classifier
      .nbTrainScore(survivors, idCol, textCol, labelCol)
      .filter(col("score_e6") > 0)
    val attrs = survivors.select(col(idCol).as("doc_id"),
      col(sourceCol).as("source"),
      col("__n_tokens").as("n_tokens"))
    budgetFilter(scored.join(attrs, "doc_id"), budgetPerSource)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("score_e6"), Sampling.split(col("doc_id")).as("split"))
  }

  /** Per-source cumulative token budget: admit docs in
    * (score desc, doc_id) order while the running token total stays
    * within `budget`. Input needs `(doc_id, source, n_tokens,
    * score_e6)`; output is the admitted rows (all input columns).
    *
    * Scale shape — TWO stages, the [[Retrieval]] `topPerTermPrePass` /
    * [[Sampling.capPerGroup]] skew defense. Stage 1 is a per-partition
    * pre-filter: a LOCAL sort within partitions on (source,
    * score desc, doc_id) — Spark's spillable external sorter, no
    * exchange — then a streaming filter keeping each row whose LOCAL
    * prefix token sum (over all locally-preceding same-source rows,
    * kept or not, EXCLUDING the current row) is ≤ budget. Stage 2 is
    * the exact global window over the reduced set.
    *
    * Output-identical, provably: any global survivor has global
    * cumulative ≤ budget, so its global prefix-excluding-self =
    * cum − n_tokens ≤ budget; its local prefix is a sub-sum of that
    * (the partition's preceding rows are a subset of all preceding
    * rows under the same total order), so the pre-pass keeps a
    * SUPERSET of global survivors and the window finishes exactly.
    * Kept rows per (partition, source) are bounded by
    * budget/min(n_tokens) + 1 for positive token counts (zero-token
    * rows never advance the prefix — but then they also all survive
    * the global window, so the pre-pass output stays proportional to
    * the true result). `prePass = false` is the single-stage
    * specification twin for the CurateSpec equivalence proof — it
    * serializes a mega-source into one window task and exists only to
    * pin the pre-pass bit-identical. */
  private[graft] def budgetFilter(joined: DataFrame, budget: Long,
                                  prePass: Boolean = true): DataFrame = {
    val bySource = Window.partitionBy(col("source"))
      .orderBy(col("score_e6").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val in = if (prePass) budgetPrePass(joined, budget) else joined
    in.withColumn("cum", sum(col("n_tokens")).over(bySource))
      .filter(col("cum") <= budget)
  }

  /** Stage-1 pre-filter of [[budgetFilter]] (see proof there). Local
    * sort + one-pass streaming state: the current source value and a
    * running token sum — no per-group map, nothing pinned in memory.
    * Null-safe: the sort groups null sources deterministically and
    * the filter only tests source equality. */
  private def budgetPrePass(df: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    val sch = df.schema
    val si = sch.fieldIndex("source")
    val ni = sch.fieldIndex("n_tokens")
    df.sortWithinPartitions(col("source"), col("score_e6").desc,
        col("doc_id"))
      .mapPartitions { rows =>
        var cur: Any = null
        var started = false
        var acc = 0L
        rows.filter { r =>
          val s = r.get(si)
          if (!started || s != cur) { started = true; cur = s; acc = 0L }
          val keep = acc <= budget
          // null n_tokens contributes nothing, matching sum() over the
          // window (which skips nulls)
          if (!r.isNullAt(ni)) acc += r.getLong(ni)
          keep
        }
      }(RowEncoder.encoderFor(sch))
  }

  /** CCNet-style per-language perplexity tiers (Wenzek et al. 2020):
    * rank every scored document WITHIN its language by per-token
    * surprisal (lowest = most fluent first) and label the best third
    * `head`, the next `middle`, the rest `tail` — the quality tiers a
    * pretraining mix samples from at different rates. Input is a
    * language-model scoring frame `(idCol, langCol, n_terms,
    * sum_nll_e6)` (e.g. [[LangModel.unigramNll]] joined with the
    * document language); token-less documents never reach it.
    *
    * Determinism: tier boundaries are INTEGER rank arithmetic
    * (`r·3 ≤ n` → head, `r·3 ≤ 2n` → middle, else tail — exact
    * tertiles, no float thresholds); the sort key is one scalar IEEE
    * division of two integers (identical on any engine) with an id
    * tie-break, so the labeling replays bit-for-bit anywhere.
    *
    * Scale shape — the 2-pass distributed order statistic, NOT a
    * per-language window. Languages are few and web corpora are
    * hugely skewed toward one of them, so ranking inside a
    * `Window.partitionBy(lang)` would serialize the dominant language
    * onto one reducer. Instead: (1) histogram the corpus by
    * `(lang, floor(key / binWidth))` — a map-side-combinable
    * aggregation to a few-thousand-row table; tiny windows over THAT
    * find each bin's rank interval `(lo, hi]` and label every bin
    * whose interval falls wholly inside one tier; (2) the corpus
    * joins the broadcast histogram and only rows in the ≤2 boundary-
    * straddling bins per language need their exact global rank —
    * `lo + row_number` within the bin. The ranking shuffle is keyed
    * by `(lang, bin)`, so parallelism scales with occupied bins, not
    * languages, and each in-partition sort sees one bin, not one
    * language. Output is bit-identical to the single-window form
    * ([[perplexityBucketsWindowed]] — the spec-equivalence twin), at
    * any bin width: a degenerate corpus concentrating every key into
    * one bin just makes that bin the straddler and degrades to the
    * windowed cost, never to a wrong answer. */
  def perplexityBuckets(scored: DataFrame, idCol: String = "doc_id",
                        langCol: String = "lang"): DataFrame = {
    // micro-nats per token; 1e4-wide bins → ~thousands of occupied
    // bins across a realistic 0..40e6 surprisal range
    val key = col("sum_nll_e6").cast("double") / col("n_terms")
    // compact (id, lang, counts, key, bin) rows, materialized once:
    // `in` feeds the histogram build AND the final labeling join —
    // without this the caller's whole scoring pipeline (e.g. the
    // unigram-NLL aggregation chain) replays per consumer
    val in = scored.select(col(idCol), col(langCol), col("n_terms"),
      col("sum_nll_e6"), key.as("__k"),
      floor(key / lit(1e4)).cast("long").as("__qb"))
      .materialized("ccnet_scored_bins")
    val overBins = Window.partitionBy(col(langCol)).orderBy(col("__qb"))
    val hist = in.groupBy(col(langCol), col("__qb"))
      .agg(count(lit(1)).as("__cnt"))
      .withColumn("__hi", sum(col("__cnt")).over(overBins))
      .withColumn("__lo", col("__hi") - col("__cnt"))
      .withColumn("__n",
        sum(col("__cnt")).over(Window.partitionBy(col(langCol))))
      // whole-bin label when ranks (lo, hi] sit inside one tier;
      // null marks a boundary-straddling bin
      .withColumn("__lbl",
        when(col("__hi") * 3 <= col("__n"), "head")
          .when((col("__lo") + 1) * 3 > col("__n") * 2, "tail")
          .when((col("__lo") + 1) * 3 > col("__n") &&
            col("__hi") * 3 <= col("__n") * 2, "middle"))
      .select(col(langCol), col("__qb"), col("__lo"), col("__n"),
        col("__lbl"))
    val inBin = Window.partitionBy(col(langCol), col("__qb"))
      .orderBy(col("__k"), col(idCol))
    val r = col("__lo") + row_number().over(inBin)
    in.join(broadcast(hist), Seq(langCol, "__qb"))
      .select(col(idCol), col(langCol), col("n_terms"),
        col("sum_nll_e6"),
        coalesce(col("__lbl"),
          when(r * 3 <= col("__n"), "head")
            .when(r * 3 <= col("__n") * 2, "middle")
            .otherwise("tail")).as("ppl_bucket"))
  }

  /** Single-window form of [[perplexityBuckets]] — the readable
    * specification the scalable path must match bit-for-bit
    * (CurateSpec equivalence; serializes per language, so the public
    * entry point is the histogram path). */
  private[graft] def perplexityBucketsWindowed(
      scored: DataFrame, idCol: String = "doc_id",
      langCol: String = "lang"): DataFrame = {
    val byLang = Window.partitionBy(col(langCol))
    val ranked = byLang.orderBy(
      (col("sum_nll_e6").cast("double") / col("n_terms")).asc, col(idCol))
    scored
      .withColumn("__r", row_number().over(ranked))
      .withColumn("__n", count(lit(1)).over(byLang))
      .select(col(idCol), col(langCol), col("n_terms"), col("sum_nll_e6"),
        when(col("__r") * 3 <= col("__n"), "head")
          .when(col("__r") * 3 <= col("__n") * 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
  }
}
