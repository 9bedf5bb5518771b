package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materializer.MaterializeOps

/** Unigram language-model surprisal scoring — the CCNet-style
  * "perplexity filter" quality signal: documents whose tokens are
  * improbable under a corpus-wide unigram model score high (noise,
  * boilerplate, wrong-language text), fluent text scores low. A real
  * deployment swaps the in-corpus unigram table for a reference-corpus
  * n-gram table; the pipeline shape (train token stats → broadcast/join
  * → per-doc fold) is identical.
  *
  * Reproducibility: per-token negative log-likelihood is quantized to
  * integer micro-nats (`round(−ln(p)·1e6)`) BEFORE the per-document
  * sum, so aggregation is exact integer arithmetic — the same result
  * on any engine, partitioning, or summation order. A double sum would
  * be order-dependent in the last ulp and hash-unstable across
  * engines.
  *
  * Scale shape: tokenize → per-(doc, term) counts (one map-side-
  * combinable shuffle), corpus term table derived FROM that tf table
  * (vocab-sized, no second corpus scan — the tf table is checkpointed
  * so one tokenize pass feeds both branches), stats joined back on
  * term (AQE broadcasts when the vocab is small), one final per-doc
  * aggregation. No driver-side state, no UDFs.
  */
object LangModel {

  /** Lowercase alpha tokens — mirrors the tfidf/bm25 tokenizer (and
    * the ANSI-SQL `regexp_extract_all` twin). */
  def tokens(text: Column): Column =
    // native byte-walk twin of regexp_extract_all(lower(text),
    // '[a-z]+') — value-identical (NativeExprSpec), no regex matcher
    // or per-match copy on the hottest tokenize path
    graft.expr.AlphaTokens(text)

  /** Per-document unigram NLL: `n_terms` (token count) and
    * `sum_nll_e6` (total surprisal in micro-nats, exact BIGINT).
    * Average surprisal = sum_nll_e6 / n_terms / 1e6 nats/token;
    * perplexity = exp of that. Documents with zero alpha tokens
    * produce no row (nothing to score). MLE probabilities over the
    * scored corpus itself — every scored token is in-vocabulary by
    * construction, so no smoothing term. */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = Dedup.spread(docs, col(idCol))
      .select(col(idCol).as("doc_id"),
        explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
      // one tokenize pass feeds BOTH the corpus-stats branch and the
      // scoring join (the bm25 tf-table lesson); at real scale this
      // materialization is a persisted stage, not a recompute. LAZY:
      // the first consumer's stage populates the blocks — eager ran
      // the whole chain as a job at plan-BUILD time on every call
      // (the crossDocSpans lesson, NOTES_r10 §6)
      .materialized("langmodel_unigram_tf")
    // vocab-sized, materialized once: stats feeds the scoring join
    // AND the n_total aggregation — without this the tf-by-term
    // aggregation replays per consumer
    val stats = tf.groupBy("term").agg(sum(col("tf")).as("ctf"))
      .materialized("langmodel_unigram_stats")
    val total = stats.agg(sum(col("ctf")).cast("double").as("n_total"))
    tf.join(stats, "term")
      .crossJoin(broadcast(total))
      .select(col("doc_id"), col("tf"),
        (col("tf") * round(-log(col("ctf").cast("double") / col("n_total"))
          * lit(1000000.0)).cast("bigint")).as("nll_e6"))
      .groupBy("doc_id")
      .agg(sum(col("tf")).cast("bigint").as("n_terms"),
        sum(col("nll_e6")).cast("bigint").as("sum_nll_e6"))
  }

  /** Bigram language model with Stupid Backoff (Brants et al. 2007,
    * "Large Language Models in Machine Translation" — the smoothing
    * designed FOR distributed counting: no normalization pass, no
    * discount fitting, just counts and a fixed backoff factor).
    * Trains on `model`, scores `score` — unlike [[unigramNll]]'s
    * self-scoring, a held-out corpus exercises real backoff and OOV
    * paths. Per token position i:
    *
    *  - first token: p = c1(w)/N (OOV floor 1/N);
    *  - seen bigram: p = c2(w_{i-1}, w_i) / c1(w_{i-1});
    *  - unseen bigram: p = alpha * c1(w_i)/N (same OOV floor).
    *
    * Per-token NLL is quantized to integer micro-nats BEFORE the
    * per-doc sum ([[unigramNll]]'s exactness trick), so results are
    * bit-stable across engines and partitionings; the DuckDB oracle
    * replays the identical expression trees.
    *
    * Scale shape: ONE tokenize pass over the model corpus feeds both
    * count tables (checkpointed token arrays); c1/c2 are map-side-
    * combinable aggregations; scoring is three term-keyed equi-joins
    * (AQE broadcasts the vocab sides when small — at web scale the
    * bigram join is the one real shuffle, exactly the shape the paper
    * distributes) + one single-row total broadcast. Returns one row
    * per scored doc: (doc_id, n_terms, sum_nll_e6). */
  def stupidBackoffNll(model: DataFrame, score: DataFrame,
                       idCol: String, textCol: String,
                       alpha: Double = 0.4): DataFrame = {
    // no size(ws) >= 1 filter here: it would be alias-substituted below
    // the projection and run the tokenizer TWICE per model doc (guide
    // §4.4 duplication), and it is redundant — c1's explode emits no
    // rows for an empty array and c2 filters size >= 2 on the
    // checkpointed arrays anyway
    val mWs = Dedup.spread(model, col(idCol))
      .select(tokens(col(textCol)).as("ws"))
      // one tokenize pass feeds BOTH count tables (the bm25 lesson);
      // lazy — c1's aggregation stage populates the blocks, c2 reads
      // them (NOTES_r10 §6: eager paid the chain at plan-build)
      .materialized("langmodel_bigram_tokens")
    // vocab-sized, materialized once: c1 feeds BOTH scoring joins
    // (previous-word and current-word lookups) and the n_total
    // aggregation — 3 consumers, each replaying the model-corpus
    // explode+count without it
    val c1 = mWs.select(explode(col("ws")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c1"))
      .materialized("langmodel_bigram_c1")
    val c2 = mWs.filter(size(col("ws")) >= 2)
      .select(explode(transform(sequence(lit(1), size(col("ws")) - 1),
        i => struct(element_at(col("ws"), i).as("w1"),
          element_at(col("ws"), i + 1).as("w2")))).as("b"))
      .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val total = c1.agg(sum(col("c1")).cast("double").as("n_total"))

    // token positions via transform-with-index over ws itself: an empty
    // array explodes to zero rows, so the old size(ws) >= 1 guard (which
    // existed because sequence(1, 0) steps DOWN to [1, 0]) is not needed
    // — that filter was alias-substituted below the projection and ran
    // the tokenizer twice per scored doc. Same (prev, cur) values:
    // 0-based lambda index i maps to the old 1-based position i + 1.
    val rows = Dedup.spread(score, col(idCol))
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ws"))
      .select(col("doc_id"),
        explode(transform(col("ws"),
          (x, i) => struct(
            when(i === 0, lit(null).cast("string"))
              .otherwise(element_at(col("ws"), i)).as("prev"),
            x.as("cur")))).as("t"))
      .select(col("doc_id"), col("t.prev").as("prev"),
        col("t.cur").as("cur"))
      .groupBy("doc_id", "prev", "cur").agg(count(lit(1)).as("k"))

    val joined = rows
      .join(c2, rows("prev") === c2("w1") && rows("cur") === c2("w2"),
        "left")
      .drop("w1", "w2")
      .join(c1.select(col("w").as("__pw"), col("c1").as("c1_prev")),
        col("prev") === col("__pw"), "left").drop("__pw")
      .join(c1.select(col("w").as("__cw"), col("c1").as("c1_cur")),
        col("cur") === col("__cw"), "left").drop("__cw")
      .crossJoin(broadcast(total))
    val pUni = coalesce(col("c1_cur").cast("double"), lit(1.0)) /
      col("n_total")
    val nllTok =
      when(col("prev").isNull,
        round(-log(pUni) * lit(1000000.0)).cast("bigint"))
        .when(col("c2").isNotNull,
          round(-log(col("c2").cast("double") /
            col("c1_prev").cast("double")) * lit(1000000.0))
            .cast("bigint"))
        .otherwise(
          round(-log(lit(alpha) * pUni) * lit(1000000.0)).cast("bigint"))
    joined.select(col("doc_id"), col("k"), nllTok.as("nll_e6"))
      .groupBy("doc_id")
      .agg(sum(col("k")).cast("bigint").as("n_terms"),
        sum(col("k") * col("nll_e6")).cast("bigint").as("sum_nll_e6"))
  }
}
