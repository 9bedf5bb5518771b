package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Materializer.MaterializeOps

/** BM25 full-text retrieval over a document corpus — the ranking
  * primitive behind retrieval-based curation and decontamination of
  * training data (e.g. "find the corpus documents most similar to a
  * benchmark prompt" before filtering them out).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - doc length is computed ROW-WISE (`size(tokens)`) before anything
  *    is exploded — no extra pass over the corpus for lengths;
  *  - the exploded token stream is filtered to the broadcast query-term
  *    set BEFORE the first shuffle, so the (doc, term) aggregation only
  *    ever sees rows for the handful of query terms, not the whole
  *    posting list of the corpus;
  *  - document frequencies aggregate to ≤ |queryTerms| rows and are
  *    broadcast back — the corpus is shuffled once (by (doc, term)),
  *    everything else is map-side;
  *  - the final top-k is a `TakeOrderedAndProject`, never a full sort.
  *
  * Scoring is the standard Robertson/Sparck-Jones BM25 with the Lucene
  * `+1` idf smoothing (idf = ln(1 + (N - df + 0.5)/(df + 0.5))), which
  * keeps idf positive for terms appearing in more than half the corpus.
  */
object Retrieval {

  /** Lowercased alphanumeric token stream (same tokenizer as the
    * TF-IDF query family, widened to digits). */
  def tokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z0-9]+"), lit(0))

  /** Top-k documents by BM25 score against a bag of query terms.
    * Output: (id, bm25 rounded 6dp, n_hit = matched distinct terms),
    * ordered by score desc with id as the deterministic tie-break. */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25TopK: empty query")
    val qset = queryTerms.map(_.toLowerCase).distinct
    val base = docs.select(col(idCol).as("id"),
        tokens(col(textCol)).as("toks"))
      .select(col("id"), col("toks"), size(col("toks")).as("dl"))
    // corpus-level constants: one tiny agg, broadcast into the plan
    val corpus = base.agg(count(lit(1)).as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // explode → prune to query terms BEFORE the first shuffle. (A
    // pre-explode HOF `filter(toks, ...)` looks tighter but HOFs run
    // interpreted — measured 2.7x slower than the codegen'd
    // Generate + Filter pipeline this compiles to.)
    val hits = base.select(col("id"), col("dl"),
        explode(col("toks")).as("term"))
      .where(col("term").isin(qset: _*))
    // tf is tiny (≤ docs × |queryTerms| rows): checkpoint it so the df
    // stats broadcast and the final scoring join reuse ONE tokenize
    // pass instead of re-running the chain per consumer; lazy so no
    // job runs at plan-build time (NOTES_r10 §6)
    val tf = hits.groupBy("id", "dl", "term").agg(count(lit(1)).as("tf"))
      .materialized("retrieval_tf")
    // df per query term: tf already has one row per (doc, term)
    val dft = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val scored = tf.join(broadcast(dft), "term").crossJoin(broadcast(corpus))
      .withColumn("idf",
        log(lit(1.0) + (col("n_docs") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("w", col("idf") * (col("tf") * lit(k1 + 1.0)) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
    scored.groupBy("id")
      .agg(round(sum(col("w")), 6).as("bm25"),
        count(lit(1)).cast("bigint").as("n_hit"))
      .orderBy(desc("bm25"), asc("id"))
      .limit(k)
      .withColumnRenamed("id", idCol)
  }

  /** Materialized inverted index: one row per term with document
    * frequency, total term frequency, and a capped posting list —
    * the build-once/search-many artifact behind retrieval-based
    * curation (persist as parquet, equi-join query terms against it
    * instead of re-tokenizing the corpus per query).
    *
    * Scale shape: one tokenize pass → one (term, doc) keyed
    * aggregation for tf → one term-keyed aggregation folding postings.
    * The posting cap bounds the per-term row (a stopword's full
    * posting list would be |corpus|-sized); df/total_tf stay exact
    * over ALL postings, only the stored list is capped. Postings order
    * is deterministic: tf desc, doc asc.
    *
    * @return (term, df, total_tf, postings) — postings a
    *         "doc:tf,doc:tf,…" string of the top-`maxPostings`
    */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int = 10): DataFrame = {
    require(maxPostings > 0, s"maxPostings must be positive, got $maxPostings")
    val tf = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("term"))
      .groupBy("term", "doc").agg(count(lit(1)).as("tf"))
    val stats = tf.groupBy("term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("total_tf"))
    // cap BEFORE collecting, in TWO stages. A per-partition local
    // sort + streaming keep-first-n first reduces each term to
    // ≤ maxPostings rows per input partition (the capPerGroup skew
    // defense, spill-safe): terms are Zipf-skewed, and without the
    // pre-pass a stopword's full posting set (df ≈ |corpus|)
    // serializes into ONE window sort task that AQE cannot split.
    // The ranking window then sees at most maxPostings × partitions
    // rows per term — and since (term, doc) is unique in tf,
    // (tf desc, doc asc) is a total order, so the global
    // top-maxPostings survives the pre-pass bit-identically.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("term").orderBy(desc("tf"), asc("doc"))
    val top = topPerTermPrePass(tf, maxPostings)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= maxPostings)
      .groupBy("term")
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("__rn").as("rn"),
          col("doc").as("doc"), col("tf").as("tf")))),
        e => concat(e.getField("doc").cast("string"), lit(":"),
          e.getField("tf").cast("string"))), ",").as("postings"))
    stats.join(top, "term")
  }

  /** Per-partition pre-cap for [[invertedIndex]]: keep the best `n`
    * `(term, doc, tf)` rows per term PER INPUT PARTITION under the
    * posting order (tf desc, doc asc). Shape: a LOCAL sort (Spark's
    * spillable external sorter — no exchange, and no per-term heap
    * map pinning deserialized rows on a mostly-rare-terms vocabulary)
    * followed by a streaming keep-first-n filter whose state is one
    * term value and a counter. Null-safe by construction: the sort
    * places null terms/docs deterministically (nulls first, the same
    * order the downstream window uses) and the filter only tests term
    * equality. */
  private def topPerTermPrePass(tf: DataFrame, n: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.catalyst.encoders.RowEncoder
    val sch = tf.schema
    val ti = sch.fieldIndex("term")
    tf.sortWithinPartitions(col("term"), desc("tf"), asc("doc"))
      .mapPartitions { rows =>
        var cur: Any = null
        var started = false
        var kept = 0
        rows.filter { r =>
          val t = r.get(ti)
          if (!started || t != cur) { started = true; cur = t; kept = 1; true }
          else { kept += 1; kept <= n }
        }
      }(RowEncoder.encoderFor(sch))
  }
}
