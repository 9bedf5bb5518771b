package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic token masking — the span-corruption input stage of
  * masked/denoising LM training data (BERT/T5 style), made
  * reproducible: a token is masked iff the md5-fraction of
  * (doc, position) falls under the rate, so the SAME tokens mask on
  * every engine, run, and cluster size — no RNG state, and an
  * incremental rebuild of one shard cannot reshuffle another's masks.
  *
  * Scale shape: entirely row-local (split → per-token lambda →
  * rejoin); ZERO shuffles — the corpus streams through one projection.
  * The per-token lambdas run interpreted (Spark HOFs don't codegen),
  * which is the right trade here: a posexplode+window+collect
  * alternative would shuffle every token of the corpus to buy codegen
  * on a cheap hash compare.
  */
object Masking {

  /** Per-(doc, pos) mask decision in [0,1): md5-fraction of
    * "id:pos" — the [[Mixing.frac32]] determinism pattern. */
  private def maskU(id: Column, pos: Column): Column =
    Mixing.frac32(concat(id.cast("string"), lit(":"), pos.cast("string")))

  /** Mask `rate` of whitespace tokens per document.
    *
    * @return (id, masked, targets, n_tokens, n_masked) — `masked` is
    *         the text with masked tokens replaced by `maskTok`,
    *         `targets` the masked tokens in order (space-joined)
    */
  def maskTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      rate: Double = 0.15,
      maskTok: String = "<mask>"): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    val ws = graft.expr.NormWords(col(textCol))
    val id = col(idCol)
    val flags = transform(ws, (_, i) => maskU(id, i) < lit(rate))
    docs
      .where(length(trim(col(textCol))) > 0)
      .select(id.as("id"), ws.as("ws"), flags.as("fl"))
      .select(col("id"),
        array_join(zip_with(col("ws"), col("fl"),
          (w, f) => when(f, lit(maskTok)).otherwise(w)), " ").as("masked"),
        array_join(filter(zip_with(col("ws"), col("fl"),
          (w, f) => when(f, w)), _.isNotNull), " ").as("targets"),
        size(col("ws")).cast("long").as("n_tokens"),
        size(filter(col("fl"), f => f)).cast("long").as("n_masked"))
      .withColumnRenamed("id", idCol)
  }
}
