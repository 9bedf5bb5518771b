package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming repeated-span flagging against a FROZEN span catalog —
  * the stream twin of [[graft.llm.Dedup.removeCatalogSpans]], shaped
  * like [[StreamingNearDup.flagAgainstCatalog]]: arriving documents
  * are winnow-sampled per row (the stateless native `span_anchors`
  * expression — alignment-free by construction, so a crawl snapshot's
  * shifted boilerplate still matches), then stream-static equi-joined
  * on the 128-bit span key. NO keyed streaming state: the catalog IS
  * the state, and Spark re-plans the static side per micro-batch, so
  * a catalog swap on the same path is picked up without restarting
  * the query. */
object StreamingSpans {

  /** One row `(id, pos, span_key, n_sites)` per arriving sampled
    * window whose content the catalog already holds. Aggregate
    * downstream (per-doc flags need a watermarked aggregation in
    * streaming, or run the batch [[graft.llm.Dedup.removeCatalogSpans]]
    * over flagged ids when the surgery itself is wanted). Build the
    * catalog with the SAME spanChars/winnowW — the content-defined
    * sampling then guarantees identical selected positions inside
    * shared regions. */
  def flagCatalogSpans(stream: DataFrame, idCol: String, textCol: String,
                       catalog: DataFrame, spanChars: Int = 64,
                       winnowW: Int = 31): DataFrame =
    graft.llm.Dedup
      .sampledSpanWindows(stream, idCol, textCol, spanChars, winnowW)
      .join(catalog.select(col("span_key"), col("n_sites")),
        Seq("span_key"))
      .select(col("doc_id").as("id"), col("pos"), col("span_key"),
        col("n_sites"))
}
