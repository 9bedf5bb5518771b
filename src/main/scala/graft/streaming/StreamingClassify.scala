package graft.streaming

import graft.llm.Classifier
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode}

/** Continuous model-based quality filtering — the streaming twin of
  * [[graft.llm.Classifier]]: score every arriving document against a
  * frozen (typically parquet-persisted) NB model and route it by
  * predicted class. The "filter the incoming crawl" stage, run as a
  * stream instead of a nightly batch.
  *
  * Shape: `foreachBatch` scoring (the [[Publication]] idiom) — each
  * micro-batch runs the exact batch [[Classifier.nbScore]] plan
  * (tokenize → vocab join → per-doc sum), so streaming and batch
  * scores are identical by construction, and the model tables are
  * re-read per micro-batch from their path — a model swap on the same
  * path is picked up live, the [[StreamingNearDup.flagAgainstCatalog]]
  * catalog-swap property. Zero keyed state: scoring is per-document,
  * so there is nothing to checkpoint beyond source offsets. */
object StreamingClassify {

  /** Writer that lands `(doc_id, n_terms, score_e6, pred)` parquet
    * per micro-batch under `outDir/batch=<id>`, scoring against the
    * model at `modelDir` (written by [[persistModel]]). Read results
    * with `spark.read.parquet(outDir)` (partition discovery adds a
    * `batch` column). IDEMPOTENT under micro-batch replay: each batch
    * OVERWRITES its own batch-id directory, so a crash between the
    * write and the offset commit re-lands identical files instead of
    * appending duplicates — exactly-once output from an
    * at-least-once re-execution. */
  def scoreTo(stream: DataFrame, idCol: String, textCol: String,
              modelDir: String, outDir: String)
      : DataStreamWriter[org.apache.spark.sql.Row] = {
    require(stream.isStreaming, "scoreTo needs a streaming DataFrame")
    stream.writeStream
      .outputMode(OutputMode.Append())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        Classifier.nbScore(batch,
            s.read.parquet(s"$modelDir/weights"),
            s.read.parquet(s"$modelDir/consts"),
            idCol, textCol)
          .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        ()
      }
  }

  /** Persist a trained `(weights, consts)` model under one directory
    * in the layout [[scoreTo]] reads. */
  def persistModel(weights: DataFrame, consts: DataFrame,
                   modelDir: String): Unit = {
    weights.write.mode("overwrite").parquet(s"$modelDir/weights")
    consts.write.mode("overwrite").parquet(s"$modelDir/consts")
  }
}
