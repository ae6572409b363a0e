package graft.streaming

import org.apache.spark.sql.DataFrame

/** Exact dedup shared between batch and Structured Streaming — the
  * ingest-side "drop what we've already seen" step of a training-data
  * pipeline (batch analog: ExtensionQueries x1/x7).
  *
  * Batch: plain dropDuplicates — one hash aggregation on the key.
  * Streaming: dropDuplicatesWithinWatermark after a watermark on
  * `tsCol`, so the dedup state store holds only keys younger than the
  * watermark instead of growing without bound — the only formulation
  * that survives an unbounded stream. Within the watermark horizon the
  * streamed output is exactly the batch-distinct set (StreamDedupSpec
  * asserts the parity).
  */
object StreamDedup {

  def batch(df: DataFrame, keyCols: Seq[String]): DataFrame =
    df.dropDuplicates(keyCols)

  def streaming(df: DataFrame, keyCols: Seq[String], tsCol: String,
      watermark: String): DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)
}
