package graft.streaming

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-side corpus curation shared between batch and Structured
  * Streaming: quality-gate each document with the map-only heuristic
  * score (no explode, no aggregation — the property that keeps the
  * stage stateless and therefore streamable), fingerprint the content,
  * and drop duplicates on the fingerprint.
  *
  * Batch: filter + one hash aggregation (keep-min-id, dup count).
  * Streaming: the same filter fused into the source scan, then
  * `dropDuplicatesWithinWatermark` so dedup state stays bounded by the
  * watermark horizon — the composition a live ingest pipeline runs
  * (first-seen keeps the row; within the horizon that equals the
  * batch-distinct set, StreamCurateSpec asserts it).
  */
object StreamCurate {

  /** Stateless shared stage: adds `fp` (normalized-content md5) and
    * `q` (heuristic quality), drops rows under `minQuality`. */
  def scored(df: DataFrame, textCol: String,
      minQuality: Double): DataFrame =
    df.withColumn("fp", TextAnalysis.fingerprintMd5(col(textCol)))
      .withColumn("q", TextAnalysis.qualityScore(col(textCol)))
      .filter(col("q") >= minQuality)

  /** Batch form: one row per surviving fingerprint — smallest id wins,
    * with the duplicate count the curation report wants. */
  def batch(df: DataFrame, idCol: String, textCol: String,
      minQuality: Double): DataFrame =
    scored(df, textCol, minQuality)
      .groupBy("fp")
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(col(idCol), col("fp"), col("n_dups"))

  /** Streaming form: append-mode safe (no aggregation — first arrival
    * per fingerprint survives, state evicted past the watermark). */
  def streaming(df: DataFrame, textCol: String, tsCol: String,
      watermark: String, minQuality: Double): DataFrame =
    scored(df, textCol, minQuality)
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
