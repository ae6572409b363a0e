package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed event aggregation shared between batch and Structured
  * Streaming: the transform is written once against an unbound
  * DataFrame, so `spark.read` (batch backfill) and `spark.readStream`
  * (live) execute the identical plan — the Kappa-style pattern for a
  * pipeline that must reprocess 100 TB of history with the same code
  * that tails the stream.
  */
object EventWindows {

  /** Tumbling-window counts/sums per event type. For streaming input,
    * a watermark bounds state: late rows beyond `watermark` are
    * dropped and windows older than it are finalized + evicted. */
  def tumblingStats(events: DataFrame, windowDur: String = "1 hour",
      watermark: Option[String] = None): DataFrame = {
    val src = watermark.fold(events)(w => events.withWatermark("ts", w))
    src.groupBy(window(col("ts"), windowDur).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("value").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }
}
