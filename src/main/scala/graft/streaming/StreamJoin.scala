package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the enrichment join Structured
  * Streaming actually supports (an exact as-of needs a per-left argmax
  * that streaming can't express; production pipelines use this
  * time-bounded join and aggregate afterwards).
  *
  * Both sides are watermarked and the join condition carries an
  * explicit event-time bound (quote no older than `lookback` before
  * the trade), which is what lets the state store evict: a buffered
  * quote can be dropped once the trade-side watermark passes
  * `quote.ts + lookback`. Without the time bound the state grows
  * forever — Spark rejects the query in append mode. The same
  * function body runs in batch (watermarks are no-ops there), so the
  * parity spec compares identical plans. */
object StreamJoin {

  def tradesWithRecentQuotes(trades: DataFrame, quotes: DataFrame,
      lookback: String = "10 minutes",
      watermark: Option[String] = None): DataFrame = {
    val t = watermark.fold(trades)(w => trades.withWatermark("t_ts", w))
    val q = watermark.fold(quotes)(w => quotes.withWatermark("q_ts", w))
    t.join(q,
      t("user_id") === q("q_user_id") &&
        q("q_ts") <= t("t_ts") &&
        q("q_ts") >= t("t_ts") - expr(s"interval $lookback"),
      "inner")
  }
}
