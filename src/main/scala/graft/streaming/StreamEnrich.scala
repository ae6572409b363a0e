package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-static enrichment join — the dimension-lookup shape every
  * ingest stream runs (attach the customer/model/catalog row to each
  * event). Unlike a stream-stream join there is NO state store and no
  * watermark requirement: the static side is bounded, so Spark
  * broadcast-hash-joins it into every micro-batch and the stream stays
  * append-mode trivially.
  *
  * Scale notes: the static side is re-planned per micro-batch (so a
  * parquet-backed dimension picks up file changes between batches —
  * the cheap slowly-changing-dimension refresh); keep it under the
  * broadcast ceiling or pre-bucket both sides on the key. Left join
  * keeps events whose key has no dimension row yet — the
  * late-dimension case a production stream must tolerate (they surface
  * with null attributes rather than silently dropping).
  *
  * The same body runs in batch — the parity spec compares identical
  * plans; the batch twin is the `st5_stream_enrich` oracle query. */
object StreamEnrich {

  def withDimension(events: DataFrame, dim: DataFrame,
      key: String, dimKey: String): DataFrame =
    events.join(broadcast(dim), events(key) === dim(dimKey), "left")
}
