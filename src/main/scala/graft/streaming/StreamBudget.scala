package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-key token budgets are top-level, not nested in the companion:
  * the codegen'd encoder serializer fails under janino for nested case
  * classes and every projection silently falls back to interpreted
  * eval (the MisraGriesAgg lesson). */
case class BudgetDoc(key: String, doc_id: Long, n_tok: Long,
    ts: java.sql.Timestamp)
case class BudgetAdmit(key: String, doc_id: Long, n_tok: Long,
    cum_tok: Long, admitted: Boolean)

/** Streaming admission control — the live-ingest twin of the batch
  * token budgets (x20 per-source, x30 per-language). A batch job caps
  * a key at a FRACTION of its total mass because it can see the
  * total; a stream cannot, so the streaming form takes an ABSOLUTE
  * per-key token cap and admits by PREFIX CUT: every arrival bumps
  * the key's running total (admitted or not), and a document is
  * admitted iff the total including it is still under the cap — the
  * same cum_tok*,≤-cap arithmetic as x20, which is what makes the
  * batch window an exact twin.
  *
  * Scale shape: `flatMapGroupsWithState` with O(1) state per key (one
  * running long — no element list, no timeout bookkeeping), emitted
  * decisions in append mode. Within a trigger the group's rows are
  * processed in (event-time, id) order so a replayed stream and the
  * batch form agree row for row (StreamBudgetSpec pins parity,
  * including state carried across triggers). */
object StreamBudget {

  /** Batch twin: prefix-cut admission in (ts, doc_id) order — x20's
    * running-frame window with an absolute cap. Expects columns
    * (key, doc_id, n_tok, ts). */
  def batch(df: DataFrame, capTokens: Long): DataFrame = {
    val w = Window.partitionBy("key").orderBy(col("ts"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tok", sum(col("n_tok")).over(w))
      .withColumn("admitted", col("cum_tok") <= capTokens)
      .select(col("key"), col("doc_id"), col("n_tok"), col("cum_tok"),
        col("admitted"))
  }

  /** Streaming form: one running total per key, decisions appended. */
  def streaming(ds: Dataset[BudgetDoc],
      capTokens: Long): Dataset[BudgetAdmit] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Long, BudgetAdmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: String, docs: Iterator[BudgetDoc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          // (getTime, getNanos) is Timestamp's full natural order —
          // getTime alone is millisecond-truncated, and Tables.events
          // carries µs timestamps: two same-key events inside one
          // millisecond whose doc_id order opposes their µs order
          // would be admitted in a different order than the batch
          // twin's (ts, doc_id) window (spec-pinned, sub-ms fixture).
          val out = docs.toSeq
            .sortBy(d => (d.ts.getTime, d.ts.getNanos, d.doc_id)).map { d =>
            cum += d.n_tok
            BudgetAdmit(key, d.doc_id, d.n_tok, cum, cum <= capTokens)
          }
          state.update(cum)
          out.iterator
      }
  }
}
