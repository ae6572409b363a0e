package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

/** One change-log record: latest `rev` per `key` wins; a winning
  * tombstone (`deleted = true`) removes the key. */
case class ChangeRow(key: Long, rev: Int, payload: String, deleted: Boolean)

/** Latest-revision-wins upsert shared between batch and Structured
  * Streaming — the streaming twin of [[graft.operators.Upsert]]: a CDC
  * change stream continuously materialized into a latest-per-key view.
  *
  * Batch: one `max_by` hash aggregation (shuffle O(keys)).
  * Streaming: `mapGroupsWithState` keyed on the business key; state is
  * the current winning revision per key — i.e. exactly the
  * materialized dimension table, so state size is bounded by key
  * cardinality (RocksDB state store territory at scale), not by
  * stream length. Out-of-order older revisions are absorbed without
  * emitting. StreamUpsertSpec asserts stream/batch parity, including
  * the out-of-order case.
  */
object StreamUpsert {

  /** Batch collapse of a change log to latest-per-key (tombstones kept
    * so callers can see deletes; filter `!deleted` for the live view). */
  def batch(changes: Dataset[ChangeRow]): Dataset[ChangeRow] = {
    val df = changes.toDF()
    df.groupBy(col("key").as("_k"))
      .agg(max_by(struct(df.columns.toIndexedSeq.map(col): _*),
        col("rev")).as("_top"))
      .select(col("_top.*"))
      .as(Encoders.product[ChangeRow])
  }

  /** Update-mode streaming form: emits the key's new winning row
    * whenever a batch advances it; stale (lower-rev) arrivals leave
    * state untouched and emit nothing. */
  def streaming(changes: Dataset[ChangeRow]): Dataset[ChangeRow] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.key)
      .flatMapGroupsWithState[ChangeRow, ChangeRow](
        org.apache.spark.sql.streaming.OutputMode.Update(),
        GroupStateTimeout.NoTimeout()) {
        (_: Long, rows: Iterator[ChangeRow], state: GroupState[ChangeRow]) =>
          val best = (rows ++ state.getOption.iterator)
            .reduceLeft((a, b) => if (a.rev >= b.rev) a else b)
          if (state.getOption.forall(_.rev < best.rev)) {
            state.update(best)
            Iterator.single(best)
          } else Iterator.empty
      }
  }
}
