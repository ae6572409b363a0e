package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization in both execution models:
  *
  *  - [[sessionizeBatch]]: lag + running-sum window formulation — the
  *    backfill path, one shuffle per window partition key.
  *  - [[sessionizeStream]]: `flatMapGroupsWithState` with event-time
  *    timeout — per-user session state lives in the state store;
  *    a session is emitted exactly once, when the watermark passes its
  *    close (gap elapsed). This is the custom-state primitive for
  *    semantics tumbling/sliding windows can't express (variable-length
  *    sessions).
  *
  * Session numbering (`session_seq`, 1-based per user in event-time
  * order) and the aggregates are identical across both paths — asserted
  * in EventSessionsSpec.
  */
object EventSessions {

  case class Ev(user_id: Long, event_id: Long, ts: java.sql.Timestamp,
      value: Double)
  case class Session(user_id: Long, session_seq: Long,
      session_start_us: Long, session_end_us: Long, n_events: Long,
      sum_value: Double)
  /** Open-session accumulator + per-user emitted-session counter. */
  case class SessState(seq: Long, startUs: Long, endUs: Long,
      n: Long, sum: Double)

  /** Batch/backfill: mark gap starts with lag(), number sessions with a
    * running sum, aggregate. Timestamps compared in integral
    * microseconds (deterministic across engines). */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int): DataFrame = {
    val gapUs = gapMinutes * 60L * 1000000L
    val order = Window.partitionBy("user_id")
      .orderBy(col("_us"), col("event_id"))
    val marked = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("_us"),
        col("value"))
      .withColumn("_prev", lag(col("_us"), 1).over(order))
      .withColumn("_new",
        when(col("_prev").isNull || col("_us") - col("_prev") > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("_new")).over(order.rowsBetween(Window.unboundedPreceding, 0)))
    marked.groupBy("user_id", "session_seq")
      .agg(min(col("_us")).as("session_start_us"),
        max(col("_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        round(sum(col("value").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_value"))
      .orderBy("user_id", "session_seq")
  }

  /** Streaming: per-user open-session state; closes (emits) a session
    * when a new event arrives past the gap, or when the event-time
    * timeout fires (watermark passed last event + gap). */
  def sessionizeStream(events: Dataset[Ev], gapMinutes: Int,
      watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L

    def us(t: java.sql.Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000

    events.withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, rows, state: GroupState[SessState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[Session]
          var st = state.getOption.orNull
          if (state.hasTimedOut) {
            if (st != null && st.n > 0) {
              out += Session(user, st.seq, st.startUs, st.endUs, st.n,
                math.rint(st.sum * 100) / 100)
              // keep the seq counter, mark no session open
              state.update(SessState(st.seq, -1L, -1L, 0L, 0.0))
            }
          } else {
            val sorted = rows.toSeq.sortBy(e => (us(e.ts), e.event_id))
            sorted.foreach { e =>
              val t = us(e.ts)
              if (st == null || st.n == 0L) {
                val seq = if (st == null) 1L else st.seq + 1
                st = SessState(seq, t, t, 1L, e.value)
              } else if (t - st.endUs > gapUs) {
                out += Session(user, st.seq, st.startUs, st.endUs, st.n,
                  math.rint(st.sum * 100) / 100)
                st = SessState(st.seq + 1, t, t, 1L, e.value)
              } else {
                st = SessState(st.seq, st.startUs, math.max(st.endUs, t),
                  st.n + 1, st.sum + e.value)
              }
            }
            state.update(st)
            // close the open session once the watermark passes end + gap
            // (timeout must sit beyond the current watermark)
            state.setTimeoutTimestamp(math.max(
              state.getCurrentWatermarkMs() + 1,
              st.endUs / 1000 + gapMinutes * 60000L))
          }
          out.iterator
      }
  }
}
