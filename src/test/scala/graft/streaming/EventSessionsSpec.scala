package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class EventSessionsSpec extends SparkTestBase {
  import EventSessions._

  private def ts(s: String) = Timestamp.valueOf(s)

  // user 1: two sessions (gap > 30min between 10:00 block and 11:30 block)
  // user 2: one session
  private val rows = Seq(
    Ev(1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
    Ev(1L, 2L, ts("2024-01-01 10:10:00"), 2.0),
    Ev(1L, 3L, ts("2024-01-01 10:20:00"), 4.0),
    Ev(1L, 4L, ts("2024-01-01 11:30:00"), 8.0),
    Ev(1L, 5L, ts("2024-01-01 11:40:00"), 16.0),
    Ev(2L, 6L, ts("2024-01-01 10:05:00"), 32.0))

  test("batch sessionization: gap split, numbering, aggregates") {
    import spark.implicits._
    val out = sessionizeBatch(
        rows.toDF().withColumnRenamed("ts", "ts"), gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(4),
        r.getDouble(5))).toSeq
    assert(out === Seq(
      (1L, 1L, 3L, 7.0),   // 10:00-10:20, 3 events, 1+2+4
      (1L, 2L, 2L, 24.0),  // 11:30-11:40, 8+16
      (2L, 1L, 1L, 32.0)))
  }

  test("streaming flatMapGroupsWithState produces the same sessions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val batch = sessionizeBatch(rows.toDF(), gapMinutes = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5))).toSet

    val mem = MemoryStream[Ev](11)
    val q = sessionizeStream(mem.toDS(), gapMinutes = 30,
        watermarkDelay = "1 minute")
      .writeStream.format("memory").queryName("sess_test")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      // advance the watermark far past every session close
      mem.addData(Ev(99L, 999L, ts("2024-01-02 12:00:00"), 0.0))
      q.processAllAvailable()
      mem.addData(Ev(99L, 1000L, ts("2024-01-03 12:00:00"), 0.0))
      q.processAllAvailable()
      val streamed = spark.table("sess_test")
        .filter(col("user_id") =!= 99L)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getDouble(5))).toSet
      assert(streamed === batch,
        s"streamed=$streamed\nbatch=$batch")
    } finally q.stop()
  }
}
