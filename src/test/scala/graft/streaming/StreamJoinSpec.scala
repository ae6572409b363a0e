package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class StreamJoinSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trades = Seq(
    (1L, 1, ts("2024-01-01 10:00:00")),
    (2L, 1, ts("2024-01-01 10:20:00")),
    (3L, 2, ts("2024-01-01 10:05:00")))
  private val quotes = Seq(
    (1, ts("2024-01-01 09:55:00"), 7.0),  // within 10m of trade 1 only
    (1, ts("2024-01-01 10:15:00"), 8.0),  // within 10m of trade 2
    (2, ts("2024-01-01 08:00:00"), 9.0))  // too old for trade 3

  test("stream-stream interval join == batch interval join") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val batch = StreamJoin.tradesWithRecentQuotes(
        trades.toDF("trade_id", "user_id", "t_ts"),
        quotes.toDF("q_user_id", "q_ts", "quote"))
      .select("trade_id", "quote").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    assert(batch === Set((1L, 7.0), (2L, 8.0))) // trade 3 unmatched

    val tMem = MemoryStream[(Long, Int, Timestamp)](20)
    val qMem = MemoryStream[(Int, Timestamp, Double)](21)
    val joined = StreamJoin.tradesWithRecentQuotes(
      tMem.toDF().toDF("trade_id", "user_id", "t_ts"),
      qMem.toDF().toDF("q_user_id", "q_ts", "quote"),
      watermark = Some("30 minutes"))
    val q = joined.selectExpr("trade_id", "quote")
      .writeStream.format("memory").queryName("sj_test")
      .outputMode("append").start()
    try {
      tMem.addData(trades: _*)
      qMem.addData(quotes: _*)
      q.processAllAvailable()
      val streamed = spark.table("sj_test").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
