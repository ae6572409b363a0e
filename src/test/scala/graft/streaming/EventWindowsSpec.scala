package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

/** The streaming contract: the same tumblingStats transform runs over a
  * MemoryStream with a watermark, producing the identical rows the
  * batch path produces once all data is in. */
class EventWindowsSpec extends SparkTestBase {

  test("tumblingStats: streaming result == batch result") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val rows = Seq(
      (Timestamp.valueOf("2024-01-01 00:05:00"), "click", 1.0),
      (Timestamp.valueOf("2024-01-01 00:25:00"), "click", 2.5),
      (Timestamp.valueOf("2024-01-01 00:45:00"), "view", 4.0),
      (Timestamp.valueOf("2024-01-01 01:10:00"), "click", 8.0),
      (Timestamp.valueOf("2024-01-01 02:30:00"), "view", 16.0))

    val batch = EventWindows.tumblingStats(
        rows.toDF("ts", "event_type", "value"))
      .orderBy("window_start", "event_type").collect().toSeq

    val mem = MemoryStream[(Timestamp, String, Double)](1)
    val streamDf = mem.toDF().toDF("ts", "event_type", "value")
    val q = EventWindows.tumblingStats(streamDf, watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("ew_test")
      .outputMode("complete").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamed = spark.table("ew_test")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("watermark: a too-late row is dropped in append mode") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val mem = MemoryStream[(Timestamp, String, Double)](2)
    val q = EventWindows.tumblingStats(
        mem.toDF().toDF("ts", "event_type", "value"),
        watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("ew_late")
      .outputMode("append").start()
    try {
      mem.addData((Timestamp.valueOf("2024-01-01 03:00:00"), "click", 1.0))
      q.processAllAvailable()
      // watermark is now ~02:50 → the 00:xx window is closed; this row is late
      mem.addData((Timestamp.valueOf("2024-01-01 00:30:00"), "click", 99.0))
      q.processAllAvailable()
      mem.addData((Timestamp.valueOf("2024-01-01 05:00:00"), "click", 1.0))
      q.processAllAvailable() // advances watermark, finalizes earlier windows
      val rows = spark.table("ew_late").collect()
      assert(!rows.exists(_.getAs[Double]("sum_value") == 99.0),
        s"late row leaked: ${rows.mkString(";")}")
    } finally q.stop()
  }

  test("file source + AvailableNow + checkpoint == batch over the same files") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ssrc").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sckpt").toString
    val rows = Seq(
      (Timestamp.valueOf("2024-03-01 10:05:00"), "click", 1.5),
      (Timestamp.valueOf("2024-03-01 10:35:00"), "view", 2.0),
      (Timestamp.valueOf("2024-03-01 11:10:00"), "click", 4.0),
      (Timestamp.valueOf("2024-03-01 12:20:00"), "view", 8.0))
    rows.toDF("ts", "event_type", "value")
      .write.mode("overwrite").parquet(dir)

    val batch = EventWindows.tumblingStats(spark.read.parquet(dir))
      .orderBy("window_start", "event_type").collect().toSeq

    val stream = spark.readStream
      .schema("ts TIMESTAMP, event_type STRING, value DOUBLE")
      .parquet(dir)
    val q = EventWindows.tumblingStats(stream, watermark = Some("10 minutes"))
      .writeStream.format("memory").queryName("ew_file")
      .outputMode("complete")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // AvailableNow processes the backlog then stops on its own
      assert(q.awaitTermination(60000), "stream did not drain in 60s")
      val streamed = spark.table("ew_file")
        .orderBy("window_start", "event_type").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }
}
