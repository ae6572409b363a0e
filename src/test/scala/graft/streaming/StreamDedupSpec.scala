package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class StreamDedupSpec extends SparkTestBase {

  private val rows = Seq(
    (Timestamp.valueOf("2024-01-01 00:00:10"), "fp-a", 1.0),
    (Timestamp.valueOf("2024-01-01 00:01:00"), "fp-b", 2.0),
    (Timestamp.valueOf("2024-01-01 00:02:00"), "fp-a", 3.0), // dup within watermark
    (Timestamp.valueOf("2024-01-01 00:03:00"), "fp-c", 4.0),
    (Timestamp.valueOf("2024-01-01 00:03:30"), "fp-b", 5.0)) // dup

  test("streaming dedup keys == batch-distinct keys within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val batchKeys = StreamDedup.batch(
        rows.toDF("ts", "fp", "v"), Seq("fp"))
      .select("fp").collect().map(_.getString(0)).toSet

    val mem = MemoryStream[(Timestamp, String, Double)](10)
    val q = StreamDedup.streaming(
        mem.toDF().toDF("ts", "fp", "v"), Seq("fp"), "ts", "10 minutes")
      .writeStream.format("memory").queryName("sd_test")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamedKeys = spark.table("sd_test")
        .select("fp").collect().map(_.getString(0)).toSet
      assert(streamedKeys === batchKeys)
      assert(spark.table("sd_test").count() === 3) // one row per key
    } finally q.stop()
  }
}
