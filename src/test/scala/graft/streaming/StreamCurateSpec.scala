package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class StreamCurateSpec extends SparkTestBase {

  // long docs pass the quality gate; "lo" is under it; two exact dups
  private val good =
    "the quick brown fox jumps over the lazy dog and then the fox rests " * 3
  private val other =
    "a completely different long document about spark and the data it reads " * 3
  private val rows = Seq(
    (Timestamp.valueOf("2024-01-01 00:00:10"), 1L, good),
    (Timestamp.valueOf("2024-01-01 00:01:00"), 2L, "lo"),
    (Timestamp.valueOf("2024-01-01 00:02:00"), 3L, good),  // dup of 1
    (Timestamp.valueOf("2024-01-01 00:03:00"), 4L, other),
    (Timestamp.valueOf("2024-01-01 00:03:30"), 5L, other)) // dup of 4

  test("streaming curation == batch curation within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val batchKept = StreamCurate.batch(
        rows.toDF("ts", "doc_id", "text"), "doc_id", "text", 0.3)
      .select("doc_id", "fp").as[(Long, String)].collect().toSet

    val mem = MemoryStream[(Timestamp, Long, String)](11)
    val q = StreamCurate.streaming(
        mem.toDF().toDF("ts", "doc_id", "text"),
        "text", "ts", "10 minutes", 0.3)
      .writeStream.format("memory").queryName("sc_test")
      .outputMode("append").start()
    try {
      mem.addData(rows: _*)
      q.processAllAvailable()
      val streamedKept = spark.table("sc_test")
        .select("doc_id", "fp").as[(Long, String)].collect().toSet
      // rows arrive in id order, so streaming first-seen == batch min-id
      assert(streamedKept === batchKept)
      assert(streamedKept.map(_._1) === Set(1L, 4L))
    } finally q.stop()
  }

  test("quality gate drops low-score rows before dedup state is touched") {
    import spark.implicits._
    val kept = StreamCurate.scored(
        rows.toDF("ts", "doc_id", "text"), "text", 0.3)
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 5L))
  }
}
