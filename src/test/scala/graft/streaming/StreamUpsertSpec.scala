package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamUpsertSpec extends SparkTestBase {

  private val batch1 = Seq(
    ChangeRow(1L, 1, "one-v1", deleted = false),
    ChangeRow(2L, 1, "two-v1", deleted = false),
    ChangeRow(3L, 1, "three-v1", deleted = false))
  private val batch2 = Seq(
    ChangeRow(1L, 2, "one-v2", deleted = false),   // update
    ChangeRow(2L, 0, "two-v0-stale", deleted = false), // out-of-order: loses
    ChangeRow(3L, 2, "three-v2", deleted = true),  // tombstone
    ChangeRow(4L, 1, "four-v1", deleted = false))  // insert

  test("streamed latest-per-key state == batch max_by over the full log") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val expected = StreamUpsert.batch((batch1 ++ batch2).toDS())
      .collect().map(r => r.key -> r).toMap

    val mem = MemoryStream[ChangeRow](20)
    val q = StreamUpsert.streaming(mem.toDS())
      .writeStream.format("memory").queryName("su_test")
      .outputMode("update").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable()
      mem.addData(batch2: _*)
      q.processAllAvailable()

      // update-mode sink logs every state advance; the final state per
      // key is the highest-rev row it logged
      val streamed = spark.table("su_test")
        .groupBy("key")
        .agg(max_by(struct(col("key"), col("rev"), col("payload"),
          col("deleted")), col("rev")).as("t"))
        .select("t.*").as[ChangeRow]
        .collect().map(r => r.key -> r).toMap

      assert(streamed === expected)
      // the stale rev-0 arrival for key 2 must not have emitted
      assert(spark.table("su_test")
        .filter(col("key") === 2L && col("rev") === 0).count() === 0)
    } finally q.stop()
  }
}
