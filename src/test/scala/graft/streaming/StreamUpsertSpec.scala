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

  private def viewByKey(dir: String) =
    StreamUpsert.currentView(spark, dir).collect().map(r => r.key -> r).toMap

  test("mergeBatch: versioned commit makes a replayed batch a no-op") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert_tbl").toString
    val expected = StreamUpsert.batch((batch1 ++ batch2).toDS())
      .collect().map(r => r.key -> r).toMap

    assert(StreamUpsert.mergeBatch(batch1.toDS(), 0L, dir))
    assert(StreamUpsert.mergeBatch(batch2.toDS(), 1L, dir))
    assert(viewByKey(dir) === expected)
    // at-least-once delivery replays batch 1 with the same id: the
    // commit check must skip it and the view must not change
    assert(!StreamUpsert.mergeBatch(batch2.toDS(), 1L, dir))
    assert(viewByKey(dir) === expected)
    assert(StreamUpsert.committedVersions(dir).toSet === Set(0L, 1L))
  }

  // The streaming guarantee end-to-end: the sink write SUCCEEDS, the
  // query dies before the checkpoint commits the offsets, the restarted
  // incarnation re-delivers the same micro-batch (same batchId — the
  // foreachBatch retry contract) — and the merged table must come out
  // exactly-once anyway.
  test("crash between sink write and checkpoint commit: restart replays, effect stays exactly-once") {
    import java.nio.file.{Files, Paths}
    import spark.implicits._
    val in = Files.createTempDirectory("graft_upsert_in").toString
    val tbl = Files.createTempDirectory("graft_upsert_crash_tbl").toString
    val ckpt = Files.createTempDirectory("graft_upsert_ckpt").toString
    def writeFile(name: String, rows: Seq[ChangeRow]): Unit = {
      val _ = Files.write(Paths.get(in, name),
        rows.map(r => s"${r.key},${r.rev},${r.payload},${r.deleted}")
          .mkString("\n").getBytes("UTF-8"))
    }
    val applied = new java.util.concurrent.atomic.AtomicInteger(0)
    def runOnce(failAfterSink: Boolean): Unit = {
      val src = spark.readStream
        .schema("key BIGINT, rev INT, payload STRING, deleted BOOLEAN")
        .csv(in).as[ChangeRow]
      val q = src.writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch { (b: org.apache.spark.sql.Dataset[ChangeRow], id: Long) =>
          if (StreamUpsert.mergeBatch(b, id, tbl)) applied.incrementAndGet()
          if (failAfterSink)
            throw new RuntimeException("injected crash after sink write")
        }
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      try q.awaitTermination()
      catch { case _: org.apache.spark.sql.streaming.StreamingQueryException => () }
      finally q.stop()
    }

    writeFile("b1.csv", batch1)
    runOnce(failAfterSink = false)
    assert(applied.get === 1)

    // incarnation 2: batch 1's merge commits, then the query dies
    // before the offset log records it
    writeFile("b2.csv", batch2)
    runOnce(failAfterSink = true)
    assert(applied.get === 2, "the sink write itself must have landed")

    // incarnation 3: Spark re-delivers batch 1; the commit check makes
    // the replay a no-op instead of a double-apply
    runOnce(failAfterSink = false)
    assert(applied.get === 2, "replayed batch must not re-apply")
    val expected = StreamUpsert.batch((batch1 ++ batch2).toDS())
      .collect().map(r => r.key -> r).toMap
    assert(viewByKey(tbl) === expected)
  }
}
