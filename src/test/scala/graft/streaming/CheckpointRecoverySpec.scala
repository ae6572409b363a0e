package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.{Files, Paths}

/** The restart contract a production stream lives by: source offsets,
  * dedup state-store contents, and the file sink's commit log must all
  * survive a stop/start on the same checkpoint — already-read files
  * are not re-read, already-seen fingerprints stay suppressed, and the
  * sink stays exactly-once. */
class CheckpointRecoverySpec extends SparkTestBase {

  test("restart from checkpoint: offsets, dedup state, sink exactly-once") {
    val in = Files.createTempDirectory("graft_ckpt_in").toString
    val out = Files.createTempDirectory("graft_ckpt_out").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_meta").toString
    def writeFile(name: String, rows: Seq[String]): Unit = {
      val _ = Files.write(Paths.get(in, name),
        rows.mkString("\n").getBytes("UTF-8"))
    }
    def runOnce(): Unit = {
      val src = spark.readStream
        .schema("ts TIMESTAMP, fp STRING, v DOUBLE").csv(in)
      val q = StreamDedup.streaming(src, Seq("fp"), "ts", "10 minutes")
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    writeFile("a.csv", Seq(
      "2024-01-01 00:00:10,fp-a,1.0",
      "2024-01-01 00:01:00,fp-b,2.0"))
    runOnce()
    assert(spark.read.parquet(out).count() === 2)

    // second incarnation: one dup of an fp seen BEFORE the restart,
    // one genuinely new fp
    writeFile("b.csv", Seq(
      "2024-01-01 00:02:00,fp-a,3.0",
      "2024-01-01 00:03:00,fp-c,4.0"))
    runOnce()

    val rows = spark.read.parquet(out)
      .collect().map(r => r.getString(1) -> r.getDouble(2)).toMap
    assert(rows.keySet === Set("fp-a", "fp-b", "fp-c"))
    assert(rows("fp-a") === 1.0, "pre-restart state must suppress the dup")
    assert(spark.read.parquet(out).count() === 3, "sink must be exactly-once")
  }
}
