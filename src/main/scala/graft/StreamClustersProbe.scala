package graft

import graft.operators.Dedup
import graft.streaming.{NdDoc, StreamClusters, StreamNearDup}
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Measures ST10's replica-scale claim: after the one-time
  * corpus-sized bootstrap trigger, the per-trigger cluster-map
  * maintenance cost (pair the batch + fold it) TRACKS THE BATCH, and
  * the composed view read stays a map-only scan plus a broadcast.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  *   SPARK_GRAFT_CONF="spark.local.dir=/dev/shm/graft_probe" \
  *   sbt "runMain graft.StreamClustersProbe /tmp/sf12.5xm"
  *
  * Trigger shape (st10's parameters — 3-gram, 800000 ppm, NoCap):
  *  b=0 bootstrap — the whole corpus in one trigger (the snapshot
  *      load a deployment replays into the stream once — its
  *      batch-internal pairing IS the full corpus pair listing,
  *      the one-time cost the daily triggers never re-pay);
  *  b=1, b=2 — daily re-crawl batches (0.5% each, 90% prefixes of
  *      their sources at +5/+6·10¹² ids), each paired against the
  *      accumulated index deltas and folded per trigger;
  *  view — the composed cluster map count (what an x17/x29-style
  *      mid-day consumer pays);
  *  compact — cmap layer canonicalization + the deferred sweep.
  * Prints one JSON line (emitted even if a stage throws). */
object StreamClustersProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";")
      .filter(_.contains("=")).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val out = scala.collection.mutable.LinkedHashMap[String, String](
      "probe" -> "\"stream_clusters\"", "sf" -> s""""$sfDir"""")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      out(name) = f"${(System.nanoTime() - t0) / 1e9}%.2f"
      r
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_stcp").toString
    try {
      val docs = Tables.wide(Tables.documents(spark, sfDir))
        .select(col("doc_id"), col("text"))
      val kWords =
        expr("cast((size(split(text, ' ')) * 9 + 9) div 10 as int)")
      val pfx = array_join(
        slice(split(col("text"), " "), lit(1), kWords), " ")
      def batchOf(sel: org.apache.spark.sql.Column, off: Long) =
        docs.filter(sel)
          .select((col("doc_id") + off).as("doc_id"), pfx.as("text"))
          .as(Encoders.product[NdDoc])
      // the full corpus loads in the bootstrap trigger — the day
      // batches are re-crawl PREFIXES of corpus docs, so their
      // sources must be present for the folds to do real work
      val bootstrap = docs.as(Encoders.product[NdDoc])
      val day1 = batchOf(col("doc_id") % 200 === 0, 5000000000000L)
      val day2 = batchOf(col("doc_id") % 200 === 100, 6000000000000L)
      out("corpus_docs") = bootstrap.count().toString
      out("batch_docs") = day1.count().toString

      Seq(("0", bootstrap, "bootstrap"), ("1", day1, "day1"),
          ("2", day2, "day2")).foreach { case (id, b, tag) =>
        timed(s"${tag}_s") {
          val _ = StreamNearDup.pairBatch(b, id.toLong, dir, n = 3,
            thresholdPpm = 800000L, dfCap = Dedup.DfCap.NoCap)
          StreamClusters.foldCommitted(spark, dir)
        }
      }
      val n = timed("view_s") {
        StreamClusters.clusterView(spark, dir).count()
      }
      out("map_rows") = n.toString
      timed("compact_s") {
        val _ = StreamClusters.compactClusters(spark, dir)
      }
      val n2 = timed("view_post_s") {
        StreamClusters.clusterView(spark, dir).count()
      }
      out("map_rows_post") = n2.toString
    } finally {
      println(out.map { case (k, v) => s""""$k":$v""" }
        .mkString("{", ",", "}"))
      graft.streaming.StreamIndex.deleteTree(dir)
      spark.stop()
    }
  }
}
