package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamHeavyHittersSpec extends SparkTestBase {

  private val NSHARDS = 2
  private val K = 32

  /** Corpus tokens + a long unique-term tail, so the per-shard distinct
    * count (~15 hot + ~250 rare) far exceeds K and MG actually evicts —
    * on the near-uniform fixture alone the sketch would never be
    * stressed. */
  private def termStream(): Seq[String] = {
    import spark.implicits._
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(col("term") =!= "")
      .as[String].collect().toSeq
    base ++ (1 to 500).map(i => s"rare$i")
  }

  test("streamed sharded MG ⊇ exact hot terms; verify pass matches exact") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val terms = termStream()
    val total = terms.size.toLong
    val exactCounts = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val exactHot = exactCounts.collect {
      case (t, c) if c * 50 >= total => t -> c
    }.toMap
    assert(exactHot.size >= 20, "fixture should have many ≥2% terms")

    val (b1, b2) = terms.splitAt(terms.size / 2)
    val mem = MemoryStream[String](21)
    val q = StreamHeavyHitters.streaming(mem.toDS(), NSHARDS, K)
      .writeStream.format("memory").queryName("hh_test")
      .outputMode("update").start()
    val candidates =
      try {
        mem.addData(b1: _*); q.processAllAvailable()
        mem.addData(b2: _*); q.processAllAvailable()
        spark.table("hh_test")
          .groupBy("shard")
          .agg(max_by(col("keys"), col("ver")).as("keys"))
          .select(explode(col("keys")).as("term"))
          .as[String].collect().toSet
      } finally q.stop()

    // bounded state: at most nShards·K candidates ever
    assert(candidates.size <= NSHARDS * K)
    // recall guarantee survives sharding + micro-batching
    val missing = exactHot.keySet -- candidates
    assert(missing.isEmpty, s"hot terms missing from sketch: $missing")
    // exact-verify pass over candidates only == exact heavy hitters
    val verified = exactCounts.view
      .filterKeys(candidates).filter { case (_, c) => c * 50 >= total }.toMap
    assert(verified === exactHot)
  }

  test("a term's shard is stable, so every count lands in one state") {
    val ts = Seq("alpha", "beta", "gamma", "rare42")
    ts.foreach { t =>
      val s = StreamHeavyHitters.shardOf(t, NSHARDS)
      assert((1 to 10).forall(_ => StreamHeavyHitters.shardOf(t, NSHARDS) == s))
      assert(s >= 0 && s < NSHARDS)
    }
  }

  test("shardOf equals the batch twin's pmod(xxhash64(term), n), term for term") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val terms = (Seq("alpha", "beta", "gamma", "rare42", "", "ü", "dup") ++
      (0 until 100).map(i => s"tok$i")).toDF("term")
    val fromCol = terms
      .select(col("term"), pmod(xxhash64(col("term")), lit(NSHARDS.toLong))
        .cast("int").as("shard"))
      .as[(String, Int)].collect().toMap
    fromCol.foreach { case (t, s) =>
      assert(StreamHeavyHitters.shardOf(t, NSHARDS) === s, s"term '$t'")
    }
  }
}
