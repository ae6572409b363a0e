package graft.streaming

import graft.SparkTestBase
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Pins the streaming curation contract: the union of per-trigger
  * verdicts equals the one-shot recompute over every document ever
  * streamed (id-ordered arrival), each filtered-in doc verdicted
  * exactly once, filtered-out docs never verdicted — plus the
  * replayed-batch no-op, the torn-write overwrite, compaction
  * transparency, and the curation-specific index heal (exact dups'
  * postings must NOT enter a rebuilt delta). */
class StreamAdmissionSpec extends SparkTestBase {
  import spark.implicits._

  // 24 words, 12 en-stopword hits → lang 'en', quality 0.336 ≥ 0.3
  private val base = "the alpha of beta and gamma the delta of epsilon " +
    "and zeta the eta of theta and iota the kappa of lambda and mu"
  private val other = "the zebra of quartz and jungle the violin of marble " +
    "and sunset the copper of meadow and harbor the falcon of timber and prism"
  private val b1 = Seq(
    NdDoc(1L, base + " nu xi"),
    NdDoc(2L, base + " nu omicron"),          // near-dup of 1, same trigger
    NdDoc(3L, "le chat et la table le vin et la ville le pain et la mer"))
  private val b2 = Seq(
    NdDoc(11L, base + " nu xi"),              // exact dup of 1, cross-trigger
    NdDoc(12L, base + " nu pi"),              // near-dup of 1/2, cross-trigger
    NdDoc(13L, other),                        // kept
    NdDoc(14L, other))                        // exact dup of 13, same trigger
  private val b3 = Seq(
    NdDoc(21L, other),                        // exact dup of 13, cross-trigger
    NdDoc(22L, other.split(" ").take(22).mkString(" ") + " gold silver"))
  private val allDocs = b1 ++ b2 ++ b3

  /** The one-shot recompute: global filter, first-fetch-wins exact
    * rank (groupBy-min — independent of the window form), all-pairs
    * near-dup over exact-survivors with drop-the-larger-id, minstd
    * split. */
  private def oneShot: Map[Long, (String, Option[String])] = {
    val docs = allDocs.toDF("doc_id", "text")
    val filt = docs
      .withColumn("fp", TextAnalysis.fingerprintMd5(col("text")))
      .filter(TextAnalysis.langIdNative(col("text")) === "en" &&
        TextAnalysis.qualityScore(col("text")) >= 0.3)
    val keeper = filt.groupBy("fp").agg(min("doc_id").as("keeper"))
    val tagged = filt.join(keeper, Seq("fp"))
      .withColumn("is_exact", col("doc_id") =!= col("keeper"))
    val surv = tagged.filter(!col("is_exact")).select("doc_id", "text")
    val nd = Dedup.ngramJaccardPairsPpm(surv, "doc_id", "text", 3, 500000L,
        Dedup.DfCap.NoCap)
      .select("idb").distinct().as[Long].collect().toSet
    tagged.select("doc_id", "is_exact").collect().map { r =>
      val id = r.getLong(0)
      val v =
        if (r.getBoolean(1)) "exact_dup"
        else if (nd(id)) "near_dup"
        else "kept"
      val split =
        if (v == "kept")
          Some(if ((id % 2147483647L) * 48271L % 2147483647L % 10 < 8)
            "train" else "eval")
        else None
      id -> (v, split)
    }.toMap
  }

  private def verdictMap(df: DataFrame): Map[Long, (String, Option[String])] =
    df.collect().map(r => r.getLong(0) ->
      (r.getString(2), Option(r.getString(3)))).toMap

  test("union of per-trigger verdicts == one-shot recompute, exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sa").toString
    val ckpt = Files.createTempDirectory("graft_sa_ckpt").toString
    val mem = MemoryStream[NdDoc](41)
    val q = mem.toDS().writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: Dataset[NdDoc], id: Long) =>
        val _ = StreamAdmission.curateBatch(b, id, dir)
      }
      .start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      mem.addData(b3: _*); q.processAllAvailable()
    } finally q.stop()

    val streamed = StreamAdmission.allVerdicts(spark, dir)
    val rows = streamed.collect()
    assert(rows.length === rows.map(_.getLong(0)).distinct.length,
      "every doc verdicted exactly once")
    assert(verdictMap(streamed) === oneShot)
    // the fixture exercises every branch in the STREAM output
    val vm = verdictMap(streamed)
    assert(vm(2L)._1 === "near_dup", "within-trigger near-dup")
    assert(vm(12L)._1 === "near_dup", "cross-trigger near-dup")
    assert(vm(11L)._1 === "exact_dup", "cross-trigger exact (fp delta)")
    assert(vm(14L)._1 === "exact_dup", "within-trigger exact (rank)")
    assert(vm(21L)._1 === "exact_dup")
    assert(vm(22L)._1 === "near_dup")
    assert(vm(1L)._1 === "kept" && vm(13L)._1 === "kept")
    assert(!vm.contains(3L), "filtered-out docs get no verdict")
  }

  test("autoCompactEvery fires compaction of BOTH layers automatically " +
      "mid-stream; verdicts stay identical to the one-shot recompute") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dir = Files.createTempDirectory("graft_sa_auto").toString
    val ckpt = Files.createTempDirectory("graft_sa_auto_ckpt").toString
    val mem = MemoryStream[NdDoc](43)
    def drain(): Unit = {
      val q = StreamAdmission.verdictsStream(mem.toDS(), dir, ckpt, 3,
        500000L, Dedup.DfCap.NoCap, autoCompactEvery = 2)
      try { val _ = q.awaitTermination(120000) } finally q.stop()
    }
    mem.addData(b1: _*); drain()
    mem.addData(b2: _*); drain()
    mem.addData(b3: _*); drain()
    // fired inside batch 1's trigger, on both layers
    assert(StreamIndex.layerSnapshot(dir, "index") === Some(1L))
    assert(StreamIndex.layerSnapshot(dir, "fps") === Some(1L))
    val streamed = StreamAdmission.allVerdicts(spark, dir)
    val rows = streamed.collect()
    assert(rows.length === rows.map(_.getLong(0)).distinct.length)
    assert(verdictMap(streamed) === oneShot)
  }

  test("adaptive caps are rejected; Fixed is accepted") {
    val dir = Files.createTempDirectory("graft_sa_cap").toString
    val e = intercept[IllegalArgumentException] {
      StreamAdmission.curateBatch(b1.toDS(), 0L, dir,
        dfCap = Dedup.DfCap.AdaptiveAvg(2))
    }
    assert(e.getMessage.contains("arrival"))
    assert(StreamAdmission.curateBatch(b1.toDS(), 0L, dir,
      dfCap = Dedup.DfCap.Fixed(100)))
  }

  test("a replayed batch id is a committed no-op") {
    val dir = Files.createTempDirectory("graft_sa_replay").toString
    assert(StreamAdmission.curateBatch(b1.toDS(), 0L, dir))
    assert(StreamAdmission.curateBatch(b2.toDS(), 1L, dir))
    val before = verdictMap(StreamAdmission.allVerdicts(spark, dir))
    assert(!StreamAdmission.curateBatch(b2.toDS(), 1L, dir))
    assert(verdictMap(StreamAdmission.allVerdicts(spark, dir)) === before)
  }

  test("torn verdict write without a corpus commit is recomputed") {
    val dir = Files.createTempDirectory("graft_sa_torn").toString
    assert(StreamAdmission.curateBatch(b1.toDS(), 0L, dir))
    Seq((999L, 0.5, "kept", "train"))
      .toDF("doc_id", "quality", "verdict", "split")
      .write.parquet(s"$dir/verdicts/b=1")
    assert(StreamAdmission.curateBatch(b2.toDS(), 1L, dir))
    val vm = verdictMap(StreamAdmission.allVerdicts(spark, dir))
    assert(!vm.contains(999L), "torn write must be overwritten")
    assert(vm(11L)._1 === "exact_dup")
  }

  test("compaction mid-stream leaves later verdicts and the union intact") {
    val dir = Files.createTempDirectory("graft_sa_compact").toString
    assert(StreamAdmission.curateBatch(b1.toDS(), 0L, dir))
    assert(StreamAdmission.curateBatch(b2.toDS(), 1L, dir))
    val fpsBefore = StreamAdmission.fpView(spark, dir)
      .collect().map(_.getString(0)).toSet
    assert(StreamAdmission.compactIndex(spark, dir) === Some(1L))
    // the maintenance pass compacts the fp layer too; a sweep pass
    // (deferred cleanup) then removes the covered fp deltas, and the
    // probe set is unchanged through both
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/fps/c=1/_SUCCESS")))
    assert(StreamAdmission.compactIndex(spark, dir) === None)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/fps/b=0")) &&
      !java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$dir/fps/b=1")),
      "covered fp deltas must be swept by the pass after the commit")
    assert(StreamAdmission.fpView(spark, dir)
      .collect().map(_.getString(0)).toSet === fpsBefore,
      "fp compaction must be transparent to the probe set")
    assert(StreamAdmission.curateBatch(b3.toDS(), 2L, dir))
    assert(verdictMap(StreamAdmission.allVerdicts(spark, dir)) === oneShot)
    // the view (snapshot + the post-compaction delta, merged) carries
    // exact-survivor postings only
    val surv = Seq(b1(0), b1(1), b2(1), b2(2), b3(1))
    val viaView = Dedup.mergePostingDeltas(
        StreamAdmission.indexView(spark, dir))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val rebuilt = Dedup.postingIndex(
        surv.toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(viaView === rebuilt)
  }

  test("under a BINDING DfCap.Fixed the verdicts equal the " +
      "as-of-arrival capped recompute — early admissions stand, a " +
      "late arrival whose shared shingles crossed the cap is KEPT " +
      "(the cap's contract: dfs only grow, emissions never retract)") {
    val cap = Dedup.DfCap.Fixed(4)
    // five base-family survivors by trigger 3: docs 1/2 (t1), 11/12
    // (t2) arrive while the shared base-shingle dfs are ≤ 4 — their
    // near-dup pairs stand; doc 21 (t3) arrives at df 5, every base
    // co-shingle capped away, so it is KEPT under the cap although
    // the NoCap recompute calls it a near-dup (the drift guard below)
    val c1 = Seq(NdDoc(1L, base + " nu xi"), NdDoc(2L, base + " nu omicron"))
    val c2 = Seq(NdDoc(11L, base + " nu pi"), NdDoc(12L, base + " nu rho"))
    val c3 = Seq(NdDoc(21L, base + " nu sigma"))
    val capBatches = Seq(c1, c2, c3)
    val dir = Files.createTempDirectory("graft_sa_bindcap").toString
    capBatches.zipWithIndex.foreach { case (b, i) =>
      assert(StreamAdmission.curateBatch(b.toDS(), i.toLong, dir,
        3, 500000L, cap))
    }
    // independent AS-OF-ARRIVAL restatement through the FULL pair
    // listing (a different code path from the stream's delta-merge
    // incremental): per batch k, dfs and the cap are stated over the
    // survivors up to and including k, and a doc is near_dup iff it is
    // the LARGER side of a capped qualifying pair (batch ids top the
    // domain, so every pair touching the batch orients onto it)
    var survSoFar = Seq.empty[NdDoc]
    var fpsSeen = Set.empty[String]
    val expected = scala.collection.mutable.Map
      .empty[Long, (String, Option[String])]
    capBatches.foreach { b =>
      val filt = b.toDF("doc_id", "text")
        .withColumn("fp", TextAnalysis.fingerprintMd5(col("text")))
        .filter(TextAnalysis.langIdNative(col("text")) === "en" &&
          TextAnalysis.qualityScore(col("text")) >= 0.3)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(filt.length === b.length, "fixture drift: a doc was filtered")
      val keeper = filt.groupBy(_._3).map { case (_, ds) =>
        ds.map(_._1).min }.toSet
      val exact = filt.filter(r => fpsSeen(r._3) || !keeper(r._1))
        .map(_._1).toSet
      val survB = filt.filter(r => !exact(r._1))
        .map(r => NdDoc(r._1, r._2)).toSeq
      val batchIds = survB.map(_.doc_id).toSet
      import spark.implicits._
      val nd = Dedup.ngramJaccardPairsPpm(
          (survSoFar ++ survB).toDF("doc_id", "text"),
          "doc_id", "text", 3, 500000L, cap)
        .select("idb").as[Long].collect().toSet
        .intersect(batchIds)
      filt.foreach { r =>
        val id = r._1
        val v =
          if (exact(id)) "exact_dup"
          else if (nd(id)) "near_dup"
          else "kept"
        val split =
          if (v == "kept")
            Some(if ((id % 2147483647L) * 48271L % 2147483647L % 10 < 8)
              "train" else "eval")
          else None
        expected(id) = (v, split)
      }
      fpsSeen ++= filt.map(_._3)
      survSoFar ++= survB
    }
    val vm = verdictMap(StreamAdmission.allVerdicts(spark, dir))
    assert(vm === expected.toMap,
      "streamed verdicts must equal the as-of-arrival capped recompute")
    // the cap actually BOUND, in both directions: early near-dups
    // stand (emitted while df ≤ cap)…
    assert(vm(11L)._1 === "near_dup" && vm(12L)._1 === "near_dup")
    // …and the late arrival was capped into a keep — where the NoCap
    // one-shot calls it a near-dup (fixture-drift guard: if this
    // fails, Fixed(4) no longer binds — lower the cap)
    assert(vm(21L)._1 === "kept")
    import spark.implicits._
    val noCapNd = Dedup.ngramJaccardPairsPpm(
        (c1 ++ c2 ++ c3).toDF("doc_id", "text"),
        "doc_id", "text", 3, 500000L, Dedup.DfCap.NoCap)
      .select("idb").as[Long].collect().toSet
    assert(noCapNd.contains(21L),
      "fixture drift: doc 21 must be a NoCap near-dup for the cap row " +
        "to prove anything")
  }

  test("a missing index delta is healed by replaying exact dedup, " +
      "not by re-shingling every doc") {
    val dir = Files.createTempDirectory("graft_sa_heal").toString
    assert(StreamAdmission.curateBatch(b1.toDS(), 0L, dir))
    assert(StreamAdmission.curateBatch(b2.toDS(), 1L, dir))
    // simulate a pre-index deployment: batch 1's index delta vanishes
    StreamIndex.deleteTree(s"$dir/index/b=1")
    // ...and its fps delta too (the heal must rebuild fps first)
    StreamIndex.deleteTree(s"$dir/fps/b=1")
    assert(StreamAdmission.curateBatch(b3.toDS(), 2L, dir))
    assert(verdictMap(StreamAdmission.allVerdicts(spark, dir)) === oneShot)
    // the healed delta must hold batch 1's exact-SURVIVORS only — doc
    // 11 (exact dup of doc 1) and doc 14 (exact dup of 13) must not
    // have re-entered the index
    val healed = spark.read.parquet(s"$dir/index/b=1")
      .select(explode(col("_lst")).as("p"))
      .select(org.apache.spark.sql.functions
        .shiftright(col("p"), Dedup.SizeBits).as("doc_id"))
      .distinct().as[Long].collect().toSet
    assert(healed === Set(12L, 13L), s"healed delta ids: $healed")
  }
}
