package graft.streaming

import graft.{DurableArtifact, ExtensionQueries, SparkTestBase}
import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}

/** Pins the stream-bootstrap contract (the adoption path for a
  * deployment with an existing curated corpus): seeding the
  * index/cmap/fps snapshot layers from durable snapshot artifacts and
  * then streaming is INDISTINGUISHABLE from having streamed the whole
  * corpus from scratch — same cluster view, same canonical postings,
  * same corpus view, same post-seed pair emissions, same admission
  * verdicts — while costing an artifact copy instead of the full
  * corpus re-pairing. Plus the layout rules: the seed commits through
  * the corpus `_SUCCESS` (a torn seed is invisible and re-runs), live
  * or compacted dirs refuse re-seeding, the table-reading convenience
  * goes through the commit-safe reads (epoch filter, patch-aware
  * cluster read), and the first maintenance pass retires the seed
  * layers under the normal deferred-cleanup rules. */
class StreamBootstrapSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
  private val tail2 = "shared tail one two three four five six seven eight"
  // the existing curated corpus (what the nightly snapshot job covers):
  // two near-dup families
  private val corpusDocs = Seq(
    NdDoc(1L, base + " lambda mu"),
    NdDoc(2L, base + " lambda nu"),
    NdDoc(3L, tail2 + " nine"),
    NdDoc(4L, tail2 + " ten"),
    NdDoc(11L, base + " lambda"))
  // the day's live batch: the chain doc 23 merges BOTH corpus families
  // — the fold against the seeded map must RELABEL seeded rows, not
  // just append
  private val liveDocs = Seq(
    NdDoc(21L, base + " lambda xi"),
    NdDoc(22L, tail2 + " eleven"),
    NdDoc(23L, base + " lambda mu " + tail2 + " nine"))
  private val ppm = 300000L
  private val ndParams = StreamParams.neardup(3, ppm, Dedup.DfCap.NoCap)

  private def mapRows(dir: String): Set[(Long, Long)] =
    StreamClusters.clusterView(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def ccRows(docs: Seq[NdDoc]): Set[(Long, Long)] =
    Dedup.connectedComponents(Dedup.ngramJaccardPairsPpm(
        docs.toDF("doc_id", "text"), "doc_id", "text", 3, ppm,
        Dedup.DfCap.NoCap))
      .select(col("node"), col("cluster_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** The durable snapshot artifacts a nightly job would hold, built
    * with the stream's own parameters (the seeding contract). */
  private def seedFrames: (DataFrame, DataFrame, DataFrame) = {
    val corpus = corpusDocs.toDF("doc_id", "text")
    val index = Dedup.postingIndex(corpus, "doc_id", "text", 3)
    val cmap = Dedup.connectedComponents(Dedup.ngramJaccardPairsPpm(
        corpus, "doc_id", "text", 3, ppm, Dedup.DfCap.NoCap))
      .select(col("node").as("doc_id"), col("cluster_id"))
    (corpus, index, cmap)
  }

  test("seeded stream ≡ streamed-from-scratch: cluster view, canonical " +
      "postings, corpus view, and post-seed pair emissions all match") {
    val scratch = Files.createTempDirectory("graft_sb_scratch").toString
    val seeded = Files.createTempDirectory("graft_sb_seeded").toString
    // from scratch: the whole corpus replays as trigger 0 — its
    // batch-internal pairing IS the full corpus pair listing, the cost
    // the seed exists to avoid — then the live batch as trigger 1
    assert(StreamNearDup.pairBatch(corpusDocs.toDS(), 0L, scratch, 3, ppm))
    StreamClusters.foldCommitted(spark, scratch)
    assert(StreamNearDup.pairBatch(liveDocs.toDS(), 1L, scratch, 3, ppm))
    StreamClusters.foldCommitted(spark, scratch)
    // seeded: three artifact copies, then ONLY the live trigger
    val (corpus, index, cmap) = seedFrames
    StreamBootstrap.seedNearDup(seeded, corpus, index, Some(cmap), ndParams)
    assert(StreamNearDup.pairBatch(liveDocs.toDS(), 0L, seeded, 3, ppm))
    StreamClusters.foldCommitted(spark, seeded)

    val want = ccRows(corpusDocs ++ liveDocs)
    assert(mapRows(seeded) === want)
    assert(mapRows(scratch) === want)
    // the live fold RELABELED seeded rows: doc 3's label is the union
    // component's min (doc 1), not its seeded family label (3)
    assert(want.contains((3L, 1L)))

    // the index views merge to identical canonical postings
    def postings(dir: String) = Dedup.mergePostingDeltas(
        StreamNearDup.indexView(spark, dir, 3))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    assert(postings(seeded) === postings(scratch))
    // the corpus views agree doc for doc
    def docsOf(dir: String) = StreamNearDup.corpusView(spark, dir)
      .collect().map(d => (d.doc_id, d.text)).toSet
    assert(docsOf(seeded) === docsOf(scratch))
    // post-seed emissions = exactly the scratch run's live-trigger
    // pairs — the corpus-internal pairs live in the seeded MAP, never
    // re-emitted (that re-pairing is the cost being skipped)
    val seededPairs = StreamNearDup.allPairs(spark, seeded)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val scratchLive = spark.read.parquet(s"$scratch/pairs/b=1")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(seededPairs === scratchLive)
  }

  test("maintenance passes cover, then retire, the seed layers — " +
      "deferred exactly one pass, content-transparent throughout") {
    val dir = Files.createTempDirectory("graft_sb_maint").toString
    val (corpus, index, cmap) = seedFrames
    StreamBootstrap.seedNearDup(dir, corpus, index, Some(cmap), ndParams)
    assert(StreamNearDup.pairBatch(liveDocs.toDS(), 0L, dir, 3, ppm))
    StreamClusters.foldCommitted(spark, dir)
    val want = ccRows(corpusDocs ++ liveDocs)
    assert(mapRows(dir) === want)

    // cluster layer: the first pass builds c=0 and KEEPS the seed
    // snapshot (a reader planned against it keeps its files)…
    assert(StreamClusters.compactClusters(spark, dir) === Some(0L))
    assert(Files.exists(Paths.get(s"$dir/cmap/c=-1")))
    assert(mapRows(dir) === want)
    // …and the next (no-op) pass retires it
    assert(StreamClusters.compactClusters(spark, dir) === None)
    assert(!Files.exists(Paths.get(s"$dir/cmap/c=-1")))
    assert(mapRows(dir) === want)

    // index layer: same rules
    def postings() = Dedup.mergePostingDeltas(
        StreamNearDup.indexView(spark, dir, 3))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    val before = postings()
    assert(StreamNearDup.compactIndex(spark, dir, 3) === Some(0L))
    assert(Files.exists(Paths.get(s"$dir/index/c=-1")))
    assert(postings() === before)
    assert(StreamNearDup.compactIndex(spark, dir, 3) === None)
    assert(!Files.exists(Paths.get(s"$dir/index/c=-1")))
    assert(postings() === before)
  }

  test("a torn seed (no corpus commit) is invisible and re-runs " +
      "cleanly; a completed seed, a live dir, and a compacted dir all " +
      "refuse re-seeding") {
    val dir = Files.createTempDirectory("graft_sb_torn").toString
    val (corpus, index, cmap) = seedFrames
    // torn seed: the index snapshot landed (with its OWN dir-level
    // _SUCCESS), the corpus commit did not
    index.write.parquet(s"$dir/index/c=${StreamBootstrap.SeedBatch}")
    assert(StreamNearDup.corpusView(spark, dir).isEmpty,
      "a torn seed must be invisible through the committed views")
    // …including the INDEX view: serving the torn snapshot would pair
    // triggers against postings of documents the corpus never
    // committed (ghost pairs) — the seed commits through the corpus
    // marker or not at all
    assert(StreamNearDup.indexView(spark, dir, 3).isEmpty,
      "a torn seed's layer snapshot must not serve")
    // a from-scratch stream started on the torn dir under DIFFERENT
    // parameters must not probe the n=3 batch against the torn layers
    // (establish redefines the marker freely — nothing is committed —
    // and the snapshot gate above keeps the stale layers out)
    val scratch0 = Files.createTempDirectory("graft_sb_torn2").toString
    Dedup.postingIndex(corpus, "doc_id", "text", 4)
      .write.parquet(s"$scratch0/index/c=${StreamBootstrap.SeedBatch}")
    StreamParams.establish(scratch0,
      StreamParams.neardup(4, ppm, Dedup.DfCap.NoCap))
    assert(StreamNearDup.pairBatch(liveDocs.toDS(), 0L, scratch0, 3, ppm))
    val p0 = StreamNearDup.allPairs(spark, scratch0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(p0.forall { case (a, b) => a >= 21L && b >= 21L },
      s"ghost pairs against the torn n=4 snapshot: $p0")
    // the re-run overwrites the torn layers and completes
    StreamBootstrap.seedNearDup(dir, corpus, index, Some(cmap), ndParams)
    assert(mapRows(dir) === ccRows(corpusDocs))
    // a completed seed refuses a second one
    val ex1 = intercept[IllegalArgumentException] {
      StreamBootstrap.seedNearDup(dir, corpus, index, Some(cmap), ndParams)
    }
    assert(ex1.getMessage.contains("committed stream batches"))
    // a dir with real stream history refuses too
    val live = Files.createTempDirectory("graft_sb_live").toString
    assert(StreamNearDup.pairBatch(corpusDocs.toDS(), 0L, live, 3, ppm))
    val ex2 = intercept[IllegalArgumentException] {
      StreamBootstrap.seedNearDup(live, corpus, index, Some(cmap), ndParams)
    }
    assert(ex2.getMessage.contains("committed stream batches"))
  }

  test("a torn seed's OTHER-layer snapshot never survives a re-seed " +
      "that omits that layer (stale cmap against a new corpus)") {
    val dir = Files.createTempDirectory("graft_sb_cross").toString
    val (corpus, index, cmap) = seedFrames
    // torn seedNearDup-with-cmap: the cmap snapshot committed, the
    // corpus never did
    cmap.write.parquet(s"$dir/cmap/c=${StreamBootstrap.SeedBatch}")
    // the operator re-runs as an ST8-ONLY seed — the stale cluster
    // labels must be swept, not silently served against this corpus
    StreamBootstrap.seedNearDup(dir, corpus, index, cmap = None, ndParams)
    assert(!Files.exists(
      Paths.get(s"$dir/cmap/c=${StreamBootstrap.SeedBatch}")),
      "the stale cmap seed snapshot must be swept by the re-seed")
    // …so the cluster layer gives the ST8-only refusal, never cmapA
    val ex = intercept[IllegalArgumentException] {
      StreamClusters.clusterView(spark, dir)
    }
    assert(ex.getMessage.contains("cluster-map artifact"))
  }

  test("a dir seeded WITHOUT a cluster map serves ST8 but refuses the " +
      "cluster layer loudly (the seed never emitted the corpus-internal " +
      "pairs, so the clusters are unrecoverable there)") {
    val dir = Files.createTempDirectory("graft_sb_nocmap").toString
    val (corpus, index, _) = seedFrames
    StreamBootstrap.seedNearDup(dir, corpus, index, cmap = None, ndParams)
    // ST8 works: the live batch pairs against the seeded index
    assert(StreamNearDup.pairBatch(liveDocs.toDS(), 0L, dir, 3, ppm))
    val pairs = StreamNearDup.allPairs(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.exists { case (a, b) => a <= 11L && b >= 21L },
      "cross-corpus pairs must flow from the seeded index")
    // …but the cluster layer refuses with the fix, not a path error
    val ex = intercept[IllegalArgumentException] {
      StreamClusters.clusterView(spark, dir)
    }
    assert(ex.getMessage.contains("cluster-map artifact"))
  }

  test("ST9: seeding fps + survivor index from the curation artifacts " +
      "gives the live batch exactly the from-scratch verdicts") {
    // StreamAdmission's quality/lang-passing fixture style
    val en = "the alpha of beta and gamma the delta of epsilon " +
      "and zeta the eta of theta and iota the kappa of lambda and mu"
    val other = "the zebra of quartz and jungle the violin of marble " +
      "and sunset the copper of meadow and harbor the falcon of timber " +
      "and prism"
    val aDocs = Seq(
      NdDoc(1L, en + " nu xi"),
      NdDoc(2L, en + " nu omicron"),
      NdDoc(11L, en + " nu xi"), // exact dup of 1, inside the corpus
      NdDoc(13L, other))
    val bDocs = Seq(
      NdDoc(21L, en + " nu xi"),                 // exact dup of survivor 1
      NdDoc(22L, en + " nu pi"),                 // near-dup of survivors
      NdDoc(23L, "the ocean of granite and willow the trumpet of amber " +
        "and moonrise the silver of canyon and breeze the raven of " +
        "cedar and gold"))                     // fresh keeper

    // from scratch: the corpus curates as trigger 0, the batch as 1
    val scratch = Files.createTempDirectory("graft_sb_adm_s").toString
    assert(StreamAdmission.curateBatch(aDocs.toDS(), 0L, scratch))
    assert(StreamAdmission.curateBatch(bDocs.toDS(), 1L, scratch))
    def verdicts(dir: String, ids: Set[Long]) =
      StreamAdmission.allVerdicts(spark, dir)
        .collect().filter(r => ids(r.getLong(0)))
        .map(r => (r.getLong(0), r.getString(2), Option(r.getString(3))))
        .toSet
    val wantB = verdicts(scratch, bDocs.map(_.doc_id).toSet)
    assert(wantB.map(_._2) === Set("exact_dup", "near_dup", "kept"),
      "fixture drift: the live batch should exercise all three verdicts")

    // seeded: the curation artifacts — admitted-corpus docs, their
    // fingerprint set, the EXACT-SURVIVOR posting index (ST9's rule:
    // exact dups' postings never enter the index)
    val filt = aDocs.toDF("doc_id", "text")
      .withColumn("fp", TextAnalysis.fingerprintMd5(col("text")))
      .filter(TextAnalysis.langIdNative(col("text")) === "en" &&
        TextAnalysis.qualityScore(col("text")) >= 0.3)
    val keeper = filt.groupBy("fp").agg(min("doc_id").as("keeper"))
    val surv = filt.join(keeper, Seq("fp"))
      .filter(col("doc_id") === col("keeper")).select("doc_id", "text")
    val seeded = Files.createTempDirectory("graft_sb_adm_b").toString
    StreamBootstrap.seedAdmission(seeded,
      filt.select("doc_id", "text"),
      Dedup.postingIndex(surv, "doc_id", "text", 3),
      filt.select("fp").distinct(),
      StreamParams.admission(3, 500000L, Dedup.DfCap.NoCap))
    assert(StreamAdmission.curateBatch(bDocs.toDS(), 0L, seeded))
    assert(verdicts(seeded, bDocs.map(_.doc_id).toSet) === wantB)

    // the TABLE convenience: both artifacts through the epoch filter —
    // a torn fp append (rows above the committed epoch) must not seed
    val ti = "g_sb_adm_idx_tbl"; val tf = "g_sb_adm_fp_tbl"
    Seq(ti, tf).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val fe = graft.DurableArtifact.FoldEpochCol
    Dedup.postingIndex(surv, "doc_id", "text", 3).withColumn(fe, lit(0))
      .write.bucketBy(8, "_sh").sortBy("_sh")
      .format("parquet").saveAsTable(ti)
    filt.select("fp").distinct().withColumn(fe, lit(0))
      .write.bucketBy(8, "fp").sortBy("fp")
      .format("parquet").saveAsTable(tf)
    // the torn row: the EXACT fingerprint of batch doc 23 — if the
    // epoch filter leaked it into the seed, 23 would flip kept→exact
    spark.range(1)
      .select(TextAnalysis.fingerprintMd5(lit(bDocs(2).text)).as("fp"),
        lit(1).as(fe))
      .write.mode("append").bucketBy(8, "fp").sortBy("fp")
      .format("parquet").saveAsTable(tf)
    val seeded2 = Files.createTempDirectory("graft_sb_adm_t").toString
    graft.ExtensionQueries.seedAdmissionFromTables(spark, seeded2,
      filt.select("doc_id", "text"), ti, tf)
    assert(StreamAdmission.curateBatch(bDocs.toDS(), 0L, seeded2))
    assert(verdicts(seeded2, bDocs.map(_.doc_id).toSet) === wantB,
      "the torn fp row must not reach the seeded set")
    Seq(ti, tf).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  /** Write the three durable tables a nightly job holds, epoch layout. */
  private def writeSeedTables(tc: String, ti: String, tm: String): Unit = {
    Seq(tc, ti, tm).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val (corpus, index, cmap) = seedFrames
    val fe = DurableArtifact.FoldEpochCol
    corpus.withColumn(fe, lit(0)).write.bucketBy(8, "doc_id")
      .sortBy("doc_id").format("parquet").saveAsTable(tc)
    index.withColumn(fe, lit(0)).write.bucketBy(8, "_sh").sortBy("_sh")
      .format("parquet").saveAsTable(ti)
    cmap.withColumn(fe, lit(0)).write.bucketBy(8, "doc_id")
      .sortBy("doc_id").format("parquet").saveAsTable(tm)
  }

  test("BY-REF seed (pointer layers) ≡ physical seed ≡ from-scratch: " +
      "cluster view, postings, corpus view, and pair emissions match; " +
      "the first compactions materialize the stream's own snapshots " +
      "and the deferred sweep retires the pointers") {
    val tc = "g_sb_ref_corpus"; val ti = "g_sb_ref_index"
    val tm = "g_sb_ref_cmap"
    writeSeedTables(tc, ti, tm)
    val dir = Files.createTempDirectory("graft_sb_ref").toString
    ExtensionQueries.seedStreamFromTablesByRef(spark, dir, tc, ti,
      Some(tm), n = 3, thresholdPpm = ppm)
    // the seed wrote ONLY pointer markers — no data files
    assert(Files.exists(
      Paths.get(s"$dir/index/c=${StreamBootstrap.SeedBatch}/_POINTER")))
    val ls = Files.list(
      Paths.get(s"$dir/corpus/b=${StreamBootstrap.SeedBatch}"))
    try assert(ls.count() === 2L,
      "a pointer dir holds exactly _POINTER + _SUCCESS")
    finally ls.close()

    // the live trigger pairs against the referenced index and folds
    // into the referenced map — identical to the physical-seed run
    assert(StreamNearDup.pairBatch(liveDocs.toDS(), 0L, dir, 3, ppm))
    StreamClusters.foldCommitted(spark, dir)
    val want = ccRows(corpusDocs ++ liveDocs)
    assert(mapRows(dir) === want)
    def postings(d0: String) = Dedup.mergePostingDeltas(
        StreamNearDup.indexView(spark, d0, 3))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap
    assert(postings(dir) === Dedup.postingIndex(
        (corpusDocs ++ liveDocs).toDF("doc_id", "text"), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1).toSet)).toMap)
    assert(StreamNearDup.corpusView(spark, dir)
      .collect().map(d => (d.doc_id, d.text)).toSet
      === (corpusDocs ++ liveDocs).map(d => (d.doc_id, d.text)).toSet)

    // compaction materializes the stream's OWN snapshots; the next
    // (no-op) pass retires the pointer dirs — after it the stream no
    // longer references the index/cmap tables at all
    assert(StreamClusters.compactClusters(spark, dir) === Some(0L))
    assert(StreamNearDup.compactIndex(spark, dir, 3) === Some(0L))
    assert(Files.exists(Paths.get(s"$dir/cmap/c=-1")) &&
      Files.exists(Paths.get(s"$dir/index/c=-1")),
      "pointers survive the covering pass (deferred cleanup)")
    assert(StreamClusters.compactClusters(spark, dir) === None)
    assert(StreamNearDup.compactIndex(spark, dir, 3) === None)
    assert(!Files.exists(Paths.get(s"$dir/cmap/c=-1")) &&
      !Files.exists(Paths.get(s"$dir/index/c=-1")),
      "the sweep pass must retire the pointer dirs")
    // content is unchanged, and dropping the RETIRED tables is safe
    // (the corpus pointer has no compaction to retire it — so the
    // corpus table must stay, or be materialized first)
    Seq(ti, tm).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    assert(mapRows(dir) === want)
    assert(postings(dir).nonEmpty)

    // materializePointer is the corpus pointer's escape hatch: the
    // in-place rewrite (files beside the markers, _POINTER delete as
    // the flip) unties the stream from the corpus table's lifetime
    val docsBefore = StreamNearDup.corpusView(spark, dir)
      .collect().map(d => (d.doc_id, d.text)).toSet
    StreamIndex.materializePointer(spark,
      s"$dir/corpus/b=${StreamBootstrap.SeedBatch}")
    // idempotent: a second call is a no-op on the now-ordinary dir
    StreamIndex.materializePointer(spark,
      s"$dir/corpus/b=${StreamBootstrap.SeedBatch}")
    assert(!Files.exists(Paths.get(
      s"$dir/corpus/b=${StreamBootstrap.SeedBatch}/_POINTER")))
    spark.sql(s"DROP TABLE IF EXISTS $tc")
    assert(StreamNearDup.corpusView(spark, dir)
      .collect().map(d => (d.doc_id, d.text)).toSet === docsBefore,
      "the materialized corpus must serve after the table is gone")
    assert(mapRows(dir) === want)
  }

  test("a by-ref pointer is FENCED on the table's fold state: folding " +
      "the source table after seeding fails stream reads loudly " +
      "instead of composing rows the stream never paired against") {
    val tc = "g_sb_fence_corpus"; val ti = "g_sb_fence_index"
    val tm = "g_sb_fence_cmap"
    writeSeedTables(tc, ti, tm)
    val dir = Files.createTempDirectory("graft_sb_fence").toString
    ExtensionQueries.seedStreamFromTablesByRef(spark, dir, tc, ti,
      Some(tm), n = 3, thresholdPpm = ppm)
    assert(StreamNearDup.pairBatch(liveDocs.toDS(), 0L, dir, 3, ppm))
    StreamClusters.foldCommitted(spark, dir)
    val before = mapRows(dir)
    // the nightly job folds a batch into the INDEX table (simulated by
    // its visibility flip — the folds counter bump)
    spark.sql(s"ALTER TABLE $ti SET TBLPROPERTIES " +
      s"('${DurableArtifact.FoldsProp}' = '1')")
    val ex = intercept[IllegalStateException] {
      StreamNearDup.pairBatch(
        Seq(NdDoc(31L, "fresh words here")).toDS(), 1L, dir, 3, ppm)
    }
    assert(ex.getMessage.contains("STALE") &&
      ex.getMessage.contains("compact the stream") &&
      ex.getMessage.contains("materializePointer"),
      s"the fence must name the fixes: ${ex.getMessage}")
    // cmap reads fence too
    spark.sql(s"ALTER TABLE $ti SET TBLPROPERTIES " +
      s"('${DurableArtifact.FoldsProp}' = '0')")
    spark.sql(s"ALTER TABLE $tm SET TBLPROPERTIES " +
      s"('${DurableArtifact.FoldsProp}' = '1')")
    val ex2 = intercept[IllegalStateException] {
      StreamClusters.clusterView(spark, dir)
    }
    assert(ex2.getMessage.contains("STALE"))
    // restoring the recorded state un-wedges the stream (the fence is
    // a freeze check, not a lock)
    spark.sql(s"ALTER TABLE $tm SET TBLPROPERTIES " +
      s"('${DurableArtifact.FoldsProp}' = '0')")
    assert(mapRows(dir) === before)
    // and a DROPPED table gives the lifecycle message
    spark.sql(s"DROP TABLE IF EXISTS $ti")
    val ex3 = intercept[IllegalStateException] {
      StreamNearDup.pairBatch(
        Seq(NdDoc(31L, "fresh words here")).toDS(), 1L, dir, 3, ppm)
    }
    assert(ex3.getMessage.contains("no longer exists"))
    Seq(tc, tm).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("ST9 by-ref: pointer-seeded admission gives the live batch " +
      "exactly the from-scratch verdicts") {
    val en = "the alpha of beta and gamma the delta of epsilon " +
      "and zeta the eta of theta and iota the kappa of lambda and mu"
    val aDocs = Seq(
      NdDoc(1L, en + " nu xi"),
      NdDoc(2L, en + " nu omicron"),
      NdDoc(11L, en + " nu xi"))
    val bDocs = Seq(
      NdDoc(21L, en + " nu xi"),
      NdDoc(22L, en + " nu pi"),
      NdDoc(23L, "the ocean of granite and willow the trumpet of amber " +
        "and moonrise the silver of canyon and breeze the raven of " +
        "cedar and gold"))
    val scratch = Files.createTempDirectory("graft_sb_ref_adm_s").toString
    assert(StreamAdmission.curateBatch(aDocs.toDS(), 0L, scratch))
    assert(StreamAdmission.curateBatch(bDocs.toDS(), 1L, scratch))
    def verdicts(dir: String, ids: Set[Long]) =
      StreamAdmission.allVerdicts(spark, dir)
        .collect().filter(r => ids(r.getLong(0)))
        .map(r => (r.getLong(0), r.getString(2), Option(r.getString(3))))
        .toSet
    val wantB = verdicts(scratch, bDocs.map(_.doc_id).toSet)

    val filt = aDocs.toDF("doc_id", "text")
      .withColumn("fp", TextAnalysis.fingerprintMd5(col("text")))
      .filter(TextAnalysis.langIdNative(col("text")) === "en" &&
        TextAnalysis.qualityScore(col("text")) >= 0.3)
    val keeper = filt.groupBy("fp").agg(min("doc_id").as("keeper"))
    val surv = filt.join(keeper, Seq("fp"))
      .filter(col("doc_id") === col("keeper")).select("doc_id", "text")
    val tc = "g_sb_ref_adm_corpus"; val ti = "g_sb_ref_adm_index"
    val tf = "g_sb_ref_adm_fps"
    Seq(tc, ti, tf).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val fe = DurableArtifact.FoldEpochCol
    filt.select("doc_id", "text").withColumn(fe, lit(0))
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(tc)
    Dedup.postingIndex(surv, "doc_id", "text", 3).withColumn(fe, lit(0))
      .write.bucketBy(8, "_sh").sortBy("_sh")
      .format("parquet").saveAsTable(ti)
    filt.select("fp").distinct().withColumn(fe, lit(0))
      .write.bucketBy(8, "fp").sortBy("fp")
      .format("parquet").saveAsTable(tf)
    val seeded = Files.createTempDirectory("graft_sb_ref_adm_b").toString
    ExtensionQueries.seedAdmissionFromTablesByRef(spark, seeded,
      tc, ti, tf)
    assert(StreamAdmission.curateBatch(bDocs.toDS(), 0L, seeded))
    assert(verdicts(seeded, bDocs.map(_.doc_id).toSet) === wantB)

    // heal hygiene on the seeded dir: lose the day's index delta, then
    // run another batch — healIndex must read the strictly-earlier fps
    // through the SNAPSHOT layer (here: the pointer), never rebuild a
    // redundant corpus-scale fps/b=-1 by fingerprinting the whole
    // corpus table
    StreamIndex.deleteTree(s"$seeded/index/b=0")
    val cDocs = Seq(NdDoc(31L, en + " nu tau"))
    assert(StreamAdmission.curateBatch(cDocs.toDS(), 1L, seeded))
    assert(!Files.exists(Paths.get(
      s"$seeded/fps/b=${StreamBootstrap.SeedBatch}")),
      "the heal must not materialize a corpus-scale fps delta")
    val v31 = StreamAdmission.allVerdicts(spark, seeded)
      .filter(col("doc_id") === 31L).collect()
    assert(v31.length === 1 && v31.head.getString(2) === "near_dup",
      "the healed index must still catch the near-dup")
    Seq(tc, ti, tf).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("seedStreamFromTables seeds through the COMMIT-SAFE table reads: " +
      "the epoch filter excludes a torn index append, the patch-aware " +
      "read serves the folded cluster labels") {
    val ti = "g_sb_index_tbl"; val tc = "g_sb_cmap_tbl"
    Seq(ti, tc).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    val (corpus, index, cmap) = seedFrames
    val fe = DurableArtifact.FoldEpochCol
    index.withColumn(fe, lit(0)).write.bucketBy(8, "_sh").sortBy("_sh")
      .format("parquet").saveAsTable(ti)
    // a torn append above the committed epoch: the seed must not copy it
    Seq((999999L, Seq(1L))).toDF("_sh", "_lst").withColumn(fe, lit(1))
      .write.mode("append").bucketBy(8, "_sh").sortBy("_sh")
      .format("parquet").saveAsTable(ti)
    cmap.withColumn(fe, lit(0)).write.bucketBy(8, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(tc)

    val dir = Files.createTempDirectory("graft_sb_tbl").toString
    ExtensionQueries.seedStreamFromTables(spark, dir, corpus, ti, Some(tc),
      n = 3, thresholdPpm = ppm)
    assert(spark.read.parquet(s"$dir/index/c=${StreamBootstrap.SeedBatch}")
      .filter(col("_sh") === 999999L).head(1).isEmpty,
      "the torn posting row must not reach the seeded snapshot")
    assert(StreamNearDup.pairBatch(liveDocs.toDS(), 0L, dir, 3, ppm))
    StreamClusters.foldCommitted(spark, dir)
    assert(mapRows(dir) === ccRows(corpusDocs ++ liveDocs))
    Seq(ti, tc).foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
