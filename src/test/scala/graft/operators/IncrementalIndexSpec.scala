package graft.operators

import graft.{ExtensionQueries, SparkTestBase}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** The durable posting-index story for incremental near-dup: the
  * per-shingle packed posting lists ([[Dedup.postingIndex]]) are the
  * once-per-snapshot artifact, serving ([[Dedup
  * .incrementalJaccardPairsFromIndex]]) is row-identical to the
  * from-scratch incremental listing, appending a batch keeps the index
  * rebuild-equivalent forever, and the written bucketed table serves
  * fresh sessions without a rebuild — the materialization a 100 TB
  * daily recurrence actually runs (shingle only the batch; never
  * re-shingle or re-shuffle the corpus). */
class IncrementalIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val Thresh = 500000L
  private val d = "/root/testdata/sf0.001"
  private val table = "g_posting_index_spec"

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ExtensionQueries.evictPostingIndex(spark, d)
  }
  override def afterAll(): Unit = {
    try {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.conf.unset(ExtensionQueries.PostingIndexTableConf)
    } finally super.afterAll()
  }

  private def pairSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def indexSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toSet

  test("from-index == from-scratch incremental on a corpus with both " +
      "pair kinds, and under the adaptive cap on the fixture split") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base + " lambda mu"),
      (2L, base + " lambda nu"),
      (3L, "totally different words about completely other topics here now")
    ).toDF("doc_id", "text")
    val increment = Seq(
      (101L, base + " lambda"),
      (102L, "shared tail one two three four five six seven eight nine"),
      (103L, "shared tail one two three four five six seven eight ten")
    ).toDF("doc_id", "text")
    val idx = Dedup.postingIndex(corpus, "doc_id", "text", 3)
    val viaIndex = pairSet(Dedup.incrementalJaccardPairsFromIndex(
      idx, increment, "doc_id", "text", 3, Thresh, Dedup.DfCap.NoCap))
    val scratch = pairSet(Dedup.incrementalJaccardPairsPpm(
      corpus, increment, "doc_id", "text", 3, Thresh, Dedup.DfCap.NoCap))
    assert(viaIndex === scratch)
    assert(viaIndex.nonEmpty)

    // the x32/x33 fixture split under the density-adaptive cap — the
    // cap is defined over the UNION df profile, so the from-index
    // stats arithmetic must reproduce it exactly
    val docs = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val ws = split(col("text"), " ")
    val k = expr("cast((size(split(text, ' ')) * 9 + 9) div 10 as int)")
    val inc = docs.filter(col("doc_id") % 9 === 4)
      .select((col("doc_id") + 5000000000000L).as("doc_id"),
        array_join(slice(ws, lit(1), k), " ").as("text"))
    val cap = Dedup.DfCap.AdaptiveAvg(2)
    val fixtureIdx = Dedup.postingIndex(docs, "doc_id", "text", 3)
    val viaIdx = pairSet(Dedup.incrementalJaccardPairsFromIndex(
      fixtureIdx, inc, "doc_id", "text", 3, Thresh, cap))
    assert(viaIdx === pairSet(Dedup.incrementalJaccardPairsPpm(
      docs, inc, "doc_id", "text", 3, Thresh, cap)))
    assert(viaIdx.nonEmpty)
  }

  test("from-DELTAS == from-scratch: multi-row-per-shingle delta union " +
      "under NoCap and a binding Fixed cap; adaptive rejected") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val c1 = Seq((1L, base + " lambda mu"),
      (3L, "totally different words about completely other topics here now")
    ).toDF("doc_id", "text")
    val c2 = Seq((2L, base + " lambda nu")).toDF("doc_id", "text")
    val increment = Seq(
      (101L, base + " lambda"),
      (102L, "shared tail one two three four five six seven eight nine"),
      (103L, "shared tail one two three four five six seven eight ten")
    ).toDF("doc_id", "text")
    // two per-batch deltas: the base shingles appear in BOTH, so the
    // union carries multiple rows per shingle — the live-ingest layout
    val deltas = Dedup.postingIndex(c1, "doc_id", "text", 3)
      .unionByName(Dedup.postingIndex(c2, "doc_id", "text", 3))
    val corpus = c1.unionByName(c2)
    for (cap <- Seq(Dedup.DfCap.NoCap, Dedup.DfCap.Fixed(2))) {
      val viaDeltas = pairSet(Dedup.incrementalJaccardPairsFromIndexDeltas(
        deltas, increment, "doc_id", "text", 3, Thresh, cap))
      assert(viaDeltas === pairSet(Dedup.incrementalJaccardPairsPpm(
        corpus, increment, "doc_id", "text", 3, Thresh, cap)),
        s"cap=$cap")
    }
    val noCap = pairSet(Dedup.incrementalJaccardPairsFromIndexDeltas(
      deltas, increment, "doc_id", "text", 3, Thresh, Dedup.DfCap.NoCap))
    val fixed = pairSet(Dedup.incrementalJaccardPairsFromIndexDeltas(
      deltas, increment, "doc_id", "text", 3, Thresh, Dedup.DfCap.Fixed(2)))
    assert(noCap.nonEmpty && noCap != fixed, "the Fixed cap must bind")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalJaccardPairsFromIndexDeltas(deltas, increment,
        "doc_id", "text", 3, Thresh, Dedup.DfCap.AdaptiveAvg(2))
    }
    assert(e.getMessage.contains("drift"))
  }

  test("prebuilt-batch-postings deltas entry == from-text form (the " +
      "streaming triggers' single-shingle-pass shape)") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val c1 = Seq((1L, base + " lambda mu"),
      (3L, "totally different words about completely other topics here now")
    ).toDF("doc_id", "text")
    val c2 = Seq((2L, base + " lambda nu")).toDF("doc_id", "text")
    val increment = Seq(
      (101L, base + " lambda"),
      (102L, "shared tail one two three four five six seven eight nine"),
      (103L, "shared tail one two three four five six seven eight ten")
    ).toDF("doc_id", "text")
    val deltas = Dedup.postingIndex(c1, "doc_id", "text", 3)
      .unionByName(Dedup.postingIndex(c2, "doc_id", "text", 3))
    val batchIdx = Dedup.postingIndex(increment, "doc_id", "text", 3)
    for (cap <- Seq(Dedup.DfCap.NoCap, Dedup.DfCap.Fixed(2))) {
      val pre = pairSet(Dedup.incrementalJaccardPairsFromIndexDeltasPrebuilt(
        deltas, batchIdx, Thresh, cap))
      assert(pre === pairSet(Dedup.incrementalJaccardPairsFromIndexDeltas(
        deltas, increment, "doc_id", "text", 3, Thresh, cap)), s"cap=$cap")
      assert(cap != Dedup.DfCap.NoCap || pre.nonEmpty)
    }
  }

  test("jaccardPairsPpmFromIndex == ngramJaccardPairsPpm under NoCap " +
      "(st11's single-shingle-pass artifact build)") {
    val docs = graft.Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val idx = Dedup.postingIndex(docs, "doc_id", "text", 3)
    val viaIdx = pairSet(Dedup.jaccardPairsPpmFromIndex(idx, 800000L))
    assert(viaIdx === pairSet(Dedup.ngramJaccardPairsPpm(
      docs, "doc_id", "text", 3, 800000L, Dedup.DfCap.NoCap)))
    assert(viaIdx.nonEmpty)
  }

  test("mergePostingDeltas(per-batch deltas) == postingIndex(union " +
      "corpus) — the compaction kernel") {
    val c1 = Seq((1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta words apart zeta")).toDF("doc_id", "text")
    val c2 = Seq((3L, "alpha beta gamma delta epsilon zeta theta"))
      .toDF("doc_id", "text")
    val c3 = Seq((4L, "nothing in common with anything else at all"))
      .toDF("doc_id", "text")
    val merged = Dedup.mergePostingDeltas(
      Dedup.postingIndex(c1, "doc_id", "text", 3)
        .unionByName(Dedup.postingIndex(c2, "doc_id", "text", 3))
        .unionByName(Dedup.postingIndex(c3, "doc_id", "text", 3)))
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    val rebuilt = Dedup.postingIndex(
        c1.unionByName(c2).unionByName(c3), "doc_id", "text", 3)
      .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(merged === rebuilt)
  }

  test("appendToPostingIndex == rebuild from the union corpus") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta nu")
    ).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "alpha beta gamma delta brand new words here"),
      (11L, "wholly disjoint shingles appear only in this batch doc")
    ).toDF("doc_id", "text")
    val appended = Dedup.appendToPostingIndex(
      Dedup.postingIndex(corpus, "doc_id", "text", 3),
      batch, "doc_id", "text", 3)
    val rebuilt = Dedup.postingIndex(
      corpus.unionByName(batch), "doc_id", "text", 3)
    assert(indexSet(appended) === indexSet(rebuilt))
    // merged rows exist (shared shingles), not just disjoint unions
    val idxSh = Dedup.postingIndex(corpus, "doc_id", "text", 3)
      .select("_sh").as[Long].collect().toSet
    val batchSh = Dedup.postingIndex(batch, "doc_id", "text", 3)
      .select("_sh").as[Long].collect().toSet
    assert((idxSh & batchSh).nonEmpty, "fixture must share shingles")
  }

  test("empty sides: empty index yields batch-internal pairs only; " +
      "empty batch yields none") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta nu")
    ).toDF("doc_id", "text")
    val none = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    val emptyIdx = Dedup.postingIndex(none, "doc_id", "text", 3)
    val selfOnly = pairSet(Dedup.incrementalJaccardPairsFromIndex(
      emptyIdx, docs, "doc_id", "text", 3, Thresh, Dedup.DfCap.AdaptiveAvg(2)))
    assert(selfOnly === pairSet(Dedup.ngramJaccardPairsPpm(
      docs, "doc_id", "text", 3, Thresh, Dedup.DfCap.AdaptiveAvg(2))))
    assert(selfOnly.nonEmpty)
    assert(Dedup.incrementalJaccardPairsFromIndex(
      Dedup.postingIndex(docs, "doc_id", "text", 3), none,
      "doc_id", "text", 3, Thresh, Dedup.DfCap.NoCap).count() === 0)
  }

  test("a fresh session reads the written index without rebuilding, " +
      "and the bucketed layout satisfies a _sh aggregate with no shuffle") {
    ExtensionQueries.usePostingIndex(spark, d, table)
    val buildsAfterWrite = ExtensionQueries.postingIndexBuilds.get()

    val s2 = spark.newSession()
    s2.conf.set(ExtensionQueries.PostingIndexTableConf, table)
    val back = s2.table(table)
    assert(indexSet(back) === indexSet(
      Dedup.postingIndex(graft.Tables.documents(spark, d)
        .select(col("doc_id"), col("text")), "doc_id", "text", 3)))
    assert(ExtensionQueries.postingIndexBuilds.get() === buildsAfterWrite,
      "read-back must not rebuild the index")

    val meta = s2.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    assert(meta.bucketSpec.exists(b =>
      b.numBuckets == 8 && b.bucketColumnNames == Seq("_sh")))

    // the artifact's point: shingle-keyed consumers (the serve join,
    // the append merge) start hash-partitioned — no index-side shuffle
    val agg = spark.table(table).groupBy("_sh")
      .agg(sum(size(col("_lst"))).as("df"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    assert(plan.collect { case e: ShuffleExchangeLike => e }.isEmpty,
      s"bucketed scan should satisfy the _sh aggregate: $plan")
  }

  test("with the conf set, x33 serves from the table — builds stay flat " +
      "— and a dir mismatch falls back to building") {
    ExtensionQueries.usePostingIndex(spark, d, table) // exists: no write
    ExtensionQueries.evictPostingIndex(spark, d)      // kill the memo path
    val before = ExtensionQueries.postingIndexBuilds.get()
    val viaConf = pairSet(ExtensionQueries.x33IncrementalFromIndex(spark, d))
    assert(ExtensionQueries.postingIndexBuilds.get() === before,
      "conf-resolved x33 must not rebuild the index")
    assert(viaConf === pairSet(ExtensionQueries.x32IncrementalNearDup(spark, d)))
    assert(viaConf.nonEmpty)

    // provenance mismatch: the table was written for sf0.001
    val d2 = "/root/testdata/sf0.01"
    ExtensionQueries.evictPostingIndex(spark, d2)
    ExtensionQueries.docsPostingIndex(spark, d2).count()
    assert(ExtensionQueries.postingIndexBuilds.get() === before + 1,
      "mismatched provenance must trigger a fresh build for the right dir")
    ExtensionQueries.evictPostingIndex(spark, d2)
    spark.conf.unset(ExtensionQueries.PostingIndexTableConf)
  }
}
