package graft.operators

import graft.{ExtensionQueries, SparkTestBase}
import org.apache.spark.sql.DataFrame

/** The durable-table story for the round-10 memo-only artifacts —
  * x35b's LSH band/set tables, x34b's corpus fingerprint set, x36's
  * probed embedding buckets — on the posting-index pattern
  * (IncrementalIndexSpec): the snapshot job writes a bucketed,
  * provenance-stamped catalog table; consumers with the conf set serve
  * from it with ZERO rebuilds (the builds counters stay flat); the
  * served rows equal the memo-build rows verbatim; and a fresh session
  * sharing the catalog reads the table directly. A real daily job is a
  * fresh JVM — before this, every serve-side query silently rebuilt
  * the corpus artifact it claims to avoid. */
class DurableArtifactsSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private val lshBase = "g_lsh_artifact_spec"
  private val fpTable = "g_corpus_fp_spec"
  private val embTable = "g_emb_buckets_spec"

  private def dropAll(): Unit = {
    Seq(s"${lshBase}_banded", s"${lshBase}_sets", fpTable, embTable)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    ExtensionQueries.evictLshArtifacts(spark, d)
    ExtensionQueries.evictCorpusFp(spark, d)
    ExtensionQueries.evictEmbBuckets(spark, d)
  }

  override def beforeAll(): Unit = { super.beforeAll(); dropAll() }
  override def afterAll(): Unit = {
    try {
      dropAll()
      Seq(ExtensionQueries.lshBandedArtifact.tableConf,
        ExtensionQueries.lshSetsArtifact.tableConf,
        ExtensionQueries.corpusFpArtifact.tableConf,
        ExtensionQueries.embBucketsArtifact.tableConf,
        ExtensionQueries.PostingIndexTableConf)
        .foreach { c => if (spark.conf.getOption(c).isDefined) spark.conf.unset(c) }
    } finally super.afterAll()
  }

  private def rows(df: DataFrame) =
    df.collect().map(_.toSeq).toSet

  private def bucketSpec(table: String) =
    spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table)).bucketSpec

  test("x35b serves from the written LSH tables with zero rebuilds, " +
      "rows identical to the memo path; bucket layout on the join keys") {
    // memo-path truth first (no conf set)
    val viaMemo = rows(ExtensionQueries.queries("x35b_lsh_from_artifact")(spark, d))
    assert(viaMemo.nonEmpty)

    ExtensionQueries.useLshArtifacts(spark, d, lshBase)
    ExtensionQueries.evictLshArtifacts(spark, d) // kill the memo path
    val bandedBuilds = ExtensionQueries.lshBandedArtifact.builds.get()
    val setsBuilds = ExtensionQueries.lshSetsArtifact.builds.get()
    val viaTable = rows(ExtensionQueries.queries("x35b_lsh_from_artifact")(spark, d))
    assert(viaTable === viaMemo)
    assert(ExtensionQueries.lshBandedArtifact.builds.get() === bandedBuilds &&
      ExtensionQueries.lshSetsArtifact.builds.get() === setsBuilds,
      "conf-resolved x35b must not rebuild either LSH artifact")

    assert(bucketSpec(s"${lshBase}_banded").exists(b =>
      b.numBuckets == 8 && b.bucketColumnNames == Seq("_bh")))
    assert(bucketSpec(s"${lshBase}_sets").exists(b =>
      b.numBuckets == 8 && b.bucketColumnNames == Seq("_id")))

    // a fresh session sharing the catalog reads the tables directly
    val s2 = spark.newSession()
    s2.conf.set(ExtensionQueries.lshBandedArtifact.tableConf, s"${lshBase}_banded")
    s2.conf.set(ExtensionQueries.lshSetsArtifact.tableConf, s"${lshBase}_sets")
    assert(s2.table(s"${lshBase}_banded").count() > 0)
    assert(s2.table(s"${lshBase}_sets").count() > 0)
    spark.conf.unset(ExtensionQueries.lshBandedArtifact.tableConf)
    spark.conf.unset(ExtensionQueries.lshSetsArtifact.tableConf)
  }

  test("x34b serves the fp probe from the written fp table with zero " +
      "rebuilds, verdicts identical to the memo path") {
    val viaMemo = rows(ExtensionQueries.queries("x34b_curation_from_index")(spark, d))
    assert(viaMemo.nonEmpty)

    ExtensionQueries.useCorpusFp(spark, d, fpTable)
    ExtensionQueries.evictCorpusFp(spark, d)
    val before = ExtensionQueries.corpusFpArtifact.builds.get()
    val viaTable = rows(ExtensionQueries.queries("x34b_curation_from_index")(spark, d))
    assert(viaTable === viaMemo)
    assert(ExtensionQueries.corpusFpArtifact.builds.get() === before,
      "conf-resolved x34b must not rebuild the fp set")
    assert(bucketSpec(fpTable).exists(b =>
      b.numBuckets == 8 && b.bucketColumnNames == Seq("fp")))

    // provenance mismatch: the table was written for sf0.001 — a
    // different dir must trigger a fresh build, never serve stale fps
    val d2 = "/root/testdata/sf0.01"
    ExtensionQueries.evictCorpusFp(spark, d2)
    ExtensionQueries.docsCorpusFp(spark, d2).count()
    assert(ExtensionQueries.corpusFpArtifact.builds.get() === before + 1,
      "mismatched provenance must trigger a fresh build for the right dir")
    ExtensionQueries.evictCorpusFp(spark, d2)
    spark.conf.unset(ExtensionQueries.corpusFpArtifact.tableConf)
  }

  test("x36 serves candidates from the written probed-bucket table " +
      "with zero rebuilds, pairs identical to the memo path") {
    val viaMemo = rows(ExtensionQueries.queries("x36_incremental_embed_neardup")(spark, d))
    assert(viaMemo.nonEmpty)

    ExtensionQueries.useEmbBuckets(spark, d, embTable)
    ExtensionQueries.evictEmbBuckets(spark, d)
    val before = ExtensionQueries.embBucketsArtifact.builds.get()
    val viaTable = rows(ExtensionQueries.queries("x36_incremental_embed_neardup")(spark, d))
    assert(viaTable === viaMemo)
    assert(ExtensionQueries.embBucketsArtifact.builds.get() === before,
      "conf-resolved x36 must not rebuild the probed buckets")
    assert(bucketSpec(embTable).exists(b =>
      b.numBuckets == 8 && b.bucketColumnNames == Seq("_bucket")))
    spark.conf.unset(ExtensionQueries.embBucketsArtifact.tableConf)
  }

  test("use() rewrites a table stamped for another dir instead of " +
      "silently falling back to the memo for every consumer") {
    val d2 = "/root/testdata/sf0.01"
    ExtensionQueries.useCorpusFp(spark, d, fpTable) // stamped for d
    ExtensionQueries.useCorpusFp(spark, d2, fpTable) // must rewrite
    assert(graft.DurableArtifact.stampedFor(spark, fpTable, d2))
    val before = ExtensionQueries.corpusFpArtifact.builds.get()
    ExtensionQueries.evictCorpusFp(spark, d2)
    ExtensionQueries.docsCorpusFp(spark, d2).count()
    assert(ExtensionQueries.corpusFpArtifact.builds.get() === before,
      "after the rewrite, d2 consumers must serve from the table")
    ExtensionQueries.evictCorpusFp(spark, d2)
    spark.conf.unset(ExtensionQueries.corpusFpArtifact.tableConf)
  }
}
