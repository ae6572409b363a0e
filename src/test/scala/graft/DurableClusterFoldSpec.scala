package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Durable O(batch) persistence of the cluster-map fold
  * ([[ExtensionQueries.foldClusterMapDurable]]) — the round-12 gap:
  * x39 computed the folded map in memory, but the only durable write
  * was the corpus-sized overwrite. The patch layer must (a) read back
  * ≡ the in-memory fold ≡ the union rebuild, across MULTIPLE folds
  * (patch composition), (b) write only batch-sized data, (c) compact
  * to a canonical snapshot without changing content, and (d) serve
  * real consumers (x17 canonical pick, x29 leakage split) from a
  * fresh fold-aware session with zero rebuilds. */
class DurableClusterFoldSpec extends SparkTestBase {
  import graft.operators.Dedup

  private val d = "/root/testdata/sf0.001"
  private val table = "g_cluster_fold_spec"
  private val pt = table + ExtensionQueries.ClusterMapPatchSuffix
  private val serveTable = "g_cluster_fold_serve_spec"
  private val servePt = serveTable + ExtensionQueries.ClusterMapPatchSuffix

  private def dropAll(): Unit = {
    Seq(table, pt, serveTable, servePt)
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))
    ExtensionQueries.evictClusterMap(spark, d)
  }
  override def beforeAll(): Unit = { super.beforeAll(); dropAll() }
  override def afterAll(): Unit = {
    try {
      dropAll()
      spark.conf.unset(ExtensionQueries.ClusterMapTableConf)
    } finally super.afterAll()
  }

  private def pairsDf(ps: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    ps.toDF("ida", "idb")
  }
  private def rows(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  private def ccMap(ps: Seq[(Long, Long)]): DataFrame =
    Dedup.connectedComponents(pairsDf(ps))
      .select(col("node").as("doc_id"), col("cluster_id"))

  private val basePairs =
    Seq((1L, 2L), (10L, 11L), (20L, 21L), (30L, 31L))
  // day 1: 100 bridges clusters {1,2} and {10,11}; (200,201) is a
  // brand-new cluster
  private val day1 = Seq((2L, 100L), (11L, 100L), (200L, 201L))
  // day 2: 300 attaches to cluster 20 (no relabel), and NEW node 0
  // undercuts root 1 — the composition case: day 1 stored 10→1, day 2
  // must compose it to 10→0 alongside the fresh 1→0
  private val day2 = Seq((21L, 300L), (0L, 1L))

  test("durable fold reads back ≡ union rebuild across two folds; " +
      "everything written is batch-sized; the patch stays single-level") {
    val baseMap = ccMap(basePairs)
    baseMap.write.bucketBy(8, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(table)
    val baseRows = rows(spark.table(table))

    ExtensionQueries.foldClusterMapDurable(spark, d, table, pairsDf(day1))
    assert(rows(ExtensionQueries.readClusterMap(spark, table))
      === rows(ccMap(basePairs ++ day1)))
    // batch-sized persistence: base grew by exactly the new nodes
    // (100, 200, 201); the patch holds only the touched-cluster
    // relabel (10→1)
    assert(spark.table(table).count() === baseRows.size + 3)
    assert(rows(spark.table(pt)) === Set((10L, 1L)))
    assert(DurableArtifact.foldsOf(spark, table) === 1)

    ExtensionQueries.foldClusterMapDurable(spark, d, table, pairsDf(day2))
    assert(rows(ExtensionQueries.readClusterMap(spark, table))
      === rows(ccMap(basePairs ++ day1 ++ day2)))
    // composed, single-level: day 1's 10→1 became 10→0 next to the
    // fresh 1→0 — no stored value is itself a patch key, so readers
    // always apply exactly one join
    val patch = rows(spark.table(pt))
    assert(patch === Set((10L, 0L), (1L, 0L)))
    assert(patch.map(_._2).intersect(patch.map(_._1)).isEmpty)
    assert(DurableArtifact.foldsOf(spark, table) === 2)
  }

  test("compaction folds the patch into a canonical snapshot: content " +
      "identical, patch table gone, bucket layout and provenance kept") {
    val before = rows(ExtensionQueries.readClusterMap(spark, table))
    val foldsBefore = DurableArtifact.foldsOf(spark, table)
    ExtensionQueries.compactClusterMap(spark, table)
    assert(!spark.catalog.tableExists(pt))
    // the BASE now carries the folded labels on its own
    assert(rows(spark.table(table)) === before)
    assert(rows(ExtensionQueries.readClusterMap(spark, table)) === before)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    assert(meta.bucketSpec.exists(b =>
      b.numBuckets == 8 && b.bucketColumnNames == Seq("doc_id")))
    // compaction changes layout, never content: the folds marker must
    // survive so snapshot consumers still refuse the table
    assert(DurableArtifact.foldsOf(spark, table) === foldsBefore)
    // compacting again is a no-op, not an error
    ExtensionQueries.compactClusterMap(spark, table)
  }

  test("x17/x29 serve green off a patched map in a fresh fold-aware " +
      "session, zero rebuilds — half the pair set written as the " +
      "snapshot, the other half folded durably") {
    // fold ≡ rebuild means snapshot(half A) + durable-fold(half B)
    // must equal the full map of d — so consumers served from the
    // patched table must reproduce their (driver-hash-checked) rows
    val docs = Tables.documents(spark, d)
    val all = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8).select("ida", "idb").persist()
    val halfA = all.filter(pmod(col("ida") + col("idb"), lit(2)) === 0)
    val halfB = all.filter(pmod(col("ida") + col("idb"), lit(2)) === 1)
    Dedup.connectedComponents(halfA)
      .select(col("node").as("doc_id"), col("cluster_id"))
      .write.bucketBy(8, "doc_id").sortBy("doc_id")
      .format("parquet").saveAsTable(serveTable)
    spark.sql(s"ALTER TABLE $serveTable SET TBLPROPERTIES " +
      s"('${DurableArtifact.SourceDirProp}' = '${DurableArtifact.normDir(d)}')")
    ExtensionQueries.foldClusterMapDurable(spark, d, serveTable, halfB)
    all.unpersist()

    // the patched table IS the snapshot map of d
    val memoMap = rows(ExtensionQueries.nearDupClusterMap(spark, d))
    assert(rows(ExtensionQueries.readClusterMap(spark, serveTable))
      === memoMap)

    val want17 = ExtensionQueries.queries("x17_cluster_canonical")(spark, d)
      .collect().map(_.toSeq).toSeq
    val want29 = ExtensionQueries.queries("x29_leakage_split")(spark, d)
      .collect().map(_.toSeq).toSeq

    val s2 = spark.newSession()
    s2.conf.set(ExtensionQueries.ClusterMapTableConf, serveTable)
    s2.conf.set(DurableArtifact.ServeFoldedConf, "true")
    val builds = ExtensionQueries.clusterMapBuilds.get()
    assert(ExtensionQueries.queries("x17_cluster_canonical")(s2, d)
      .collect().map(_.toSeq).toSeq === want17)
    assert(ExtensionQueries.queries("x29_leakage_split")(s2, d)
      .collect().map(_.toSeq).toSeq === want29)
    assert(ExtensionQueries.clusterMapBuilds.get() === builds,
      "fold-aware conf-resolved consumers must serve the patched " +
        "table, never rebuild")

    // WITHOUT the opt-in, the folded table is refused and the session
    // falls back to a build — the snapshot-consumer guard
    val s3 = spark.newSession()
    s3.conf.set(ExtensionQueries.ClusterMapTableConf, serveTable)
    ExtensionQueries.nearDupClusterMap(s3, d).count()
    assert(ExtensionQueries.clusterMapBuilds.get() === builds + 1,
      "a snapshot consumer must not silently read a folded table")
    ExtensionQueries.evictClusterMap(s3, d)
  }
}
