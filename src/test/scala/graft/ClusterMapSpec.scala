package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

/** The durable cluster-map story: [[ExtensionQueries.writeClusterMap]]
  * persists the once-per-snapshot doc_id → cluster_id table and a
  * FRESH session consumes it without re-running pair generation or
  * label propagation — the materialization a 100 TB pipeline actually
  * has, which the session memo only stands in for. */
class ClusterMapSpec extends SparkTestBase {
  private val d = "/root/testdata/sf0.001"
  private val table = "g_cluster_map_spec"

  // each suite run starts from a clean catalog + memo, and the table
  // is dropped even when an assertion aborts mid-suite (a stale table
  // would let the no-shuffle test pass against last run's data)
  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ExtensionQueries.evictClusterMap(spark, d)
  }
  override def afterAll(): Unit = {
    try {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      spark.conf.unset(ExtensionQueries.ClusterMapTableConf)
    } finally super.afterAll()
  }

  test("a fresh session reads the written map without rebuilding") {
    val built = ExtensionQueries.nearDupClusterMap(spark, d)
      .collect().map(_.toSeq).sortBy(_.toString)
    ExtensionQueries.writeClusterMap(spark, d, table)
    val buildsAfterWrite = ExtensionQueries.clusterMapBuilds.get()

    // newSession: fresh session state, SHARED catalog — the stand-in
    // for tomorrow's job reading today's snapshot table
    val s2 = spark.newSession()
    val back = ExtensionQueries.readClusterMap(s2, table)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(back === built)
    assert(ExtensionQueries.clusterMapBuilds.get() === buildsAfterWrite,
      "read-back must not re-run label propagation")

    // the artifact is bucketed — downstream doc-keyed consumers start
    // hash-partitioned
    val meta = s2.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(table))
    assert(meta.bucketSpec.exists(b =>
      b.numBuckets == 8 && b.bucketColumnNames == Seq("doc_id")))
  }

  test("a doc_id aggregate over the bucketed map plans no shuffle") {
    val agg = ExtensionQueries.readClusterMap(spark, table)
      .groupBy("doc_id").agg(max("cluster_id").as("c"))
    agg.collect()
    val plan = agg.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"bucketed scan should satisfy the aggregate's distribution: $plan")
  }

  test("with the conf set, consumers resolve to the table — builds stay flat") {
    ExtensionQueries.useClusterMap(spark, d, table) // table exists: no write
    ExtensionQueries.evictClusterMap(spark, d)      // kill the memo escape hatch
    val before = ExtensionQueries.clusterMapBuilds.get()
    val viaConf = ExtensionQueries.x11DupClusters(spark, d)
      .collect().map(_.toSeq).sortBy(_.toString)
    val direct = ExtensionQueries.readClusterMap(spark, table)
      .orderBy("doc_id").collect().map(_.toSeq).sortBy(_.toString)
    assert(viaConf === direct)
    assert(ExtensionQueries.clusterMapBuilds.get() === before,
      "conf-resolved consumers must not rebuild")
    spark.conf.unset(ExtensionQueries.ClusterMapTableConf)
  }

  test("a dir mismatch falls back to building, never serves wrong clusters") {
    // the table was written for sf0.001; ask for a different corpus dir
    spark.conf.set(ExtensionQueries.ClusterMapTableConf, table)
    val d2 = "/root/testdata/sf0.01"
    ExtensionQueries.evictClusterMap(spark, d2)
    val before = ExtensionQueries.clusterMapBuilds.get()
    ExtensionQueries.nearDupClusterMap(spark, d2).count()
    assert(ExtensionQueries.clusterMapBuilds.get() === before + 1,
      "mismatched provenance must trigger a fresh build for the right dir")
    ExtensionQueries.evictClusterMap(spark, d2)
    spark.conf.unset(ExtensionQueries.ClusterMapTableConf)
  }

  test("evictClusterMap unpersists and a rebuild is a fresh build") {
    ExtensionQueries.nearDupClusterMap(spark, d).count() // prime the memo
    val before = ExtensionQueries.clusterMapBuilds.get()
    ExtensionQueries.nearDupClusterMap(spark, d) // memoized — no build
    assert(ExtensionQueries.clusterMapBuilds.get() === before)
    ExtensionQueries.evictClusterMap(spark, d)
    ExtensionQueries.nearDupClusterMap(spark, d).count()
    assert(ExtensionQueries.clusterMapBuilds.get() === before + 1,
      "after eviction the next caller rebuilds once")
  }
}
