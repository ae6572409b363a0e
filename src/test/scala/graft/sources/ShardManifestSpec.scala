package graft.sources

import graft.{SourceQueries, SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** s19_shard_manifest contract: the oracle row pins the per-shard
  * masses and the 1-file-per-shard layout against DuckDB; this spec
  * pins the properties a manifest consumer relies on that the oracle
  * cannot see — exactly-once routing and rerun determinism. */
class ShardManifestSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("s19: every document routed exactly once; one file per shard") {
    val m = SourceQueries.s19ShardManifest(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(m.map(_.getAs[Long]("n_docs")).sum === total)
    assert(m.forall(_.getAs[Long]("n_files") == 1L))
    // shard ids are the full residue range — no shard lost to routing
    assert(m.map(_.getAs[Long]("shard")).sorted.toSeq === (0L until 8L))
  }

  test("s19: manifest is deterministic across reruns (fresh write dir)") {
    val a = SourceQueries.s19ShardManifest(spark, sf).collect().toSeq
    val b = SourceQueries.s19ShardManifest(spark, sf).collect().toSeq
    assert(a === b)
  }
}
