package graft.plans

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** The native LSH bucketer must be bit-identical to the HOF reference
  * (same xxhash64-derived plane weights, same double fold order) —
  * the LSH recall tests and near-dup queries were built on the HOF
  * semantics. */
class HyperplaneLshBucketSpec extends SparkTestBase {
  import spark.implicits._

  test("bucket codes match the HOF formulation on real embeddings") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val rows = emb.select(
      Similarity.lshBucket(col("embedding"), dim, 12).as("native"),
      Similarity.lshBucketHof(col("embedding"), dim, 12).as("hof")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("edge vectors: zeros, negatives, NaN, length mismatch") {
    val vecs = Seq(
      Array(0.0f, 0.0f, 0.0f),
      Array(-1.5f, 2.5f, -0.25f),
      Array(1e-30f, -1e-30f, 0.0f),
      Array(Float.NaN, 1.0f, -1.0f), // NaN proj: Spark NaN >= 0 is true
      Array(1.0f, 2.0f),             // shorter than dim → HOF null-fold
      Array(1.0f, 2.0f, 3.0f, 4.0f)  // longer than dim
    ).toDF("v")
    val rows = vecs.select(
      Similarity.lshBucket(col("v"), 3, 8).as("native"),
      Similarity.lshBucketHof(col("v"), 3, 8).as("hof")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
  }

  test("null vector yields null") {
    val out = Seq(Option.empty[Array[Float]]).toDF("v")
      .select(Similarity.lshBucket(col("v"), 4, 8)).head()
    assert(out.isNullAt(0))
  }
}
