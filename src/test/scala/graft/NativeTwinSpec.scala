package graft

/** Pins each benchOnly native twin (fused float cosine, the 100 TB
  * path) to its exact-decimal oracle form (the driver-verified path):
  * identical answer SETS, and scores within the DECIMAL(9,6)
  * quantization bound. This is what licenses benching the native form
  * as "the same operator" — the two paths may differ only in the 6th
  * decimal of the score, never in which rows they return. */
class NativeTwinSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private val eps = 2e-6 // DECIMAL(9,6) quantization + 6dp rounding

  test("x5n native LSH top-k returns x5b's exact ids, cos within eps") {
    val exact = ExtensionQueries.x5bAnnLshTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val native = ExtensionQueries.x5nAnnLshNative(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(native.keySet === exact.keySet)
    native.foreach { case (k, c) =>
      assert(math.abs(c - exact(k)) <= eps, s"$k: native=$c exact=${exact(k)}")
    }
  }

  test("x6n native near-dup returns x6's exact pair set, cos within eps") {
    val exact = ExtensionQueries.x6EmbeddingNearDup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val native = ExtensionQueries.x6nNearDupNative(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(native.keySet === exact.keySet)
    native.foreach { case (k, c) =>
      assert(math.abs(c - exact(k)) <= eps, s"$k: native=$c exact=${exact(k)}")
    }
  }

  test("x22b native centroid assignment reproduces x22 byte-for-byte") {
    // cap stage is integer arithmetic: once the argmax agrees the whole
    // row is integer-equal, so this can demand full equality
    val exact = ExtensionQueries.x22TopicBalance(spark, d).collect().toSeq
    val native = ExtensionQueries.x22bTopicBalanceNative(spark, d)
      .collect().toSeq
    assert(native === exact)
  }
}
