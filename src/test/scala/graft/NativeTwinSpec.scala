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

  // Set membership is decided at hard boundaries (a cos threshold, a
  // top-k rank cut) where the float and decimal paths can legitimately
  // land on opposite sides within eps — a fixture regeneration that
  // puts a pair near a boundary must not fail the twin contract. So:
  // every DISAGREEMENT must be a boundary pair (within eps of the
  // decision value), and every agreement must score within eps.
  private def assertTwinSets(exact: Map[(Long, Long), Double],
      native: Map[(Long, Long), Double],
      boundaryOf: ((Long, Long)) => Double): Unit = {
    (exact.keySet diff native.keySet).foreach { k =>
      assert(math.abs(exact(k) - boundaryOf(k)) <= eps,
        s"$k only in exact (cos=${exact(k)}) and not a boundary pair")
    }
    (native.keySet diff exact.keySet).foreach { k =>
      assert(math.abs(native(k) - boundaryOf(k)) <= eps,
        s"$k only in native (cos=${native(k)}) and not a boundary pair")
    }
    val common = exact.keySet intersect native.keySet
    // the twin contract is vacuous if boundary-tolerance eats the set
    assert(common.size * 10 >= exact.size * 9, "twin sets diverge broadly")
    common.foreach { k =>
      assert(math.abs(native(k) - exact(k)) <= eps,
        s"$k: native=${native(k)} exact=${exact(k)}")
    }
  }

  test("x5n native LSH top-k returns x5b's exact ids, cos within eps " +
      "(rank-cut boundary pairs tolerated)") {
    val exact = ExtensionQueries.x5bAnnLshTopK(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val native = ExtensionQueries.x5nAnnLshNative(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // the decision value for a top-k cut is the kth-best (= minimum
    // kept) score of that query id
    val kth = exact.groupBy(_._1._1).map { case (q, m) => q -> m.values.min }
    assertTwinSets(exact, native, k => kth.getOrElse(k._1, Double.NaN))
  }

  test("x6n native near-dup returns x6's exact pair set, cos within eps " +
      "(threshold-boundary pairs tolerated)") {
    val exact = ExtensionQueries.x6EmbeddingNearDup(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val native = ExtensionQueries.x6nNearDupNative(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assertTwinSets(exact, native, _ => 0.99) // the x6 admit threshold
  }

  test("x22c sharded cap keeps within [⌊n/2⌋−shards/2, ⌊n/2⌋] of every cluster") {
    val exact = ExtensionQueries.x22bTopicBalanceNative(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sharded = ExtensionQueries.x22cTopicBalanceSharded(spark, d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(sharded.keySet === exact.keySet)
    sharded.foreach { case (c, (n, kept)) =>
      val (nExact, keptExact) = exact(c)
      assert(n == nExact, s"cluster $c: n_members $n != $nExact")
      assert(kept <= keptExact, s"cluster $c: sharded kept MORE ($kept > $keptExact)")
      assert(kept * 2 >= n - 8, s"cluster $c: sharded kept too few ($kept of $n)")
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
