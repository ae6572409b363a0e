package graft

import org.apache.spark.sql.functions._

/** Accuracy contracts for queries whose scale path has no cross-engine
  * oracle (sketch internals differ per engine): the approximate form
  * must track the exact form within its documented error bound on the
  * real fixture. */
class CoreQueriesSpec extends SparkTestBase {

  test("a4c histogram percentiles are bit-identical to a4's exact buffer form") {
    for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val exact = CoreQueries.a4QuantileStats(spark, d).collect().toSeq
      val hist = CoreQueries.a4cQuantileHist(spark, d).collect().toSeq
      assert(hist === exact, s"histogram rewrite diverged at $d")
    }
  }

  test("a4b sketch percentiles + HLL track exact a4 within bounds (sf0.001)") {
    val d = "/root/testdata/sf0.001"
    def byFlag(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    val exact = byFlag(CoreQueries.a4QuantileStats(spark, d))
    val approx = byFlag(CoreQueries.a4bQuantileSketch(spark, d))
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (flag, (dc, p50, p95)) =>
      val (adc, ap50, ap95) = approx(flag)
      // HLL at rsd=0.02: allow 3σ ≈ 6%
      assert(math.abs(adc - dc).toDouble / dc <= 0.06,
        s"$flag distinct-count $adc vs exact $dc")
      // approx_percentile(accuracy=10000) rank error ≤ 1/10000 of rows;
      // on l_quantity (integers 1..50) that is at most one value step
      assert(math.abs(ap50 - p50) <= 1.0, s"$flag p50 $ap50 vs $p50")
      assert(math.abs(ap95 - p95) <= 1.0, s"$flag p95 $ap95 vs $p95")
    }
  }
}
