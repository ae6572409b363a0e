package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the list-stage width guard (Dedup.listStageWidth): when the
  * source outgrows `ListStageTargetBytesConf × shuffle partitions`,
  * the capped pair family widens its list-build exchange — per-task
  * aggregation state was the measured source of x27b's catastrophic
  * rep variance at the 125× replica (a spill race, not GC — PERF.md
  * round 11). The guard must (a) change ONLY the physical width,
  * never a row; (b) actually fire (an exchange with the widened
  * partition count appears); (c) stay a no-op at bench scale under
  * the default threshold, keeping those plans byte-identical. */
class WidthGuardSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  private def pairs(): DataFrame =
    Dedup.ngramJaccardPairsPpm(
      graft.Tables.documents(spark, d).select(col("doc_id"), col("text")),
      "doc_id", "text", n = 3, thresholdPpm = 300000L,
      dfCap = Dedup.DfCap.AdaptiveAvg(2))

  private def pairSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  // Inspect the OPTIMIZED LOGICAL plan: the guard is a plan-time
  // decision that inserts a RepartitionByExpression(k) node. Do NOT
  // force executedPlan/initialPlan on a frame that won't be executed
  // — preparing an AQE physical plan and then running a
  // canonically-equal query in the same session trips a stage-reuse
  // sharp edge (ColumnarBatch-cast crash; bisected round 11).
  private def exchangeCounts(df: DataFrame): Seq[Int] =
    df.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
        if r.optNumPartitions.isDefined => r.optNumPartitions.get
    }

  test("guard fired == guard off: identical rows; the widened exchange " +
      "is really in the fired plan and absent from the default plan") {
    val defaultRows = pairSet(pairs())
    assert(defaultRows.nonEmpty)
    val defaultWidths = exchangeCounts(pairs())
    val shuffle = spark.sessionState.conf.numShufflePartitions

    spark.conf.set(Dedup.ListStageTargetBytesConf, "1024") // ~fire always
    try {
      val firedDf = pairs()
      assert(pairSet(firedDf) === defaultRows,
        "the guard must never change a row")
      val firedWidths = exchangeCounts(firedDf)
      assert(firedWidths.exists(_ > shuffle),
        s"expected a widened exchange; widths=$firedWidths")
      assert(!defaultWidths.exists(_ > shuffle),
        s"default plan must not widen; widths=$defaultWidths")
    } finally spark.conf.unset(Dedup.ListStageTargetBytesConf)
  }

  test("below the threshold the guard is a no-op: same executed plan " +
      "shape as an explicitly disabled guard") {
    // default threshold: 16 MB per task x shuffle partitions far
    // exceeds the sf0.001 fixture, so no widened exchange may appear
    val widths = exchangeCounts(pairs())
    val shuffle = spark.sessionState.conf.numShufflePartitions
    assert(!widths.exists(_ > shuffle), s"widths=$widths")
  }
}
