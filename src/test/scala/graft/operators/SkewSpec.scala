package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // heavy-tailed: 900 rows of key 1, a few others
    val probe = ((1 to 900).map(i => (1L, i)) ++ Seq((2L, 1), (3L, 2)))
      .toDF("k", "payload")
    val build = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched"))
      .toDF("k", "label")
    val plain = probe.join(build, Seq("k"), "inner")
      .orderBy("k", "payload")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(probe, build, "k", factor = 8)
      .select("k", "payload", "label")
      .orderBy("k", "payload")
      .collect().map(_.toSeq).toSeq
    assert(salted === plain)
    assert(salted.count(_.head == 1L) === 900)
  }

  // When does salting beat AQE's zero-code skew split? Measured at the
  // 6M-row hot-key fixture (PERF.md round 8: salted 6.8 s vs
  // AQE-forced 7.8 s vs naive 12.1 s) and pinned MECHANICALLY here:
  // in the join→same-key-aggregate shape (this engine's budget/cap
  // queries), the SMJ's hash(k) output feeds the groupBy(k) with no
  // exchange, so splitting the join would INTRODUCE one — AQE's
  // OptimizeSkewedJoin declines even with thresholds tuned far below
  // the hot partition, and only spark.sql.adaptive.forceOptimizeSkewedJoin
  // (an extra full-join-output shuffle) or manual salting spreads the
  // hot key. The same tuned thresholds DO split the join when its
  // parent is a global aggregate (distribution-agnostic partials).
  test("AQE skew split declines the join→same-key-agg shape; salting " +
      "is the lever there") {
    val probe = (1 to 20000).map(i => (if (i % 10 < 4) 1L else (i % 97).toLong, i))
      .toDF("k", "payload")
    val build = (0 to 97).map(i => (i.toLong, s"b$i")).toDF("k", "label")
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "10k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "10k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0")
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
        df.collect(); df.queryExecution.executedPlan.toString
      }
      val joined = probe.join(build.hint("merge"), Seq("k"))
      val keyed = finalPlan(joined.groupBy("k").agg(count(lit(1)).as("n")))
      assert(!keyed.contains("skew=true"),
        "expected AQE to DECLINE the split when the same-key agg " +
          "rides the join's partitioning")
      val global = finalPlan(joined.agg(count(lit(1)).as("n")))
      assert(global.contains("skew=true"),
        "expected the tuned split to fire under a global agg " +
          "(no distribution requirement above the join)")
    } finally confs.foreach { case (k, _) => spark.conf.unset(k) }
  }
}
