package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed result equals the naive inequality join, once per pair") {
    val pts = spark.range(1000)
      .select(col("id").as("pid"), ((col("id") * 97) % 5000 - 500).as("p"))
    // irregular, overlapping intervals incl. negatives, empties, and
    // spans much wider than the bucket width
    val ivs = spark.range(120).select(col("id").as("iid"),
        ((col("id") * 131) % 4000 - 800).as("lo"),
        ((col("id") * 131) % 4000 - 800 + (col("id") % 7) * 150 - 150).as("hi"))
    val fast = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 64L)
      .select("pid", "iid")
    val slow = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid")
    assert(fast.count() === slow.count(), "pair multiplicity must match")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("plans as an equi join on the bucket key, not a nested loop") {
    val pts = spark.range(100).select(col("id").as("pid"), col("id").as("p"))
    val ivs = spark.range(10).select(col("id").as("iid"),
      (col("id") * 10).as("lo"), (col("id") * 10 + 15).as("hi"))
    val plan = RangeJoin.pointInInterval(pts, "p", ivs, "lo", "hi", 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), s"nested loop in plan:\n$plan")
  }

  test("colliding interval column names are rejected") {
    val df = spark.range(3).select(col("id").as("p"),
      col("id").as("lo"), (col("id") + 1).as("hi"))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(df, "p", df, "lo", "hi", 8L)
    }
  }
}
