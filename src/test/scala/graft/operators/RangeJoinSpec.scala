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

  test("2D box join equals the naive conjunction join, once per pair") {
    val pts = spark.range(800).select(col("id").as("pid"),
      ((col("id") * 97) % 500 - 100).as("x"),
      ((col("id") * 61) % 700 - 300).as("y"))
    val boxes = spark.range(60).select(col("id").as("bid"),
      ((col("id") * 131) % 400 - 150).as("xlo"),
      ((col("id") * 131) % 400 - 150 + (col("id") % 5) * 60).as("xhi"),
      ((col("id") * 37) % 500 - 250).as("ylo"),
      ((col("id") * 37) % 500 - 250 + (col("id") % 7) * 70).as("yhi"))
    val fast = RangeJoin.pointInBox(pts, "x", "y", boxes,
      "xlo", "xhi", "ylo", "yhi", 32L, 48L).select("pid", "bid")
    val slow = pts.join(boxes,
      col("x") >= col("xlo") && col("x") < col("xhi") &&
        col("y") >= col("ylo") && col("y") < col("yhi")).select("pid", "bid")
    assert(fast.count() === slow.count(), "pair multiplicity must match")
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("colliding interval column names are rejected") {
    val df = spark.range(3).select(col("id").as("p"),
      col("id").as("lo"), (col("id") + 1).as("hi"))
    intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(df, "p", df, "lo", "hi", 8L)
    }
  }
}
