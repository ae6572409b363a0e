package graft.plans

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class RewriteTop1WindowSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** The j3-style nearest-per-key query: all-ascending order keys. */
  private def top1(): DataFrame = {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").asc, col("l_linenumber").asc)
    li.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  private def withRule[A](on: Boolean)(f: => A): A = {
    spark.conf.set("spark.graft.rewriteTop1Window", on.toString)
    try f finally spark.conf.unset("spark.graft.rewriteTop1Window")
  }

  test("rule off: plan keeps the Window; rule on: min_by aggregate, no Window") {
    val off = withRule(false)(top1().queryExecution.optimizedPlan.toString)
    assert(off.contains("Window"), off)
    val on = withRule(true)(top1().queryExecution.optimizedPlan.toString)
    assert(!on.contains("Window "), on)
    assert(on.contains("min_by"), on)
  }

  test("rewritten plan produces the identical result") {
    val expected = withRule(false)(
      top1().orderBy("l_orderkey").collect().toSeq)
    val actual = withRule(true)(
      top1().orderBy("l_orderkey").collect().toSeq)
    assert(actual === expected)
    assert(actual.nonEmpty)
  }

  test("descending order keys are left untouched (outside the contract)") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").desc, col("l_linenumber").asc)
    val q = li.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
    val plan = withRule(true)(q.queryExecution.optimizedPlan.toString)
    assert(plan.contains("Window"), plan)
  }

  test("rn > 1 filters are left untouched") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
    val w = Window.partitionBy("l_orderkey")
      .orderBy(col("l_extendedprice").asc, col("l_linenumber").asc)
    val q = li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 2)
    val plan = withRule(true)(q.queryExecution.optimizedPlan.toString)
    assert(plan.contains("Window"), plan)
  }
}
