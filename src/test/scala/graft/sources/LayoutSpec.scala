package graft.sources

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

import java.nio.file.Files

class LayoutSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join without an exchange (co-located join)") {
    Layout.writeBucketed(Tables.orders(spark, sf), "b_orders", "o_orderkey", 4)
    Layout.writeBucketed(
      Tables.lineitem(spark, sf).groupBy("l_orderkey")
        .agg(sum("l_quantity").as("qty")),
      "b_li", "l_orderkey", 4)
    val joined = spark.table("b_orders").join(spark.table("b_li"),
      col("o_orderkey") === col("l_orderkey"))
    // disable auto-broadcast so the join strategy (and the absence of a
    // shuffle) is what a large-table ⋈ large-table plan would use
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() === spark.table("b_li").count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("month-partitioned layout prunes at file-listing time") {
    val dir = Files.createTempDirectory("graft_part").toString
    Layout.writeMonthPartitioned(Tables.orders(spark, sf), "o_orderdate", dir)
    val pruned = Layout.readMonthPartitioned(spark, dir)
      .filter(col("yyyy") === 1995 && col("mm") === 3)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(yyyy"), plan)
    // count matches a direct filter on the source column
    val want = Tables.orders(spark, sf)
      .filter(year(col("o_orderdate").cast("date")) === 1995 &&
        month(col("o_orderdate").cast("date")) === 3).count()
    assert(pruned.count() === want)
  }
}
