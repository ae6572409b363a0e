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

  test("compact rewrites a small-file mess to the metadata-derived count") {
    val in = Files.createTempDirectory("graft_smallfiles").toString
    val docs = Tables.documents(spark, sf)
    val nRows = docs.count()
    docs.repartition(64).write.mode("overwrite").parquet(in)
    val before = new java.io.File(in).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(before === 64, s"expected 64 small files, got $before")
    val out = Files.createTempDirectory("graft_compacted").toString
    // target sized so the whole dataset fits in ONE file
    val compacted = Layout.compact(spark, in, out, targetBytes = 1L << 30)
    val after = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after === 1, s"expected 1 compacted file, got $after")
    assert(compacted.count() === nRows)
    // and a finer target yields proportionally more files, still lossless
    val out2 = Files.createTempDirectory("graft_compacted2").toString
    val totalBytes = spark.read.parquet(in).inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .getFileStatus(p).getLen
    }.sum
    val fine = Layout.compact(spark, in, out2, targetBytes = totalBytes / 4)
    val after2 = new java.io.File(out2).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(after2 >= 4 && after2 <= 5, s"got $after2 files")
    assert(fine.count() === nRows)
  }

  test("dynamic partition overwrite backfills one month idempotently") {
    val dir = Files.createTempDirectory("graft_backfill").toString
    val orders = Tables.orders(spark, sf)
    Layout.writeMonthPartitioned(orders, "o_orderdate", dir)
    val before = Layout.readMonthPartitioned(spark, dir)
    val othersBefore = before.filter(!(col("yyyy") === 1995 && col("mm") === 3))
      .count()
    val targetBefore = before.filter(col("yyyy") === 1995 && col("mm") === 3)
      .count()
    assert(targetBefore > 0, "fixture must cover 1995-03")

    // corrected recompute of JUST 1995-03 (half the rows survive the fix)
    val corrected = orders
      .filter(year(col("o_orderdate").cast("date")) === 1995 &&
        month(col("o_orderdate").cast("date")) === 3 &&
        col("o_orderkey") % 2 === 0)
      .withColumn("yyyy", lit(1995)).withColumn("mm", lit(3))
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    try {
      // dynamic mode: overwrite ONLY the partitions present in the
      // write — the idempotent-backfill primitive (static mode would
      // drop every other month)
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      corrected.write.mode("overwrite").partitionBy("yyyy", "mm").parquet(dir)
    } finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    val after = Layout.readMonthPartitioned(spark, dir)
    assert(after.filter(!(col("yyyy") === 1995 && col("mm") === 3)).count()
      === othersBefore, "untouched months must survive the backfill")
    assert(after.filter(col("yyyy") === 1995 && col("mm") === 3).count()
      === corrected.count(), "target month must hold exactly the recompute")
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
