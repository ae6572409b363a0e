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

  test("z-order cells skip a 2-D box query that row-order cells hit") {
    // 4096 points on a 64×64 grid, 64 cells of 64 points each. Under
    // z-order a cell is an aligned 8×8 tile; under row-major order a
    // cell is a 64-wide stripe. For an 8×8 box query, min/max file
    // stats skip to exactly ONE z tile but must touch EIGHT stripes —
    // the data-skipping claim, measured on the stats a writer records.
    val pts = spark.range(4096).select(col("id"),
      (col("id") % 64).as("px"), (col("id") / 64).cast("long").as("py"))
    def cellsTouching(cellCol: org.apache.spark.sql.Column): Long =
      pts.select(col("px"), col("py"), cellCol.as("cell"))
        .groupBy("cell")
        .agg(min("px").as("x0"), max("px").as("x1"),
          min("py").as("y0"), max("py").as("y1"))
        .filter(col("x0") <= 23 && col("x1") >= 16 &&
          col("y0") <= 23 && col("y1") >= 16)
        .count()
    val zCells = cellsTouching(
      shiftrightunsigned(Layout.zValue(col("px"), col("py"), bits = 6), 6))
    val rowCells = cellsTouching((col("id") / 64).cast("long"))
    assert(zCells === 1L, s"box must hit exactly one aligned z tile, got $zCells")
    assert(rowCells === 8L, s"row-major stripes hit should be 8, got $rowCells")
  }

  test("zValue interleaves bits exactly (known vectors)") {
    val rows = spark.createDataFrame(Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (5L, 3L), (63L, 0L),
      (0L, 63L))).toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y"), bits = 6).as("z"))
      .collect().map(_.getLong(0)).toSeq
    // morton(5,3): x=101b → bits 0,4; y=011b → bits 1,3 → 11011b = 27
    assert(rows === Seq(0L, 1L, 2L, 3L, 27L, 1365L, 2730L))
  }
}
