package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout utilities — the storage-side levers that decide
  * whether a 100 TB job shuffles or scans at all:
  *
  *  - [[writeBucketed]]: hash-bucket + sort a table by its join key so
  *    later equi-joins/aggregations on that key are exchange-free
  *    (co-located join: each task joins bucket i ⋈ bucket i directly).
  *  - [[writeMonthPartitioned]]: the Spark-native version of the
  *    reference's `yyyy/mm/` stage layout (BlueForty.py:64-71) —
  *    partition values live in directory names, so a date-bounded query
  *    prunes whole months at file-listing time (PartitionFilters in the
  *    scan, no data read).
  */
object Layout {

  /** Persist as a bucketed+sorted catalog table. `buckets` should be
    * sized so each bucket is a few hundred MB at target scale. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table)

  /** Write partitioned by (yyyy, mm) derived from a date column. */
  def writeMonthPartitioned(df: DataFrame, dateCol: String,
      path: String): Unit =
    df.withColumn("yyyy", year(col(dateCol).cast("date")))
      .withColumn("mm", month(col(dateCol).cast("date")))
      .write.mode("overwrite").partitionBy("yyyy", "mm").parquet(path)

  /** Read back a month-partitioned dataset; filters on yyyy/mm prune
    * directories before any file is opened. */
  def readMonthPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Z-order (Morton) value: bit-interleave of two bounded
    * non-negative integer columns — the multi-dimensional clustering
    * key. Sorting/partitioning a table by z instead of a single column
    * keeps BOTH dimensions locally dense inside every file, so
    * per-file min/max stats prune 2-D range predicates (the
    * Delta/Iceberg OPTIMIZE ZORDER story): a query on (x BETWEEN …,
    * y BETWEEN …) skips every file whose z-contiguous cell misses the
    * box, instead of reading all files as a single-column sort on x
    * would for tight y ranges. Pure bit arithmetic (shift/and/add of
    * disjoint bits) — codegen'd, engine-portable, no UDF. `bits` caps
    * each input at 2^bits; callers quantize first. */
  def zValue(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column,
      bits: Int = 16): org.apache.spark.sql.Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits).map { i =>
      shiftleft(shiftrightunsigned(x.cast("long"), i).bitwiseAND(lit(1L)),
        2 * i) +
        shiftleft(shiftrightunsigned(y.cast("long"), i).bitwiseAND(lit(1L)),
          2 * i + 1)
    }.reduce(_ + _) // bit positions are disjoint, so + ≡ bitwise OR
  }

  /** Compact a small-file dataset to ~`targetBytes` output files —
    * the maintenance job every streaming/incremental sink needs, or
    * file-listing cost alone eventually dominates query time (the m2
    * one-file-per-row lesson at corpus scale). Partition count is
    * derived from the dataset's FILE METADATA total (no content
    * scan — the repartitionByPayloadBytes lesson), and the rewrite is
    * one round-robin shuffle: no key assumptions, deterministic file
    * count, every row preserved. Returns the compacted-read handle. */
  def compact(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val df = spark.read.parquet(inPath)
    val hconf = spark.sparkContext.hadoopConfiguration
    val totalBytes = df.inputFiles.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      p.getFileSystem(hconf).getFileStatus(p).getLen
    }.sum
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    df.repartition(parts).write.mode("overwrite").parquet(outPath)
    spark.read.parquet(outPath)
  }
}
