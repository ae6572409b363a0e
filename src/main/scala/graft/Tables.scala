package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (TESTDATA.md). */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Total bytes of the files feeding a scan, from filesystem metadata
    * only — no RDD conversion, no job, no content pass. Empty for
    * non-file-backed plans (in-memory test data). */
  def scanFileBytes(df: DataFrame): (Int, Long) = {
    val conf = df.sparkSession.sessionState.newHadoopConf()
    val files = df.inputFiles
    val bytes = files.map { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      try p.getFileSystem(conf).getFileStatus(p).getLen catch {
        case _: java.io.IOException => 0L
      }
    }.sum
    (files.length, bytes)
  }

  /** Fan a narrow scan out to cluster parallelism before a map-heavy
    * stage: the corpus files are single-row-group parquet (one task).
    * Narrowness is decided from file-level metadata (file count +
    * bytes vs maxPartitionBytes), not an RDD-partition probe — no
    * RDD conversion, and at real scale (many files / large bytes) this
    * is a guaranteed no-op so AQE stays in charge. */
  def wide(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val (nFiles, bytes) = scanFileBytes(df)
    val maxPartitionBytes =
      spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")
        .replaceAll("[^0-9]", "").toLong
    val alreadyWide = nFiles >= p || bytes >= p * maxPartitionBytes
    if (alreadyWide) df else df.repartition(p)
  }

  /** events.parquet has shipped `ts` two ways across driver corpus
    * generations, and this loader absorbs both so every consumer sees
    * one shape — session-TZ (UTC) microsecond TimestampType:
    *  - TIMESTAMP(NANOS), which Spark's vectorized reader rejects:
    *    read nanos as raw long (runtime-settable legacy conf) and
    *    truncate — the same truncation DuckDB applies when casting, so
    *    differential results agree. Integer `div` (not `/`) avoids
    *    double-precision loss on ~1.7e18 nano values.
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false), which arrives as
    *    TIMESTAMP_NTZ: cast to TimestampType — under the UTC session
    *    the wall-clock values are unchanged, matching DuckDB's naive
    *    reading of the same column. */
  private def loadEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = loadEvents(s, d)
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
