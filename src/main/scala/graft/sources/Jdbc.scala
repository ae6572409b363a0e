package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC relational extract — the reference's PostgreSQL boundary
  * (`BlueForty.py:300-321`: `psycopg2` + `COPY supplier_case TO STDOUT
  * WITH CSV` into a landing file). Spark-native, the landing file
  * disappears: `spark.read.format("jdbc")` plans the extract as a
  * datasource scan, so the rows flow straight into the pipeline.
  *
  * Scale notes: an unpartitioned JDBC read is ONE connection on one
  * executor — fine for a dimension table, a bottleneck for anything
  * big. [[Partitioning]] turns the scan into `numPartitions` range
  * predicates (`WHERE col >= lo AND col < hi`) executed concurrently,
  * which is the knob that makes a relational extract cluster-parallel;
  * `fetchSize` keeps the driver's cursor streaming instead of
  * buffering the table. Filters and column pruning still push down
  * (Catalyst compiles them into the generated SELECT).
  */
object Jdbc {

  /** Range-partitioned read spec: `column` must be numeric/date and
    * indexed for the ranges to scan cheaply on the source side. */
  final case class Partitioning(column: String, lowerBound: Long,
      upperBound: Long, numPartitions: Int)

  final case class Options(
      url: String,
      table: String,
      user: Option[String] = None,
      password: Option[String] = None,
      driver: Option[String] = None,
      partitioning: Option[Partitioning] = None,
      fetchSize: Int = 10000)

  /** Read a table (or a `(SELECT …) alias` pushdown subquery) over
    * JDBC. With [[Options.partitioning]] set the scan fans out to
    * `numPartitions` concurrent range queries. */
  def readTable(spark: SparkSession, opts: Options): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", opts.url)
      .option("dbtable", opts.table)
      .option("fetchsize", opts.fetchSize.toString)
    opts.user.foreach(u => r = r.option("user", u))
    opts.password.foreach(p => r = r.option("password", p))
    opts.driver.foreach(d => r = r.option("driver", d))
    opts.partitioning.foreach { p =>
      r = r.option("partitionColumn", p.column)
        .option("lowerBound", p.lowerBound.toString)
        .option("upperBound", p.upperBound.toString)
        .option("numPartitions", p.numPartitions.toString)
    }
    r.load()
  }

  /** The offline-friendly composition the pipeline uses: a live JDBC
    * read when a URL is configured, else the staged fixture parquet —
    * the same posture as the reference's env-var-driven PG config
    * (`BlueForty.py:301-309`) with a testable degraded mode. */
  def readTableOrFixture(spark: SparkSession, opts: Option[Options],
      fixturePath: String): DataFrame =
    opts match {
      case Some(o) => readTable(spark, o)
      case None    => spark.read.parquet(fixturePath)
    }
}
