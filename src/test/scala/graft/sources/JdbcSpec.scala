package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.sql.DriverManager

/** Exercises the JDBC boundary against an in-JVM Derby database (the
  * derby jars ship with Spark) — a real driver, real connections, no
  * network: proves the S8 code path end-to-end including the
  * range-partitioned parallel read and predicate pushdown. */
class JdbcSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graft_jdbc;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE supplier_case") catch { case _: Exception => () }
      st.execute(
        """CREATE TABLE supplier_case (
          | id INT NOT NULL, name VARCHAR(64), zip VARCHAR(10), bal DOUBLE)""".stripMargin)
      val ps = conn.prepareStatement(
        "INSERT INTO supplier_case VALUES (?, ?, ?, ?)")
      (1 to 100).foreach { i =>
        ps.setInt(1, i); ps.setString(2, s"Supplier $i")
        ps.setString(3, f"${90000 + i}%05d"); ps.setDouble(4, i * 10.5)
        ps.addBatch()
      }
      ps.executeBatch()
      st.close(); ps.close()
    } finally conn.close()
  }

  test("readTable: full unpartitioned extract round-trips") {
    seed()
    val df = Jdbc.readTable(spark, Jdbc.Options(url, "supplier_case"))
    assert(df.count() === 100)
    assert(df.columns.map(_.toLowerCase).toSet === Set("id", "name", "zip", "bal"))
    val r42 = df.filter(col("ID") === 42).collect()
    assert(r42.length === 1 && r42(0).getAs[String]("ZIP") === "90042")
  }

  test("readTable: range partitioning fans the scan out and loses no rows") {
    seed()
    val df = Jdbc.readTable(spark, Jdbc.Options(url, "supplier_case",
      partitioning = Some(Jdbc.Partitioning("ID", 1, 101, 4))))
    assert(df.rdd.getNumPartitions === 4) // one range predicate per partition
    assert(df.count() === 100)            // ranges cover everything, no dups
    assert(df.agg(sum(col("ID"))).head().getLong(0) === 5050L)
  }

  test("readTable: filter + projection push into the generated query") {
    seed()
    val df = Jdbc.readTable(spark, Jdbc.Options(url, "supplier_case"))
      .filter(col("ID") > 90).select("ID", "NAME")
    assert(df.count() === 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"),
      s"expected pushed filter in plan:\n$plan")
  }

  test("readTableOrFixture: no URL configured falls back to the fixture") {
    val dir = graft.Scratch.dir("graft_jdbc_fixture")
    spark.range(5).select(col("id").as("supplier_id"))
      .write.mode("overwrite").parquet(dir)
    val df = Jdbc.readTableOrFixture(spark, None, dir)
    assert(df.count() === 5)
  }
}
