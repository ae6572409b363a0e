package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamEnrichSpec extends SparkTestBase {

  private val dimRows = Seq((1L, 10L), (2L, 20L)) // custkey -> nationkey
  private val evRows = Seq( // (event_id, user_id, value)
    (100L, 1L, 5.0), (101L, 1L, 7.0), (102L, 2L, 1.0),
    (103L, 9L, 2.0)) // user 9 has no dimension row (late dimension)

  test("stream-static enrichment == batch, keeps unmatched events") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val dim = dimRows.toDF("c_custkey", "c_nationkey")
    def rollup(df: org.apache.spark.sql.DataFrame) =
      StreamEnrich.withDimension(df, dim, "user_id", "c_custkey")
        .groupBy(coalesce(col("c_nationkey"), lit(-1L)).as("nation"))
        .agg(count(lit(1)).as("n"), sum("value").as("sv"))

    val batch = rollup(evRows.toDF("event_id", "user_id", "value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(batch === Set((10L, 2L, 12.0), (20L, 1L, 1.0), (-1L, 1L, 2.0)))

    val mem = MemoryStream[(Long, Long, Double)](31)
    val q = rollup(mem.toDF().toDF("event_id", "user_id", "value"))
      .writeStream.format("memory").queryName("se_test")
      .outputMode("complete").start()
    try {
      mem.addData(evRows: _*)
      q.processAllAvailable()
      val streamed = spark.table("se_test").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(streamed === batch)
      // the join itself must be stateless (broadcast into each
      // micro-batch) — the only state operator is the aggregation,
      // never a symmetric-hash stream-stream join
      assert(q.lastProgress.stateOperators.forall(op =>
        !String.valueOf(op.operatorName).contains("symmetricHashJoin")))
    } finally q.stop()
  }
}
