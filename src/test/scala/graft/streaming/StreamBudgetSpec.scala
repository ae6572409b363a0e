package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

class StreamBudgetSpec extends SparkTestBase {

  private def t(s: String) = Timestamp.valueOf(s)

  // cap 100: en admits 40+50=90, then 20 overflows (110) and — prefix
  // cut — the later 5 stays rejected too (115); fr's first doc alone
  // overflows (120), everything after stays rejected
  private val batch1 = Seq(
    BudgetDoc("en", 1L, 40L, t("2024-01-01 00:00:01")),
    BudgetDoc("en", 2L, 50L, t("2024-01-01 00:00:02")),
    BudgetDoc("fr", 3L, 120L, t("2024-01-01 00:00:03")))
  private val batch2 = Seq(
    BudgetDoc("en", 4L, 20L, t("2024-01-01 00:00:04")),
    BudgetDoc("fr", 5L, 10L, t("2024-01-01 00:00:05")),
    BudgetDoc("en", 6L, 5L, t("2024-01-01 00:00:06")))

  test("streaming admission == batch prefix cut; state carries across triggers") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val expect = StreamBudget.batch(
        (batch1 ++ batch2).toDF("key", "doc_id", "n_tok", "ts"), 100L)
      .as[BudgetAdmit].collect().toSet

    val mem = MemoryStream[BudgetDoc](21)
    val q = StreamBudget.streaming(mem.toDS(), 100L)
      .writeStream.format("memory").queryName("sb_test")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*)
      q.processAllAvailable() // trigger 1: state left at en=90, fr=120
      mem.addData(batch2: _*)
      q.processAllAvailable() // trigger 2 consumes carried state
      val streamed = spark.table("sb_test").as[BudgetAdmit].collect().toSet
      assert(streamed === expect)
      val admitted = streamed.filter(_.admitted).map(_.doc_id)
      assert(admitted === Set(1L, 2L)) // prefix cut: 4 and 6 rejected
    } finally q.stop()
  }

  test("sub-millisecond event times order like the batch twin (µs precision)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // Same key, same MILLISECOND, µs order opposing doc_id order: the
    // batch window sorts the full µs ts column, so the streaming sort
    // must use Timestamp's natural (seconds, nanos) order — a
    // getTime-only sort ties here and falls back to doc_id, admitting
    // the wrong document.
    val subMs = Seq(
      BudgetDoc("en", 11L, 60L, t("2024-01-01 00:00:01.000900")),
      BudgetDoc("en", 12L, 60L, t("2024-01-01 00:00:01.000400")))
    val expect = StreamBudget.batch(
        subMs.toDF("key", "doc_id", "n_tok", "ts"), 100L)
      .as[BudgetAdmit].collect().toSet
    assert(expect.filter(_.admitted).map(_.doc_id) === Set(12L))
    val mem = MemoryStream[BudgetDoc](23)
    val q = StreamBudget.streaming(mem.toDS(), 100L)
      .writeStream.format("memory").queryName("sb_subms")
      .outputMode("append").start()
    try {
      mem.addData(subMs: _*)
      q.processAllAvailable()
      val streamed = spark.table("sb_subms").as[BudgetAdmit].collect().toSet
      assert(streamed === expect)
    } finally q.stop()
  }

  test("within one trigger, out-of-order arrival is resolved by event time") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    // arrival order reversed; event-time order must decide admission
    val mem = MemoryStream[BudgetDoc](22)
    val q = StreamBudget.streaming(mem.toDS(), 100L)
      .writeStream.format("memory").queryName("sb_order")
      .outputMode("append").start()
    try {
      mem.addData(batch1.reverse: _*)
      q.processAllAvailable()
      val streamed = spark.table("sb_order").as[BudgetAdmit].collect()
      assert(streamed.filter(_.admitted).map(_.doc_id).toSet === Set(1L, 2L))
      assert(streamed.find(_.doc_id == 2L).get.cum_tok === 90L)
    } finally q.stop()
  }
}
