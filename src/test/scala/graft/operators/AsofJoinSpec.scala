package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val trades = Seq(
    (1L, 1, 10L, 100.0),
    (2L, 1, 20L, 200.0),
    (3L, 1, 5L, 50.0),   // before any quote
    (4L, 2, 15L, 150.0),
    (5L, 3, 30L, 300.0)  // key with no quotes at all
  ).toDF("trade_id", "k", "t", "tv")

  private lazy val quotes = Seq(
    (1, 10L, 7.0),  // equal-ts match for trade 1
    (1, 15L, 8.0),
    (2, 1L, 9.0),
    (2, 14L, 11.0)
  ).toDF("k", "q", "qv")

  private def rows(df: DataFrame): Set[(Long, Option[Long], Option[Double])] =
    df.select(col("trade_id"), col("q"), col("qv")).collect().map { r =>
      (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getLong(1)),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))
    }.toSet

  test("backward: latest quote at-or-before, equality included, left outer") {
    val out = rows(AsofJoin.backward(trades, "t", quotes, "q", "k"))
    assert(out === Set(
      (1L, Some(10L), Some(7.0)),   // ts tie → matches
      (2L, Some(15L), Some(8.0)),
      (3L, None, None),             // nothing at or before
      (4L, Some(14L), Some(11.0)),
      (5L, None, None)))            // key absent from right
  }

  test("forward: earliest quote at-or-after") {
    val out = rows(AsofJoin.forward(trades, "t", quotes, "q", "k"))
    assert(out === Set(
      (1L, Some(10L), Some(7.0)),
      (2L, None, None),             // no quote after t=20 for k=1
      (3L, Some(10L), Some(7.0)),
      (4L, None, None),             // k=2 quotes are all before t=15
      (5L, None, None)))
  }

  test("tolerance drops stale matches") {
    val out = rows(AsofJoin.backward(trades, "t", quotes, "q", "k",
      tolerance = Some(lit(1L))))
    assert(out === Set(
      (1L, Some(10L), Some(7.0)),   // distance 0
      (2L, None, None),             // distance 5 > 1
      (3L, None, None),
      (4L, Some(14L), Some(11.0)),  // distance 1
      (5L, None, None)))
  }

  test("matches brute-force argmax on a generated corpus") {
    val l = spark.range(500).select(col("id").as("lid"),
      (col("id") % 17).as("k"), ((col("id") * 37) % 1000).as("t"))
    val r = spark.range(200).select((col("id") % 17).as("k"),
      ((col("id") * 53) % 1000).as("q"), (col("id") * 2).as("rv"))
      .groupBy("k", "q").agg(max("rv").as("rv"))
    val fast = AsofJoin.backward(l, "t", r, "q", "k")
      .select(col("lid"), col("q"), col("rv"))
    // brute force: inequality join + row_number argmax
    val cand = l.join(r.toDF("k2", "q", "rv"),
      col("k") === col("k2") && col("t") >= col("q"), "left_outer")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lid").orderBy(col("q").desc_nulls_last)
    val slow = cand.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).select(col("lid"), col("q"), col("rv"))
    assert(fast.exceptAll(slow).isEmpty && slow.exceptAll(fast).isEmpty)
  }

  test("null timestamps never match (SQL comparison semantics)") {
    val nullQuotes = Seq((1, Option.empty[Long], 7.0), (1, Some(15L), 8.0))
      .toDF("k", "q", "qv")
    val nullTrades = Seq((9L, 1, Option.empty[Long], 0.0))
      .toDF("trade_id", "k", "t", "tv")
    // null-ts right row must not win for an early left row (backward)
    val back = rows(AsofJoin.backward(trades, "t", nullQuotes, "q", "k"))
    assert(back.contains((3L, None, None)), s"t=5 matched a null quote: $back")
    // null-ts left row must get a null match, even under forward's
    // descending sort (where nulls-last would otherwise see every row)
    val fwd = rows(AsofJoin.forward(nullTrades, "t", quotes, "q", "k"))
    assert(fwd === Set((9L, None, None)))
  }

  test("colliding right column names are rejected") {
    intercept[IllegalArgumentException] {
      AsofJoin.backward(trades, "t", trades, "t", "k")
    }
  }
}
