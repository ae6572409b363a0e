package graft.sources

import graft.{SourceQueries, SparkTestBase}

/** v2's VARIANT-array flatten semantics that the DuckDB oracle cannot
  * pin directly (it restates values, not the explode mechanics). */
class VariantSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  test("v2: ordinal is dense per event and array sizes follow user_id%3+1") {
    val out = SourceQueries.v2VariantFlatten(spark, d)
      .groupBy("event_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.min("ord").as("lo"),
        org.apache.spark.sql.functions.max("ord").as("hi"))
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, lo, hi) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(lo == 0L && hi == n - 1, s"event ${r.get(0)}: ords not dense")
      assert(n >= 1 && n <= 3)
    }
  }

  test("v2: array-mode explode yields null keys and TRY columns are null") {
    val rows = SourceQueries.v2VariantFlatten(spark, d).limit(50).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("elem_key")), "array mode ⇒ key null")
      assert(r.isNullAt(r.fieldIndex("name_as_num")), "string→bigint ⇒ null")
      assert(r.isNullAt(r.fieldIndex("absent")), "missing path ⇒ null")
      assert(r.getLong(r.fieldIndex("idx")) == r.getLong(r.fieldIndex("ord")))
    }
  }

  test("try_parse_json nulls malformed docs where parse_json throws") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq("""{"a":1}""", """{"a":""", "not json at all")
      .toDF("j")
    val out = docs
      .select(try_parse_json(col("j")).as("v"))
      .select(col("v").isNull.as("bad")).as[Boolean].collect().toSeq
    assert(out === Seq(false, true, true))
    val strict = intercept[Exception] {
      docs.select(parse_json(col("j"))).collect()
    }
    assert(strict.getMessage.toLowerCase.contains("malformed"))
  }
}
