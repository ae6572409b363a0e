package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class ObserveSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("quality metrics ride the job's own pass and match a direct agg") {
    val docs = Tables.documents(spark, sf)
    val (observed, obs) = Observe.withQualityMetrics(
      docs, Seq("text", "lang"),
      Map(
        "short_docs" -> (col("n_chars") < 50),
        "bad_lang" -> !col("lang").isin("en", "de", "es", "fr", "zh")))
    val n = observed.count() // the action the pipeline runs anyway
    val m = obs.get
    assert(m("n_rows") === n)
    assert(m("text_nulls") === 0L)
    assert(m("lang_nulls") === 0L)
    val expectShort = docs.filter(col("n_chars") < 50).count()
    assert(m("short_docs") === expectShort)
    assert(m("bad_lang") === 0L)
  }

  test("metrics survive a write action (the real pipeline shape)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_obs").toString
    val (observed, obs) = Observe.withQualityMetrics(
      Tables.nation(spark, sf), Seq("n_name"))
    observed.write.mode("overwrite").format("noop").save(dir)
    assert(obs.get("n_rows") === 25L)
    assert(obs.get("n_name_nulls") === 0L)
  }
}
