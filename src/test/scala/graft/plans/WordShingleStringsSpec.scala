package graft.plans

import graft.SparkTestBase
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The native string-shingle generator must be element-identical to
  * the composed-builtins wordShingles (same split-on-single-space word
  * semantics, same space-joined gram text, same first-occurrence dedup
  * order) — x12's oracle recomputes the gram strings in SQL, so parity
  * here proves the native swap-in is invisible. */
class WordShingleStringsSpec extends SparkTestBase {
  import spark.implicits._

  private def assertParity(texts: Seq[String], n: Int): Unit = {
    val rows = texts.toDF("text").select(
      TextAnalysis.wordShinglesNative(col("text"), n).as("native"),
      TextAnalysis.wordShingles(col("text"), n).as("hof")).collect()
    rows.zip(texts).foreach { case (r, t) =>
      assert(r.getSeq[String](0) === r.getSeq[String](1),
        s"mismatch for n=$n text='$t'")
    }
  }

  test("edge cases match the HOF formulation exactly") {
    val texts = Seq(
      "a b c d e",
      "a b",                    // fewer words than n=3 → empty
      "",                       // empty text = one empty word
      "  leading and  double  spaces ", // empty tokens + trailing space
      "x x x x x x",            // duplicate shingles → dedup path
      "один два три четыре",    // multi-byte UTF-8
      "a"
    )
    Seq(1, 2, 3, 5).foreach(n => assertParity(texts, n))
  }

  test("corpus parity on real documents (sf0.001)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    assertParity(docs, 3)
  }

  test("null text yields null") {
    val out = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.wordShinglesNative(col("text"), 3)).head()
    assert(out.isNullAt(0))
  }
}
