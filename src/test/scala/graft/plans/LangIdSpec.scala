package graft.plans

import graft.SparkTestBase
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** The native one-pass language-ID must be bit-identical to the
  * relational length-replace formulation on BOTH profile sets (padded
  * stopwords and unpadded char n-grams), including the non-overlapping
  * replace subtleties (adjacent same stopwords share their boundary
  * space — ' the the the ' counts 2, not 3), the score ties, and the
  * all-zero → 'und' fallthrough — t2/x30/x10's oracle rows were
  * hash-matched with the relational version, so parity here proves the
  * swap-in is invisible. */
class LangIdSpec extends SparkTestBase {
  import spark.implicits._

  private def assertParity(texts: Seq[String]): Unit = {
    val rows = texts.toDF("text").select(
      TextAnalysis.langIdNative(col("text")).as("nid"),
      TextAnalysis.langId(col("text")).as("rid"),
      TextAnalysis.langIdCharNgramNative(col("text")).as("ngid"),
      TextAnalysis.langIdCharNgram(col("text")).as("rgid"),
      TextAnalysis.langScoreNative(col("text"), "en").cast("double").as("nsc"),
      TextAnalysis.langScore(col("text"), "en").as("rsc"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(1),
        s"word-profile langId mismatch for '${r.getString(6)}'")
      assert(r.getString(2) === r.getString(3),
        s"char-ngram langId mismatch for '${r.getString(6)}'")
      assert(r.getDouble(4) === r.getDouble(5),
        s"en score mismatch for '${r.getString(6)}'")
    }
  }

  test("edge cases match the relational formulation exactly") {
    assertParity(Seq(
      "",                                  // padded to two bare spaces
      " ",                                 // whitespace only
      "the",                               // single stopword, no padding in raw
      "the the the",                       // adjacent run: replace counts 2
      "the the the the",                   // even run: counts 2
      "a a a a a",                         // 1-char stopword runs
      "le la et les der die und das",      // fr vs de tie material
      "el los y una le la et les",         // es vs fr equal-score tie
      "theater breathe the lathe",         // 'the' as substring vs word
      "ción ción ciención",                // multi-byte char-ngram overlap
      "scharf schnell schießen",           // 'sch' + 'ch' nesting (de)
      " leading and trailing  spaces ",    // empty tokens / double spaces
      "qqq www zzz",                       // nothing → und
      "ouaitait le de de de",              // fr char-grams dense
      "ththththth",                        // overlapping 'th' run: counts 5
      "один два the три"))                 // mixed cyrillic + en
  }

  test("corpus parity on real documents (sf0.001)") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    assertParity(docs)
  }

  test("stays inside WholeStageCodegen over a parquet scan") {
    // the map stage must fuse into codegen (an interpreted fallback
    // would silently resurrect the per-row overhead the native killed)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val plan = docs.select(
        TextAnalysis.langIdNative(col("text")),
        TextAnalysis.langScoreNative(col("text"), "en"),
        TextAnalysis.wordCount(col("text")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("lang_profile_id"), plan)
    assert(plan.contains("multi_pattern_hit_count"), plan)
  }

  test("null text: langId coalesces to 'und' like the when-chain") {
    val out = Seq(Option.empty[String]).toDF("text")
      .select(TextAnalysis.langIdNative(col("text")),
        TextAnalysis.langId(col("text")),
        TextAnalysis.langScoreNative(col("text"), "en"))
      .head()
    assert(out.getString(0) === "und")
    assert(out.getString(1) === "und")
    assert(out.isNullAt(2)) // the raw score stays null-preserving
  }

  test("wordCount (native spaces+1) == size(split), corpus + edges") {
    val edges = Seq("", " ", "  ", "a", "a b", "a  b", " a b ", "x".repeat(5))
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text")).collect().map(_.getString(0)).toSeq
    val mismatch = (edges ++ corpus).toDF("text")
      .select(TextAnalysis.wordCount(col("text")).as("n"),
        TextAnalysis.wordCountSplit(col("text")).as("r"))
      .filter(col("n") =!= col("r")).count()
    assert(mismatch === 0)
  }

  test("qualityScore on the native count is bit-identical") {
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("text"))
    // relational twin of qualityScore, inlined with langScore
    val n = TextAnalysis.wordCount(col("text"))
    val lengthFactor = least(n.cast("double") / lit(100.0), lit(1.0))
    val stopDensity = least(
      TextAnalysis.langScore(col("text"), "en") /
        (n.cast("double") + lit(1.0)), lit(1.0))
    val relational = round(lengthFactor * 0.6 + stopDensity * 0.4, 6)
    val mismatch = docs.select(
        TextAnalysis.qualityScore(col("text")).as("q"),
        relational.as("r"))
      .filter(col("q") =!= col("r")).count()
    assert(mismatch === 0)
  }
}
