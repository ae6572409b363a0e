package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import TextAnalysis._
  import spark.implicits._

  test("wordShingles: distinct n-grams, short docs empty") {
    val out = Seq("a b c d", "a b c a b c", "x y").toDF("t")
      .select(wordShingles(col("t"), 3)).collect().map(_.getSeq[String](0))
    assert(out(0).toSet === Set("a b c", "b c d"))
    assert(out(1).toSet === Set("a b c", "b c a", "c a b")) // distinct
    assert(out(2).isEmpty)
  }

  test("scrubPii: every email and phone redacted, counts match, " +
      "clean text untouched") {
    val rows = Seq(
      "mail a@b.com and c.d+e@f.co.uk twice",
      "call 555-123-4567 or 555-987-6543",
      "nothing sensitive here",
      "mixed x@y.io and 111-222-3333").toDF("t")
      .select(scrubPii(col("t")).as("s"),
        countPattern(col("t"), EmailPattern).as("ne"),
        countPattern(col("t"), PhonePattern).as("np"))
      .collect()
    assert(rows(0).getString(0) === "mail [EMAIL] and [EMAIL] twice")
    assert(rows(0).getLong(1) === 2 && rows(0).getLong(2) === 0)
    assert(rows(1).getString(0) === "call [PHONE] or [PHONE]")
    assert(rows(1).getLong(2) === 2)
    assert(rows(2).getString(0) === "nothing sensitive here")
    assert(rows(3).getString(0) === "mixed [EMAIL] and [PHONE]")
  }

  test("token counts: whitespace vs BPE-ish") {
    val out = Seq("the quick-brown fox 42 !").toDF("t")
      .select(wordCount(col("t")), tokenCountBpeIsh(col("t"))).head()
    assert(out.getLong(0) === 5)     // whitespace tokens
    assert(out.getLong(1) === 7)     // the,quick,-,brown,fox,42,!
  }

  test("paddedHits counts word occurrences, not substrings") {
    val out = Seq("the theme of the day").toDF("t")
      .select(paddedHits(col("t"), "the")).head()
    assert(out.getDouble(0) === 2.0) // 'theme' does not count
  }

  test("langId picks dominant stopword profile with precedence tiebreak") {
    val out = Seq(
      "the cat and the dog of a house",   // en
      "le chat et la maison et les toits", // fr
      "der hund und die katze und das haus", // de
      "qqq www zzz")                       // none -> und
      .toDF("t").select(langId(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq === Seq("en", "fr", "de", "und"))
  }

  test("langIdCharNgram: char-profile argmax, substring hits exact") {
    val hits = Seq("think the thing").toDF("t")
      .select(substringHits(col("t"), "th")).head().getDouble(0)
    assert(hits === 3.0)
    val out = Seq(
      "the thing he thought was thin",   // th/he heavy → en
      "schnell der rauch der eiche",     // sch/ei/ der → de
      "1234 5678")                       // nothing → und
      .toDF("t").select(langIdCharNgram(col("t"))).collect().map(_.getString(0))
    assert(out.toSeq === Seq("en", "de", "und"))
  }

  test("fingerprints: whitespace-insensitive, case-insensitive") {
    val out = Seq(("A  B\tC", "a b c"), ("x", "y")).toDF("p", "q")
      .select(fingerprintMd5(col("p")) === fingerprintMd5(col("q")),
        fingerprint64(col("p")) === fingerprint64(col("q"))).collect()
    assert(out(0).getBoolean(0) && out(0).getBoolean(1))
    assert(!out(1).getBoolean(0) && !out(1).getBoolean(1))
  }

  test("contentFingerprints: edit-local sketch, resemblance ordering") {
    val base = "the quick brown fox jumps over the lazy dog repeatedly today"
    val near = base.replace("lazy", "hazy")     // one local edit
    val far = "completely different content about distributed query engines"
    val rows = Seq((1L, base), (2L, base), (3L, near), (4L, far)).toDF("id", "t")
      .select(col("id"), contentFingerprints(col("t")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(rows(1L) === rows(2L))               // identical text → same sketch
    def resemblance(a: Set[Long], b: Set[Long]) =
      if (a.isEmpty && b.isEmpty) 1.0
      else (a intersect b).size.toDouble / (a union b).size
    assert(resemblance(rows(1L), rows(3L)) > 0.5)  // local edit: high overlap
    assert(resemblance(rows(1L), rows(3L)) > resemblance(rows(1L), rows(4L)))
  }

  test("qualityScore in [0,1], increases with stopword density") {
    val out = Seq(
      "the of and a the of and a the of",
      "zz yy xx ww vv uu tt ss rr qq")
      .toDF("t").select(qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(out.forall(v => v >= 0.0 && v <= 1.0))
    assert(out(0) > out(1))
  }
}
