package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkTestBase {
  import spark.implicits._

  private def mkDoc(seed: Int, words: Int): String =
    (0 until words).map(i => s"w${(seed * 31 + i * 7) % 50}").mkString(" ")

  private lazy val bench = (0 until 5)
    .map(i => (i.toLong, mkDoc(i, 30))).toDF("doc_id", "text")

  // half the corpus quotes a 13+-gram span of a benchmark doc
  private lazy val corpus = ((100 until 110).map { i =>
    (i.toLong, mkDoc(i + 50, 25))
  } ++ (200 until 205).map { i =>
    val quoted = mkDoc(i - 200, 30).split(" ").take(18).mkString(" ")
    (i.toLong, s"intro words $quoted outro")
  }).toDF("doc_id", "text")

  test("bloom-prefiltered overlap counts equal the exact broadcast path") {
    val exact = Decontaminate.overlapCounts(corpus, bench)
      .as[(Long, Long)].collect().toMap
    val bloom = Decontaminate.overlapCountsBloom(corpus, bench,
        expectedGrams = 1 << 12, fpp = 0.05)
      .as[(Long, Long)].collect().toMap
    assert(exact.nonEmpty, "fixture must produce contaminated docs")
    assert(bloom == exact)
  }

  test("a tiny, high-fpp sketch still yields the exact result") {
    // pathological sizing: false positives everywhere — verify join
    // must scrub every one of them
    val exact = Decontaminate.overlapCounts(corpus, bench)
      .as[(Long, Long)].collect().toMap
    val bloom = Decontaminate.overlapCountsBloom(corpus, bench,
        expectedGrams = 8, fpp = 0.5)
      .as[(Long, Long)].collect().toMap
    assert(bloom == exact)
  }

  test("clean corpus produces no rows on either path") {
    val clean = Seq((900L, mkDoc(999, 4))).toDF("doc_id", "text")
    assert(Decontaminate.overlapCounts(clean, bench).count() == 0L)
    assert(Decontaminate.overlapCountsBloom(clean, bench).count() == 0L)
  }
}
