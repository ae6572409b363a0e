package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the incremental near-dup listing to its semantic contract:
  * it equals the FULL-corpus pair recompute restricted to pairs with
  * ≥1 increment side — on a handcrafted corpus exercising both pair
  * kinds (new×old and new×new), on the real fixture split x32 ships,
  * and on the empty-side edges. The point of the operator is what it
  * does NOT compute (corpus×corpus pairs), which no output check can
  * see — the plan-shape guarantee lives in the only-old list filter
  * (`size(_lstn) >= 1`) upstream of both generators, and this spec
  * proves dropping those shingles loses no required pair. */
class IncrementalNearDupSpec extends SparkTestBase {
  import spark.implicits._

  private val Thresh = 500000L

  private def pairSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def fullRestricted(corpus: DataFrame, increment: DataFrame,
      cap: Dedup.DfCap, newFrom: Long) = {
    val union = corpus.unionByName(increment)
    pairSet(Dedup.ngramJaccardPairsPpm(union, "doc_id", "text", 3, Thresh, cap)
      .filter(col("ida") >= newFrom || col("idb") >= newFrom))
  }

  test("incremental == full recompute restricted to >=1-new pairs, " +
      "with both new-x-old and new-x-new pairs present") {
    // Corpus docs 1,2 are near-dups of each other (an old×old pair the
    // incremental listing must NOT emit); increment 101 re-crawls doc 1
    // (new×old), increment 102 and 103 are near-dups of each other but
    // of nothing old (new×new). Distinct filler words keep dfs low so
    // no cap interferes (NoCap here; the cap case is the next test).
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val corpus = Seq(
      (1L, base + " lambda mu"),
      (2L, base + " lambda nu"),
      (3L, "totally different words about completely other topics here now")
    ).toDF("doc_id", "text")
    val increment = Seq(
      (101L, base + " lambda"),          // prefix re-crawl of doc 1
      (102L, "shared tail one two three four five six seven eight nine"),
      (103L, "shared tail one two three four five six seven eight ten")
    ).toDF("doc_id", "text")
    val inc = pairSet(Dedup.incrementalJaccardPairsPpm(
      corpus, increment, "doc_id", "text", 3, Thresh, Dedup.DfCap.NoCap))
    assert(inc === fullRestricted(corpus, increment, Dedup.DfCap.NoCap, 100L))
    assert(inc.exists { case (a, b, _) => a < 100L && b >= 100L }, "new x old")
    assert(inc.exists { case (a, b, _) => a >= 100L && b >= 100L }, "new x new")
    assert(!inc.exists { case (a, b, _) => a < 100L && b < 100L },
      "corpus-internal pairs must not appear")
  }

  test("x32's fixture split: incremental == restricted full recompute " +
      "under the density-adaptive cap, non-trivial on sf0.001") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val ws = split(col("text"), " ")
    val k = expr("cast((size(split(text, ' ')) * 9 + 9) div 10 as int)")
    val increment = docs.filter(col("doc_id") % 9 === 4)
      .select((col("doc_id") + 5000000000000L).as("doc_id"),
        array_join(slice(ws, lit(1), k), " ").as("text"))
    val cap = Dedup.DfCap.AdaptiveAvg(2)
    val inc = pairSet(Dedup.incrementalJaccardPairsPpm(
      docs, increment, "doc_id", "text", 3, Thresh, cap))
    assert(inc === fullRestricted(docs, increment, cap, 5000000000000L))
    assert(inc.nonEmpty, "the 90%-prefix re-crawl must land above 0.5")
  }

  test("x37's containment twin: incremental directed containment == " +
      "full capped containment restricted to >=1-new, non-trivial") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val ws = split(col("text"), " ")
    val k = expr("cast((size(split(text, ' ')) * 9 + 9) div 10 as int)")
    val increment = docs.filter(col("doc_id") % 9 === 4)
      .select((col("doc_id") + 5000000000000L).as("doc_id"),
        array_join(slice(ws, lit(1), k), " ").as("text"))
    val cap = Dedup.DfCap.AdaptiveAvg(4)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val inc = rows(Dedup.incrementalContainmentPairs(
      docs, increment, "doc_id", "text", 3, 90, cap))
    val full = rows(Dedup.containmentPairs(
        docs.unionByName(increment), "doc_id", "text", 3, 90, cap)
      .filter(col("id_sub") >= 5000000000000L ||
        col("id_super") >= 5000000000000L))
    assert(inc === full)
    assert(inc.exists(_._1 >= 5000000000000L),
      "the 90% prefix re-crawl must appear as a SUB of its source")
    // the from-index form (x37b) is row-identical
    val fromIdx = rows(Dedup.incrementalContainmentPairsFromIndex(
      Dedup.postingIndex(docs, "doc_id", "text", 3), increment,
      "doc_id", "text", 3, 90, cap))
    assert(fromIdx === inc)
  }

  test("empty increment: no pairs; empty corpus: exactly the " +
      "increment-internal pairs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta"),
      (2L, "alpha beta gamma delta epsilon zeta nu")
    ).toDF("doc_id", "text")
    val none = spark.emptyDataset[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.incrementalJaccardPairsPpm(
      docs, none, "doc_id", "text", 3, Thresh, Dedup.DfCap.NoCap).count() === 0)
    val selfOnly = pairSet(Dedup.incrementalJaccardPairsPpm(
      none, docs, "doc_id", "text", 3, Thresh, Dedup.DfCap.NoCap))
    assert(selfOnly === pairSet(Dedup.ngramJaccardPairsPpm(
      docs, "doc_id", "text", 3, Thresh, Dedup.DfCap.NoCap)))
    assert(selfOnly.nonEmpty)
  }
}
