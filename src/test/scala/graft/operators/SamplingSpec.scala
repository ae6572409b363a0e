package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {

  private lazy val docs = spark.range(1000).select(col("id").as("doc_id"),
    (col("id") % 7).cast("string").as("lang"))

  test("hash sample is invariant under repartitioning") {
    val a = Sampling.hashSample(docs, "doc_id", 10, Seq(0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(docs.repartition(13), "doc_id", 10, Seq(0))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.size > 50 && a.size < 200, s"~10% of 1000, got ${a.size}")
  }

  test("residue classes give disjoint, covering splits") {
    val parts = (0 until 10).map(r =>
      Sampling.hashSample(docs, "doc_id", 10, Seq(r))
        .select("doc_id").collect().map(_.getLong(0)).toSet)
    assert(parts.map(_.size).sum === 1000)
    assert(parts.reduce(_ ++ _).size === 1000)
  }

  test("hash accepts full-range long keys without ANSI overflow") {
    val big = spark.range(3).select(
      (col("id") * 1000000007L + 5000000000000000000L).as("doc_id"))
    // would throw ArithmeticException under ANSI with raw key*48271
    val out = big.select(Sampling.minstdHash(col("doc_id")).as("h")).collect()
    out.foreach(r => assert(r.getLong(0) >= 0 && r.getLong(0) < 2147483647L))
  }

  test("stratifiedTopK caps every stratum at k, deterministically") {
    val out = Sampling.stratifiedTopK(docs, "lang", "doc_id", 5)
    val perLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.values.forall(_ === 5L))
    val again = Sampling.stratifiedTopK(docs.repartition(7), "lang", "doc_id", 5)
    assert(out.select("doc_id").exceptAll(again.select("doc_id")).isEmpty)
  }

  test("weightedBernoulli keeps ≈w/1000 of rows, clamps, and is exact") {
    // weight 500 milli on every row → expect ~half kept, invariant
    // under repartitioning, with the exact HT inverse weight
    val w500 = Sampling.weightedBernoulli(docs, "doc_id", lit(500L))
    val kept = w500.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept.size > 400 && kept.size < 600, s"~500 of 1000, got ${kept.size}")
    val again = Sampling
      .weightedBernoulli(docs.repartition(11), "doc_id", lit(500L))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept === again)
    assert(w500.select("inv_w_micro").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(2000000L))
    // clamp: weight ≤ 0 → floor 1 milli (near-never kept, HT = 1e9);
    // weight ≥ 999 → cap 999 (kept unless hash lands in the top bin)
    val lo = Sampling.weightedBernoulli(docs, "doc_id", lit(-5L))
    assert(lo.count() <= 5)
    val hi = Sampling.weightedBernoulli(docs, "doc_id", lit(5000L))
    assert(hi.count() >= 990)
    assert(hi.select("w_milli").distinct().collect()
      .map(_.getLong(0)).toSeq === Seq(999L))
  }
}
