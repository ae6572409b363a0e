package graft

import org.apache.spark.sql.functions._

/** Pins MakeScale's replication contract — the tool behind the PERF.md
  * above-the-floor scale sweep. A replica corpus is only evidence if
  * its join fan-outs and distributions actually match a larger SF:
  * ids must stay unique, FK relationships must replicate copy-locally,
  * dimensions must NOT replicate, and the per-copy mutations (name
  * suffix, embedding rotation) must preserve the properties queries
  * rely on (distinct-vocabulary growth, vector norms). */
class MakeScaleSpec extends SparkTestBase {

  private val src = "/root/testdata/sf0.001"
  private lazy val dst = {
    val d = Scratch.dir("makescale_spec")
    MakeScale.run(spark, src, d, copies = 2)
    d
  }

  test("fact tables double, dimensions don't, ids stay unique") {
    for (t <- Seq("customer", "supplier", "part", "orders", "lineitem",
        "events", "documents", "embeddings")) {
      val n0 = Tables.load(spark, src, t).count()
      val n1 = Tables.load(spark, dst, t).count()
      assert(n1 === 2 * n0, s"$t should double")
    }
    for (t <- Seq("region", "nation"))
      assert(Tables.load(spark, dst, t).count() ===
        Tables.load(spark, src, t).count(), s"$t is a dimension")
    val ids = Tables.load(spark, dst, "orders").select("o_orderkey")
    assert(ids.distinct().count() === ids.count(), "orderkeys unique")
  }

  test("FK fan-out replicates copy-locally: orders⋈lineitem doubles " +
      "pairs, never crosses copies") {
    def pairs(d: String) = Tables.load(spark, d, "orders")
      .join(Tables.load(spark, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .count()
    assert(pairs(dst) === 2 * pairs(src),
      "cross-copy joins would inflate the fan-out past 2x")
  }

  test("per-copy embedding rotation preserves norms exactly") {
    val norms = Tables.load(spark, dst, "embeddings")
      .select(col("vec_id"),
        aggregate(col("embedding").cast("array<double>"), lit(0.0),
          (acc, x) => acc + x * x).as("n2"))
    val both = norms.withColumn("base_id", pmod(col("vec_id"), lit(100000000L)))
      .groupBy("base_id")
      .agg((max(col("n2")) - min(col("n2"))).as("spread"), count(lit(1)).as("n"))
      .collect()
    assert(both.forall(_.getAs[Long]("n") === 2L))
    assert(both.forall(r => math.abs(r.getAs[Double]("spread")) < 1e-9),
      "rotation must not change a vector's norm")
  }

  test("p_name suffixing grows the distinct vocabulary with the corpus") {
    val v0 = Tables.load(spark, src, "part").select("p_name").distinct().count()
    val v1 = Tables.load(spark, dst, "part").select("p_name").distinct().count()
    assert(v1 === 2 * v0, "distinct names must scale, not collapse")
  }

  private lazy val mdst = {
    val d = Scratch.dir("makescale_mut_spec")
    MakeScale.run(spark, src, d, copies = 3, mutateText = true)
    d
  }

  test("--mutate: copy 0 verbatim, copies k>0 token-renamed " +
      "consistently, n_chars recomputed") {
    val docs = Tables.load(spark, mdst, "documents")
      .select(col("doc_id"), col("text"), col("n_chars"))
    // stored-length invariant must hold on every copy
    assert(docs.filter(col("n_chars") =!= length(col("text"))).count() === 0)
    val base = docs.filter(col("doc_id") < 100000000L)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = Tables.load(spark, src, "documents")
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(base === orig, "copy 0 must stay verbatim")
    // copy k: token w renamed UNLESS xxhash64(w, k) % 4 == 0 (the
    // stable quarter) — verify the documented rule on copy 1 by
    // recomputing it from the SOURCE corpus with an independent
    // expression
    val copy1 = docs.filter(col("doc_id") >= 100000000L &&
        col("doc_id") < 200000000L)
      .select((col("doc_id") - 100000000L).as("doc_id"), col("text"))
    val expected = Tables.load(spark, src, "documents")
      .select(col("doc_id"), array_join(
        transform(split(col("text"), " "), w =>
          when(pmod(xxhash64(w, lit(1)), lit(4)) === 0, w)
            .otherwise(concat(w, lit("~1")))), " ").as("etext"))
    val diff = copy1.join(expected, "doc_id")
      .filter(col("text") =!= col("etext")).count()
    assert(diff === 0, "copy-1 must follow the documented rename rule")
  }

  test("--mutate keeps within-copy structure: exact-dup groups and " +
      "shingle Jaccard replicate per copy, dfs decorrelate across copies") {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, mdst, "documents")
      .select(col("doc_id"), col("text"),
        pmod(col("doc_id"), lit(100000000L)).as("base_id"),
        floor(col("doc_id") / 100000000L).cast("long").as("copy"))
    // injective rename ⇒ two docs equal WITHIN a copy iff their
    // originals were equal: per-copy dup-group count replicates
    // exactly (cross-copy exact survivors — short docs whose tokens
    // all escape renaming — are allowed and realistic, so the group
    // key includes the copy)
    val srcGroups = Tables.load(spark, src, "documents")
      .groupBy("text").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    val perCopyGroups = docs
      .groupBy("copy", "text").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(perCopyGroups === 3 * srcGroups,
      "within-copy exact-dup structure must replicate per copy")
    // and the per-copy pairwise-identical TEXT multiset matches: the
    // base corpus' identical pairs reappear identically in every copy
    val srcPairTexts = Tables.load(spark, src, "documents")
      .groupBy("text").agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    val copyPairTexts = docs.groupBy("copy", "text")
      .agg(count(lit(1)).as("n")).filter(col("n") > 1)
      .agg(coalesce(sum(col("n")), lit(0L))).head().getLong(0)
    assert(copyPairTexts === 3 * srcPairTexts)
    // shingle doc frequency must SPREAD over 1..3, not pin at 3 (the
    // verbatim-replica degeneracy that empties the df-capped paths)
    val dfCounts = docs
      .select(col("doc_id"),
        explode(TextAnalysis.wordShingleHashesNative(col("text"), 3)).as("sh"))
      .groupBy("sh").agg(count(lit(1)).as("df"))
      .groupBy("df").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dfCounts.keySet.exists(_ < 3), "some shingles must fall under df=3")
    assert(dfCounts.getOrElse(1L, 0L) > 0, "copy-unique shingles must exist")
  }
}
