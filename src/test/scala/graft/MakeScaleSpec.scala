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
}
