package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over an `array<float>` embedding column:
  * brute-force cosine top-k as the exact baseline, and deterministic
  * hyperplane-LSH bucketing as the scale path.
  *
  * Scale design: brute force is O(|queries|·|corpus|·dim) — fine when
  * the query side broadcasts (it is per-query-row parallel and never
  * shuffles the corpus). The LSH variant buckets the corpus once
  * (map-only), so each query only meets its bucket's candidates —
  * the standard recall/cost trade; both share the same rerank code.
  * The hot-path cosine is a native codegen'd Catalyst expression
  * (org.apache.spark.sql.graft.CosineSimilarity); bucketing and the
  * reference dot/norm helpers use built-in higher-order functions.
  */
object Similarity {

  /** dot(a,b) in double (higher-order-function formulation — portable
    * but interpreted; prefer [[cosine]] for the hot path). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine over `array<float>` via the native codegen'd
    * [[graft.plans.CosineSimilarity]] expression (fused loop inside
    * whole-stage codegen; the HOF variant below runs interpreted). */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnShim.column(
      org.apache.spark.sql.graft.CosineSimilarity(
        org.apache.spark.sql.graft.ColumnShim.expression(a),
        org.apache.spark.sql.graft.ColumnShim.expression(b)))

  /** Interpreted HOF cosine — reference implementation for testing. */
  def cosineHof(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact brute-force cosine top-k: every query row against the whole
    * corpus. Queries are broadcast (small side); ranking tie-breaks on
    * neighbor id for determinism. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("_qv"), col("_cv")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** Deterministic pseudo-random hyperplane weight for (plane, dim):
    * xxhash64 folded into [-1, 1]. No RNG state — reproducible across
    * runs and engines that share xxhash64. */
  private def planeWeight(plane: Int, dim: Column): Column =
    (pmod(xxhash64(lit(plane), dim), lit(2000001)).cast("double") -
      lit(1000000.0)) / lit(1000000.0)

  /** Sign-bit bucket id from `nPlanes` hyperplanes — vectors in the
    * same bucket are likely neighbors (cosine LSH). Map-only. */
  def lshBucket(vec: Column, dim: Int, nPlanes: Int = 12): Column =
    (0 until nPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec,
          transform(sequence(lit(0), lit(dim - 1)), i => planeWeight(p, i)),
          (x, w) => x * w),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: candidates limited to the query's LSH bucket,
    * then exact cosine rerank. Multi-probe (probes>1) flips the lowest
    * bits to widen recall. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, nPlanes: Int = 12,
      probes: Int = 2): DataFrame = {
    val cb = corpus.select(col(idCol).as("neighbor_id"),
      col(vecCol).as("_cv"),
      lshBucket(col(vecCol), dim, nPlanes).as("_bucket"))
    val qb0 = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("_qv"),
      lshBucket(col(vecCol), dim, nPlanes).as("_qbucket"))
    // multi-probe: also look in buckets differing in one low bit
    val qb = qb0.select(col("query_id"), col("_qv"),
      explode(array((0 until probes).map(p =>
        col("_qbucket").bitwiseXOR(lit(p.toLong))): _*)).as("_bucket"))
      .distinct()
    val scored = broadcast(qb)
      .join(cb, Seq("_bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        cosine(col("_qv"), col("_cv")).as("cos"))
      .groupBy("query_id", "neighbor_id").agg(first(col("cos")).as("cos"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }

  /** All pairs (a<b) with cosine ≥ threshold within `df` — embedding
    * near-dup detection. Exact; O(n²·dim), so use on a bucketed or
    * sampled candidate set (pair with [[lshBucket]] at scale). */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val a = df.select(col(idCol).as("ida"), col(vecCol).as("_va"))
    val b = df.select(col(idCol).as("idb"), col(vecCol).as("_vb"))
    a.join(b, col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        cosine(col("_va"), col("_vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
