package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Pins x22d_topic_fitted's contract — the fixed-K SemDeDup shape that
  * has no SQL-oracle form (k-means cluster ids aren't portable to
  * DuckDB): the fitted assignment is an exact partition of the corpus,
  * the cap stage keeps exactly ⌊n/2⌋ per cluster, the same seed
  * reproduces the same output, and the FITTED codebook actually earns
  * its training pass by beating an untrained codebook of the same K on
  * the k-means objective. */
class FittedTopicSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"
  private val K = 16 // x22d's nLists

  test("x22d partitions the corpus exactly and caps at floor(n/2)") {
    val out = ExtensionQueries.x22dTopicFitted(spark, d).collect()
    val corpusN = Tables.embeddings(spark, d).count()
    assert(out.map(_.getAs[Long]("n_members")).sum === corpusN,
      "every vector must land in exactly one cluster")
    out.foreach { r =>
      val id = r.getAs[Long]("cluster_id")
      assert(id >= 0 && id < K, s"cluster id $id outside [0, $K)")
      assert(r.getAs[Long]("n_kept") === r.getAs[Long]("n_members") / 2,
        s"cluster $id: cap must keep exactly floor(n/2)")
    }
  }

  test("same seed reproduces the same kept set (within-session determinism)") {
    def snap() = ExtensionQueries.x22dTopicFitted(spark, d).collect()
      .map(r => (r.getAs[Long]("cluster_id"), r.getAs[Long]("n_members"),
        r.getAs[Long]("n_kept"), r.getAs[Long]("kept_id_sum"))).toSeq
    assert(snap() === snap())
  }

  test("fitted codebook beats an untrained same-K codebook on distortion") {
    val vecs = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      .sortBy(_._1)
    def distortion(centers: Array[Array[Double]]): Double =
      vecs.map { case (_, v) =>
        centers.map { c =>
          var s = 0.0; var i = 0
          while (i < v.length) { val t = v(i) - c(i); s += t * t; i += 1 }
          s
        }.min
      }.sum
    val emb = Tables.embeddings(spark, d).select(col("vec_id"), col("embedding"))
    val model = Similarity.fitCodebook(emb, "vec_id", "embedding",
      nLists = K, seed = 42L, trainFraction = 10)
    val fitted = distortion(model.clusterCenters.map(_.toArray))
    // the untrained strawman is the x22/x22b oracle device: codebook =
    // K arbitrary corpus vectors (the first K by vec_id)
    val untrained = distortion(vecs.take(K).map(_._2))
    assert(fitted < untrained,
      s"fitted distortion $fitted must beat untrained $untrained")
  }
}
