package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the incremental hyperplane-LSH candidate generator to its
  * contract: it equals the full [[Similarity.lshNearDupCandidates]]
  * run over corpus ∪ increment restricted to ≥1-increment pairs
  * (increment ids top the id domain, so the restriction is
  * `idb ≥ offset`) — with both candidate kinds live, corpus-internal
  * candidates absent, and the empty edges total. */
class IncrementalEmbedSpec extends SparkTestBase {
  import spark.implicits._

  private val Dim = 8

  private def vecs(rows: Seq[(Long, Seq[Float])]): DataFrame =
    rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>")
        .as("embedding"))

  private def pairSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def fullRestricted(corpus: DataFrame, increment: DataFrame,
      newFrom: Long) =
    pairSet(Similarity.lshNearDupCandidates(
        corpus.unionByName(increment), "vec_id", "embedding", Dim, 12)
      .filter(col("idb") >= newFrom))

  private def incremental(corpus: DataFrame, increment: DataFrame) =
    pairSet(Similarity.incrementalLshCandidates(
      Similarity.probedBuckets(corpus, "vec_id", "embedding", Dim, 12),
      increment, "vec_id", "embedding", Dim, 12))

  test("incremental candidates == full candidates restricted to " +
      ">=1-new, both kinds live, corpus-internal absent") {
    def unit(seed: Int): Seq[Float] = {
      val rnd = new scala.util.Random(seed)
      Seq.fill(Dim)(rnd.nextGaussian().toFloat)
    }
    def nudge(v: Seq[Float]): Seq[Float] = v.map(_ + 0.001f)
    val a = unit(1); val b = unit(2); val c = unit(3)
    val corpus = vecs(Seq(1L -> a, 2L -> b, 3L -> c))
    // 101 re-embeds vector 1 (cross pair); 102/103 both re-embed
    // vector 2 (cross pairs AND an increment-internal pair)
    val increment = vecs(Seq(
      101L -> nudge(a), 102L -> nudge(b), 103L -> nudge(nudge(b))))
    val inc = incremental(corpus, increment)
    assert(inc === fullRestricted(corpus, increment, 100L))
    assert(inc.exists { case (x, y) => x < 100L && y >= 100L },
      "increment x corpus")
    assert(inc.exists { case (x, y) => x >= 100L && y >= 100L },
      "increment-internal")
    assert(!inc.exists { case (x, y) => x < 100L && y < 100L },
      "corpus-internal candidates must not appear")
  }

  test("x36's fixture split: incremental == restricted full on the " +
      "sf0.001 embeddings, non-trivially") {
    val raw = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
      .filter(col("vec_id") < 200)
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"))
    val increment = raw.filter(col("vec_id") % 3 === 1)
      .select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"), x => x + lit(0.001f)).as("embedding"))
    val inc = pairSet(Similarity.incrementalLshCandidates(
      Similarity.probedBuckets(raw, "vec_id", "embedding", 64, 12),
      increment, "vec_id", "embedding", 64, 12))
    val full = pairSet(Similarity.lshNearDupCandidates(
        raw.unionByName(increment), "vec_id", "embedding", 64, 12)
      .filter(col("idb") >= 1000000L))
    assert(inc === full)
    assert(inc.nonEmpty, "the re-embed fixture must produce candidates")
  }

  test("empty increment and empty corpus edges") {
    val corpus = vecs(Seq(1L -> Seq.fill(Dim)(0.5f)))
    val none = corpus.filter(col("vec_id") < 0)
    assert(incremental(corpus, none).isEmpty)
    // empty corpus: increment-internal candidates still emit
    val inc = vecs(Seq(101L -> Seq.fill(Dim)(0.5f),
      102L -> Seq.fill(Dim)(0.501f)))
    assert(incremental(none, inc) === Set((101L, 102L)))
  }
}
