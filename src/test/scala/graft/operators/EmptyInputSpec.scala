package graft.operators

import graft.SparkTestBase
import graft.streaming.EventSessions
import org.apache.spark.sql.functions._

/** Every operator must degrade to an empty (correctly-typed) result on
  * empty input — the property that makes them safe to compose in
  * pipelines where upstream filters may eliminate everything. */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")

  test("dedup operators on empty input") {
    assert(Dedup.exactKeepFirst(noDocs, "text", "doc_id").count() === 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text", 3, 0.5).count() === 0)
    assert(Dedup.minhashLshPairs(noDocs, "doc_id", "text", 3, 128, 32, 0.5).count() === 0)
    assert(Dedup.simhashNearDups(noDocs, "doc_id", "text", 3).count() === 0)
  }

  test("similarity operators on empty input") {
    assert(Similarity.bruteForceTopK(noVecs, noVecs, "vec_id", "embedding", 5)
      .count() === 0)
    assert(Similarity.cosineNearDupPairs(noVecs, "vec_id", "embedding", 0.9)
      .count() === 0)
    assert(Similarity.lshNearDupPairs(noVecs, "vec_id", "embedding", 8, 0.9, 6)
      .count() === 0)
  }

  test("as-of, range join, sampling, fuzzy dedup on empty input") {
    val noTrades = Seq.empty[(Long, Int, Long)].toDF("trade_id", "k", "t")
    val noQuotes = Seq.empty[(Int, Long, Double)].toDF("k", "q", "qv")
    assert(AsofJoin.backward(noTrades, "t", noQuotes, "q", "k").count() === 0)
    val someTrades = Seq((1L, 1, 10L)).toDF("trade_id", "k", "t")
    // empty right side: left-outer semantics keep the left rows
    assert(AsofJoin.backward(someTrades, "t", noQuotes, "q", "k").count() === 1)

    val noPts = Seq.empty[(Long, Long)].toDF("pid", "p")
    val noIvs = Seq.empty[(Long, Long, Long)].toDF("iid", "lo", "hi")
    assert(RangeJoin.pointInInterval(noPts, "p", noIvs, "lo", "hi", 8L)
      .count() === 0)

    assert(Sampling.hashSample(noDocs, "doc_id", 10, Seq(0)).count() === 0)
    assert(Sampling.stratifiedTopK(noDocs, "text", "doc_id", 5).count() === 0)
    assert(Dedup.editDistancePairs(noDocs, "doc_id", "text", 3).count() === 0)
    assert(Sampling.weightedBernoulli(noDocs, "doc_id", lit(500L))
      .count() === 0)
    // zValue is a pure column: empty input → empty, typed long
    val z = noDocs.select(
      graft.sources.Layout.zValue(col("doc_id"), col("doc_id"), 8).as("z"))
    assert(z.count() === 0 &&
      z.schema("z").dataType === org.apache.spark.sql.types.LongType)
  }

  test("containment, heavy hitters, URL canonicalization on empty input") {
    assert(Dedup.containmentPairs(noDocs, "doc_id", "text").count() === 0)
    // a global typed aggregate over zero rows still yields its zero
    // state: total 0, no candidates
    val mg = noDocs.select(col("text"))
      .agg(graft.functions.MisraGriesAgg.misraGries(8)(col("text")).as("st"))
      .select(col("st.total"), col("st.keys"))
      .as[(Long, Seq[String])].head()
    assert(mg === ((0L, Seq.empty[String])))
    val noUrls = Seq.empty[String].toDF("url")
    val c = noUrls.select(graft.functions.UrlFunctions.canonicalUrl(col("url")).as("c"))
    assert(c.count() === 0 &&
      c.schema("c").dataType === org.apache.spark.sql.types.StringType)
  }

  test("adaptive-cap dedup, langID natives, audio decode on empty input") {
    // DfCap.AdaptiveAvg: the cap aggregate over zero posting lists
    // yields a NULL cap; the <= filter then keeps nothing and the
    // pipeline composes through to an empty typed result, no crash
    assert(Dedup.ngramJaccardPairsPpm(noDocs, "doc_id", "text", 3, 500000L,
      dfCap = Dedup.DfCap.AdaptiveAvg(2)).count() === 0)
    assert(Dedup.containmentPairs(noDocs, "doc_id", "text", 3, 90,
      dfCap = Dedup.DfCap.AdaptiveAvg(4)).count() === 0)
    // langID natives: empty input → empty typed columns
    val lid = noDocs.select(
      TextAnalysis.langIdNative(col("text")).as("l"),
      TextAnalysis.langScoreNative(col("text"), "en").as("s"),
      TextAnalysis.wordCount(col("text")).as("n"))
    assert(lid.count() === 0)
    assert(lid.schema("l").dataType === org.apache.spark.sql.types.StringType)
    assert(lid.schema("s").dataType === org.apache.spark.sql.types.LongType)
    // audio decode boundary on an empty (id, binary) frame
    val noMedia = Seq.empty[(Long, Array[Byte])].toDF("doc_id", "content")
    assert(Multimodal.decodeAudio(noMedia, "doc_id", "content").count() === 0)
    assert(Multimodal.decodeImages(noMedia, "doc_id", "content").count() === 0)
    assert(Multimodal.decodeVideoFrames(noMedia, "doc_id", "content")
      .count() === 0)
  }

  test("top-per-key and sessionization on empty input") {
    val noLi = Seq.empty[(Long, Int, Double)]
      .toDF("l_orderkey", "l_linenumber", "l_extendedprice")
    assert(TopPerKey.rowNumberTopK(noLi, Seq("l_orderkey"),
      Seq(col("l_extendedprice").desc)).count() === 0)
    assert(TopPerKey.minByTop1(noLi, Seq("l_orderkey"),
      col("l_extendedprice")).count() === 0)
    val noEv = Seq.empty[(Long, Long, java.sql.Timestamp, Double)]
      .toDF("user_id", "event_id", "ts", "value")
    assert(EventSessions.sessionizeBatch(noEv, 30).count() === 0)
  }
}
