package graft

import org.apache.spark.sql.functions._

/** Structural invariants for the round-3 curation queries (value-level
  * correctness is the driver's DuckDB oracle; these pin the properties
  * the oracle can't state). */
class CurationQueriesSpec extends SparkTestBase {

  private val d = "/root/testdata/sf0.001"

  // Property pin for round 5's cap-stage refactor: capHalfPerCluster
  // must equal the brute-force definition — sort each cluster's
  // members by (minstd(vec_id), vec_id), keep the first ⌊n/2⌋ — on
  // adversarial shapes (a dominant cluster, singletons, empty-keep
  // two-member clusters).
  test("capHalfPerCluster equals the brute-force ⌊n/2⌋ prefix, incl. a hot cluster") {
    import spark.implicits._
    // 40% of ids on cluster 0, rest spread thin (many 1-2 member
    // clusters — the n_kept=0 edge)
    val ids = (1L to 500L)
    val assigned = ids.map(i => (i, if (i % 5 < 2) 0L else i % 211))
      .toDF("vec_id", "cluster_id")
    val h = assigned
      .select(col("vec_id"),
        graft.operators.Sampling.minstdHash(col("vec_id")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = ids.map(i => (i, if (i % 5 < 2) 0L else i % 211))
      .groupBy(_._2).map { case (c, members) =>
        val order = members.map(_._1).sortBy(v => (h(v), v))
        val kept = order.take(order.size / 2)
        c -> (order.size.toLong, kept.size.toLong, kept.sum)
      }
    val got = ExtensionQueries.capHalfPerCluster(assigned).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(got === expect)
    assert(got.values.exists(_._2 == 0L), "fixture should include n_kept=0 clusters")
  }

  // The adversarial crawl case t13's doc claims to survive: a corpus
  // of unique-token spam, where the vocabulary is O(corpus) and any
  // forced-broadcast vocab join would OOM at scale. The unhinted join
  // must stay correct (AQE picks the strategy) — values checked from
  // first principles: 1000 singleton tokens → share_ppm = 10⁶·1 div
  // 1000 = 1000, every token rare (200·1 < 1000).
  test("t13 degenerate corpus: every token unique (vocabulary = corpus)") {
    import spark.implicits._
    def w(i: Int): String = {
      var n = i; val sb = new StringBuilder("t")
      do { sb.append(('a' + n % 26).toChar); n /= 26 } while (n > 0)
      sb.toString
    }
    val docs = (0 until 200)
      .map(d => (d.toLong, (0 until 5).map(k => w(d * 5 + k)).mkString(" ")))
      .toDF("doc_id", "text")
    val out = ExtensionQueries.t13TokenRarityOn(docs).collect()
    assert(out.length == 200)
    out.foreach { r =>
      assert(r.getLong(1) == 5 && r.getLong(2) == 1000 && r.getLong(3) == 5,
        s"doc ${r.getLong(0)}: $r")
    }
  }

  // The other spam axis: a delimiterless blob must not become the
  // shuffle row — the 64-char tokenization cap (stated in BOTH
  // engines' tokenizers) drops it.
  test("t13 length cap drops a delimiterless blob token") {
    import spark.implicits._
    val docs = Seq((1L, "aa bb " + "c" * 100)).toDF("doc_id", "text")
    val r = ExtensionQueries.t13TokenRarityOn(docs).head()
    assert(r.getLong(1) == 2 && r.getLong(2) == 500000 && r.getLong(3) == 0)
  }

  // first principles: c(a·)=3 across docs 1-3, c(a,b)=2, c(a,c)=1 →
  // cond_ppm 666666 / 666666 / 333333; only (a,c) is corpus-novel;
  // the single-token doc has no bigrams and must be absent.
  test("t14 bigram LM: cross-doc conditional ppm and novel transitions") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "q"))
      .toDF("doc_id", "text")
    val out = ExtensionQueries.t14BigramLmOn(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out === Map(
      1L -> (1L, 666666L, 0L),
      2L -> (1L, 666666L, 0L),
      3L -> (1L, 333333L, 1L)))
  }

  test("t14 re-indexes after the token filter: a dropped blob token " +
      "does not break the bigram chain") {
    import spark.implicits._
    // "aa <100-char blob> bb": the blob is dropped by the 64-char cap,
    // so (aa, bb) must still form a bigram
    val docs = Seq((1L, "aa " + "c" * 100 + " bb")).toDF("doc_id", "text")
    val r = ExtensionQueries.t14BigramLmOn(docs).head()
    assert(r.getLong(1) === 1L && r.getLong(2) === 1000000L &&
      r.getLong(3) === 1L)
  }

  test("x19: every distinct chunk is kept exactly once, globally") {
    val out = ExtensionQueries.x19PassageDedup(spark, d)
    val totalKept = out.agg(sum("n_kept")).head().getLong(0)
    // independent recount of distinct chunk hashes (different plan
    // shape: no join-back, just the distinct aggregate)
    val W = 16
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val nChunks =
      (floor(greatest(size(col("ws")) - 1, lit(0)).cast("double") / W)
        .cast("int") + 1)
    val distinctChunks = docs
      .select(col("ws"), explode(sequence(lit(0), nChunks - 1)).as("k"))
      .select(md5(array_join(slice(col("ws"), col("k") * W + 1, lit(W)), " "))
        .as("h"))
      .agg(countDistinct(col("h"))).head().getLong(0)
    assert(totalKept === distinctChunks)
    // and nobody keeps more chunks than they have
    assert(out.filter(col("n_kept") > col("n_chunks")).isEmpty)
  }

  test("x20: the cap binds per source and the admit order is stable") {
    val out = ExtensionQueries.x20SourceBudget(spark, d).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nDocs, nKept) = (r.getLong(1), r.getLong(2))
      val (kept, total) = (r.getLong(3), r.getLong(4))
      assert(kept * 2 <= total, s"${r.getString(0)}: kept $kept over cap of $total")
      assert(nKept > 0 && nKept < nDocs,
        s"${r.getString(0)}: 50% cap should bind strictly ($nKept of $nDocs)")
    }
    // deterministic: a rerun admits the identical document set
    val again = ExtensionQueries.x20SourceBudget(spark, d).collect()
    assert(out.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("x30b sharded prefix scan ≡ x30 single-sort window, bit for bit") {
    // the range-sharded two-pass running sum must reproduce the
    // window's kept set EXACTLY (the whole point of sharding a hash
    // order — no x22c-style per-shard-floor semantic price)
    val a = ExtensionQueries.x30LanguageBudget(spark, d).collect()
    val b = ExtensionQueries.x30bLanguageBudgetSharded(spark, d).collect()
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("x30 ≡ st7's batch admission with cap = ⌊total/2⌋ per language") {
    // welds the batch fractional budget to the streaming absolute
    // budget the way st6/x25 are welded: x30's 50% fraction cap over
    // a language IS StreamBudget's prefix cut at that language's
    // ⌊total/2⌋, admitting in the same deterministic (minstd, doc_id)
    // order (hash stands in for event time)
    import graft.operators.{Sampling, TextAnalysis}
    import graft.streaming.StreamBudget
    val docs = Tables.wide(Tables.documents(spark, d))
      .select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("key"),
        TextAnalysis.wordCount(col("text")).as("n_tok"),
        Sampling.minstdHash(col("doc_id")).as("ts"))
    val x30 = ExtensionQueries.x30LanguageBudget(spark, d).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val totals = docs.groupBy("key").agg(sum("n_tok").as("tot")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals.keySet === x30.keySet)
    totals.foreach { case (lang, tot) =>
      val adm = StreamBudget.batch(docs.filter(col("key") === lang), tot / 2)
        .filter(col("admitted"))
        .agg(count(lit(1)).as("n"), coalesce(sum("n_tok"), lit(0L)).as("tok"))
        .head()
      assert((adm.getLong(0), adm.getLong(1)) === x30(lang),
        s"language $lang: stream-budget cut diverges from x30")
    }
  }

  test("t12: exactly top-3 per doc, and the rarest token outranks common ones") {
    val out = ExtensionQueries.t12TfidfKeywords(spark, d).collect()
    val perDoc = out.groupBy(_.getLong(0))
    perDoc.foreach { case (id, rows) =>
      assert(rows.map(_.getLong(1)).sorted.toSeq === Seq(1L, 2L, 3L), s"doc $id")
    }
    // 'dup' is ~40× rarer than every other token, so any doc containing
    // it must rank it first (idf dominates the near-uniform tfs)
    val dupDocs = Tables.documents(spark, d)
      .filter(col("text").contains("dup")).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(dupDocs.nonEmpty)
    dupDocs.foreach { id =>
      val top = out.find(r => r.getLong(0) == id && r.getLong(1) == 1L).get
      assert(top.getString(2) === "dup", s"doc $id top term ${top.getString(2)}")
    }
  }

  test("x29: cluster-keyed split has span 1; a doc-keyed split would leak") {
    val out = ExtensionQueries.x29LeakageSplit(spark, d).collect()
    assert(out.map(_.getString(0)).toSeq.sorted === Seq("test", "train", "val"))
    // the shipped assignment: no cluster touches two splits, all docs
    // accounted for, and the near-dup clusters really are multi-doc
    assert(out.forall(_.getLong(4) == 1L), "cluster-keyed split leaked")
    val nDocs = Tables.documents(spark, d).count()
    assert(out.map(_.getLong(1)).sum === nDocs)
    assert(out.map(_.getLong(3)).sum >= 1, "fixture has dup clusters")
    // negative control: splitting by DOC id (what x29 exists to avoid)
    // puts at least one near-dup cluster astride two splits — the
    // leakage the max_cluster_span column is pinned against
    val comp = operators.Dedup.connectedComponents(
        operators.Dedup.ngramJaccardPairs(Tables.documents(spark, d),
          "doc_id", "text", n = 3, threshold = 0.8))
      .select(col("node").as("doc_id"), col("cluster_id"))
    val byDoc = comp.withColumn("split",
        pmod(operators.Sampling.minstdHash(col("doc_id")), lit(10L)) <= 7)
      .groupBy("cluster_id")
      .agg(count_distinct(col("split")).as("n_splits"))
    assert(byDoc.agg(max("n_splits")).head().getLong(0) >= 2L,
      "doc-keyed control should straddle splits on this fixture")
  }
}
