package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Seeded fuzz for the incremental split-list core: across hundreds of
  * random (corpus, batch) splits, the incremental listings must equal
  * the full-union recompute restricted to ≥1-new pairs — for Jaccard
  * AND containment, from scratch AND from the posting index, under
  * NoCap, a binding Fixed cap, and the density-adaptive cap.
  *
  * The cases run BATCHED: every case gets its own disjoint vocabulary
  * (each word carries the case tag), so no shingle — and therefore no
  * pair, no df, no posting row — can cross cases, and one Spark
  * comparison over the union of all cases checks them all at once
  * (240 per-case Spark runs would pay the ~0.5 s local stage floor
  * 240×). The adaptive cap is a UNION-corpus statistic under this
  * construction, but both sides of the identity state the same
  * statistic, so the equality is still exact per case. Ids respect the
  * engine's batch-domain invariant (every batch id above every corpus
  * id, split across the +5·10¹² and +6·10¹² arrival offsets, all under
  * the pair generator's 2⁴⁴ packing bound). */
class IncrementalFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val NCases = 240
  private val Thresh = 300000L // ppm — low enough to yield dense pairs
  private val ContPct = 70

  /** One deterministic fuzz corpus: (corpusDocs, batchDocs). */
  private def genCases(seed: Long): (DataFrame, DataFrame) = {
    val rnd = new scala.util.Random(seed)
    val corpus = Seq.newBuilder[(Long, String)]
    val batch = Seq.newBuilder[(Long, String)]
    (0 until NCases).foreach { k =>
      val vocab = (0 until 3 + rnd.nextInt(6)).map(v => s"c${k}w$v")
      def doc(): Seq[String] =
        Seq.fill(3 + rnd.nextInt(10))(vocab(rnd.nextInt(vocab.size)))
      val cDocs = Seq.fill(rnd.nextInt(7))(doc())
      cDocs.zipWithIndex.foreach { case (w, i) =>
        corpus += ((k * 100L + i, w.mkString(" ")))
      }
      (0 until rnd.nextInt(5)).foreach { j =>
        // half the batch docs are perturbed re-crawls of a corpus doc
        // (cross pairs + batch-internal dup structure), half are fresh
        val words =
          if (cDocs.nonEmpty && rnd.nextBoolean()) {
            val src = cDocs(rnd.nextInt(cDocs.size))
            val keep = math.max(2, src.size - rnd.nextInt(3))
            src.take(keep) ++ Seq.fill(rnd.nextInt(2))(
              vocab(rnd.nextInt(vocab.size)))
          } else doc()
        val offset = if (rnd.nextBoolean()) 5000000000000L else 6000000000000L
        batch += ((offset + k * 100L + j, words.mkString(" ")))
      }
    }
    (corpus.result().toDF("doc_id", "text"),
      batch.result().toDF("doc_id", "text"))
  }

  private def pairSet(df: DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private val NewFrom = 5000000000000L

  test(s"incremental == restricted full recompute over $NCases seeded " +
      "cases x 3 caps x {Jaccard, containment} x {scratch, from-index}") {
    val (corpus, batch) = genCases(seed = 20260815L)
    val union = corpus.unionByName(batch)
    val index = Dedup.postingIndex(corpus, "doc_id", "text", 2)

    val caps = Seq(Dedup.DfCap.NoCap, Dedup.DfCap.Fixed(4),
      Dedup.DfCap.AdaptiveAvg(2))
    val jaccByCap = caps.map { cap =>
      val full = pairSet(Dedup.ngramJaccardPairsPpm(union, "doc_id", "text",
          2, Thresh, cap)
        .filter(col("idb") >= NewFrom))
      val inc = pairSet(Dedup.incrementalJaccardPairsPpm(corpus, batch,
        "doc_id", "text", 2, Thresh, cap))
      assert(inc === full, s"Jaccard from-scratch, cap=$cap")
      val viaIdx = pairSet(Dedup.incrementalJaccardPairsFromIndex(index,
        batch, "doc_id", "text", 2, Thresh, cap))
      assert(viaIdx === full, s"Jaccard from-index, cap=$cap")
      full
    }
    val contByCap = caps.map { cap =>
      val full = pairSet(Dedup.containmentPairs(union, "doc_id", "text",
          2, ContPct, cap)
        .filter(col("id_sub") >= NewFrom || col("id_super") >= NewFrom))
      val inc = pairSet(Dedup.incrementalContainmentPairs(corpus, batch,
        "doc_id", "text", 2, ContPct, cap))
      assert(inc === full, s"containment from-scratch, cap=$cap")
      val viaIdx = pairSet(Dedup.incrementalContainmentPairsFromIndex(index,
        batch, "doc_id", "text", 2, ContPct, cap))
      assert(viaIdx === full, s"containment from-index, cap=$cap")
      full
    }

    // anti-vacuity: the fuzz must generate real structure — plenty of
    // pairs, BOTH pair kinds, both batch offsets, and caps that BIND
    val jaccNoCap = jaccByCap.head
    assert(jaccNoCap.size > 100, s"only ${jaccNoCap.size} Jaccard pairs")
    assert(jaccNoCap.exists { case (a, b, _) => a < NewFrom && b >= NewFrom },
      "cross corpus x batch pairs must appear")
    assert(jaccNoCap.exists { case (a, b, _) => a >= NewFrom && b >= NewFrom },
      "batch-internal pairs must appear")
    assert(jaccNoCap.exists { case (_, b, _) => b >= 6000000000000L },
      "the +6e12 arrival offset must appear")
    assert(jaccByCap(1) != jaccNoCap, "the Fixed cap must bind")
    assert(jaccByCap(2) != jaccNoCap, "the adaptive cap must bind")
    assert(contByCap.head.size > 100,
      s"only ${contByCap.head.size} containment pairs")
    assert(contByCap(1) != contByCap.head, "the Fixed cap must bind")
  }
}
