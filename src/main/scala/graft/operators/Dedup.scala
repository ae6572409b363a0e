package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextAnalysis.wordShingles

/** Deduplication operators for training-data pipelines: exact,
  * n-gram-Jaccard, MinHash+LSH, and SimHash near-dup detection.
  *
  * Scale design (the point of each variant):
  *  - [[exactKeepFirst]]: one hash aggregation, fully distributed; the
  *    dedup key can be a 64-bit fingerprint to cut shuffle width.
  *  - [[ngramJaccardPairs]]: exact pairwise Jaccard via a shingle
  *    equi-join — quadratic only within shingle buckets; the standard
  *    posting-list formulation, shuffle keyed on shingle.
  *  - [[minhashLshPairs]]: the 100 TB path — fixed-width signatures
  *    (one aggregation), banding (b×r) so only probable dups ever meet
  *    in a shuffle bucket, then exact verification on candidates only.
  *  - [[simhash64]] + [[simhashNearDups]]: constant-size sketch; the
  *    4×16-bit pigeonhole banding finds all pairs within Hamming
  *    distance 3 without an all-pairs comparison.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per key, count copies.
    * Deterministic (unlike dropDuplicates' arbitrary winner). */
  def exactKeepFirst(df: DataFrame, keyCol: String, idCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(min(col(idCol)).as(s"${idCol}_kept"),
        count(lit(1)).as("n_copies"))

  /** Distinct-shingle posting list: (id, shingle). */
  private def postings(df: DataFrame, idCol: String, textCol: String, n: Int): DataFrame =
    df.select(col(idCol).as("_id"),
        explode(wordShingles(col(textCol), n)).as("_sh"))

  /** All pairs with word-n-gram Jaccard ≥ threshold. Exact: intersection
    * counts from the shingle self-join, sizes from a per-doc count.
    * `jaccard` is rounded to 6 dp (single double division). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.8): DataFrame = {
    val post = postings(df, idCol, textCol, n)
    val sizes = post.groupBy("_id").agg(count(lit(1)).as("_n"))
    val a = post.toDF("ida", "sh")
    val b = post.toDF("idb", "sh2")
    val inter = a.join(b, a("sh") === b("sh2") && a("ida") < b("idb"))
      .groupBy("ida", "idb").agg(count(lit(1)).as("c"))
    inter
      .join(sizes.toDF("ida2", "na"), col("ida") === col("ida2"))
      .join(sizes.toDF("idb2", "nb"), col("idb") === col("idb2"))
      .select(col("ida"), col("idb"),
        round(col("c").cast("double") /
          (col("na") + col("nb") - col("c")), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash signatures: numHashes permutations approximated by seeded
    * xxhash64; one aggregation pass over the shingle postings. */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128): DataFrame = {
    val post = postings(df, idCol, textCol, n)
    val mins = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("_sh"))).as(s"_h$i"))
    post.groupBy("_id").agg(mins.head, mins.tail: _*)
      .select(col("_id"),
        array((0 until numHashes).map(i => col(s"_h$i")): _*).as("_sig"))
  }

  /** LSH banding + exact verification. Candidate pairs are ids sharing
    * at least one band hash; each candidate is then verified with true
    * n-gram Jaccard, so precision is exact and recall is
    * 1-(1-t^r)^b (≈1 for near-dups at the default 16×8). */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, numHashes: Int = 128, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val r = numHashes / bands
    val sig = minhashSignature(df, idCol, textCol, n, numHashes)
    val banded = sig.select(col("_id"),
      posexplode(array((0 until bands).map { bnd =>
        xxhash64((lit(bnd) +:
          (0 until r).map(j => element_at(col("_sig"), bnd * r + j + 1))): _*)
      }: _*)).as(Seq("_band", "_bh")))
    val cand = banded.toDF("ida", "band_a", "bh_a")
      .join(banded.toDF("idb", "band_b", "bh_b"),
        col("band_a") === col("band_b") && col("bh_a") === col("bh_b") &&
          col("ida") < col("idb"))
      .select("ida", "idb").distinct()
    // Exact verification on candidates only: recompute Jaccard from the
    // (small) per-doc shingle sets carried alongside.
    val sets = df.select(col(idCol).as("_vid"),
      wordShingles(col(textCol), n).as("_set"))
    cand
      .join(sets.toDF("va", "set_a"), col("ida") === col("va"))
      .join(sets.toDF("vb", "set_b"), col("idb") === col("vb"))
      .select(col("ida"), col("idb"),
        round(size(array_intersect(col("set_a"), col("set_b"))).cast("double") /
          (size(col("set_a")) + size(col("set_b")) -
            size(array_intersect(col("set_a"), col("set_b")))), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** 64-bit SimHash over whitespace tokens: per-bit majority vote of
    * token hashes, computed as 64 conditional sums in one aggregation. */
  def simhash64(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = df.select(col(idCol).as("_id"),
      explode(TextAnalysis.words(col(textCol))).as("_tok"))
      .withColumn("_h", xxhash64(col("_tok")))
    val bitSums = (0 until 64).map { j =>
      sum(when(shiftright(col("_h"), j).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"_b$j")
    }
    toks.groupBy("_id").agg(bitSums.head, bitSums.tail: _*)
      .select(col("_id"),
        (0 until 64).map(j =>
          when(col(s"_b$j") >= 0, shiftleft(lit(1L), j)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Near-dup pairs by SimHash Hamming distance ≤ maxHamming (< 16):
    * pigeonhole on 4×16-bit chunks — any pair within distance 3 shares
    * at least one exact chunk, so candidates meet in a chunk-keyed
    * shuffle instead of an all-pairs scan. */
  def simhashNearDups(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sh = simhash64(df, idCol, textCol)
    val chunks = sh.select(col("_id"), col("simhash"),
      posexplode(array((0 until 4).map(k =>
        shiftright(col("simhash"), k * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("_chunk", "_ck")))
    chunks.toDF("ida", "sim_a", "chunk_a", "ck_a")
      .join(chunks.toDF("idb", "sim_b", "chunk_b", "ck_b"),
        col("chunk_a") === col("chunk_b") && col("ck_a") === col("ck_b") &&
          col("ida") < col("idb"))
      .select(col("ida"), col("idb"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
