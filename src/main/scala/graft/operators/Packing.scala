package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — the concat-and-chunk step that turns a corpus of
  * variable-length documents into fixed-length training sequences
  * (every pretraining data loader's final shuffle-side op): lay the
  * token stream out in a deterministic document order, then cut it
  * every `seqLen` tokens. Each document needs its global token offset,
  * i.e. a running SUM over the whole corpus.
  *
  * Why not `Window.orderBy(...)` with no partition key: a global
  * window collapses the entire dataset into ONE task — the canonical
  * 100 TB scale-killer. This operator computes the same running total
  * as a distributed two-pass prefix scan:
  *
  *   1. bucket rows into `numBuckets` ordered ranges of `orderCol`
  *      (fixed-width buckets from one metadata-cheap min/max
  *      aggregate — deterministic across jobs, unlike
  *      `repartitionByRange`'s sampled boundaries, so the two passes
  *      can safely recompute the scan);
  *   2. per-bucket totals (`numBuckets` rows) → exclusive cumulative
  *      prefix on the driver — O(buckets), not O(rows);
  *   3. within-bucket running sum (a partitioned window, parallel
  *      across buckets) + the bucket's prefix, shipped back as a
  *      tiny literal map.
  *
  * Cost: one extra pass over `orderCol`+`sizeCol` (columnar scan,
  * two columns) vs. the single-task global window. At 100 TB that
  * trade is the whole point.
  */
object Packing {

  /** Deterministic fixed-width range bucket of a numeric order key.
    * DECIMAL(38,0) intermediate so `(key−min)·buckets` cannot overflow
    * under ANSI mode whatever the key range (the CLAUDE.md `a*x+b`
    * trap). Skewed key distributions yield uneven buckets — acceptable
    * for packing order keys (ids, timestamps), which are near-uniform.
    */
  private def bucketOf(order: Column, min: Long, max: Long,
      numBuckets: Int): Column = {
    val span = BigDecimal(max) - BigDecimal(min) + 1
    least(lit(numBuckets - 1),
      floor((order.cast("decimal(38,0)") - lit(min)) * lit(numBuckets) /
        lit(span)).cast("int"))
  }

  /** Adds `outCol` = exclusive global running sum of `sizeCol` in
    * `orderCol` order (the first row gets 0). `orderCol` must be a
    * unique numeric key. Output partitioning: hash on the internal
    * range bucket — rows of one bucket stay co-located for the
    * downstream per-sequence grouping.
    *
    * Pass `bounds` = (min, max) of `orderCol` when the caller knows
    * them (dense ids, catalog/partition stats) to skip the probing
    * aggregate — one fewer pass over the input.
    *
    * Crossover (measured, PERF.md): at 6M rows on local[32] the naive
    * single-task global window WINS wall-clock (~4.5 s vs ~10 s) —
    * everything fits one core, and this path pays two extra input
    * computations. Use the naive window below ~10M rows; use this
    * when one task's sort would spill — its per-task state is
    * O(rows/buckets) and scans are the cheap currency at cluster
    * scale, single-task sorts the expensive one. */
  def globalOffsets(df: DataFrame, sizeCol: String, orderCol: String,
      outCol: String = "start_off", numBuckets: Int = 0,
      bounds: Option[(Long, Long)] = None): DataFrame = {
    val spark = df.sparkSession
    val n = if (numBuckets > 0) numBuckets
      else spark.sessionState.conf.numShufflePartitions
    val (mn, mx) = bounds.getOrElse {
      val r = df
        .agg(min(col(orderCol)).cast("long"), max(col(orderCol)).cast("long"))
        .head()
      (if (r.isNullAt(0)) 0L else r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    val bucketed = df.withColumn("_bkt", bucketOf(col(orderCol), mn, mx, n))
    // pass 1: per-bucket totals — n rows to the driver, O(buckets)
    val totals = bucketed.groupBy("_bkt")
      .agg(sum(col(sizeCol).cast("long")).as("_tot"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val prefix: Map[Int, Long] = {
      var acc = 0L
      (0 until n).map { b =>
        val p = b -> acc; acc += totals.getOrElse(b, 0L); p
      }.toMap
    }
    // pass 2: within-bucket running sum (parallel) + bucket prefix
    val w = Window.partitionBy("_bkt").orderBy(orderCol)
    bucketed.repartition(n, col("_bkt"))
      .withColumn(outCol,
        sum(col(sizeCol).cast("long")).over(w) - col(sizeCol).cast("long") +
          element_at(typedlit(prefix), col("_bkt")))
      .drop("_bkt")
  }

  /** Keyed twin of [[globalOffsets]] — adds `outCol` = EXCLUSIVE
    * running sum of `sizeCol` per `keyCol`, in (`hashCol`, `tieCol`)
    * order, with the per-task sort bounded by a SHARD of a key, never
    * a whole key. This is the scale path for the fraction-cap budget
    * family (x20 per-source, x30 per-language): the plain
    * `Window.partitionBy(key)` running sum sorts each key's entire
    * membership in ONE task, and language is the most skewed natural
    * key a crawl has (English ≈ half the corpus).
    *
    * Exactness: the admit order is a uniform HASH order, so sharding
    * by fixed RANGES of the hash value preserves the global order —
    * every row of shard i precedes every row of shard i+1 within its
    * key. Two passes: (1) per-(key, shard) totals (O(keys·shards)
    * rows) → exclusive shard offsets via a tiny partitioned window;
    * (2) within-shard running sum (parallel across key×shard) + the
    * broadcast offset. The result is BIT-IDENTICAL to the single-sort
    * window — same kept set, same oracle rows — unlike x22c's
    * per-shard-floor cap, which trades the kept set for the bound.
    *
    * One explicit exchange of the input by (key, shard) feeds both
    * the totals aggregate and the rank window (the capHalfPerCluster
    * device); the `min(hash)·0 + min(tie)·0` guard keeps the totals
    * branch from pruning columns below the shared exchange. Callers
    * with payload columns beyond (key, size, hash, tie) should expect
    * the subtrees to stop canonicalizing equal — project first.
    *
    * `hashCol` and `tieCol` must be NUMERIC columns (the pruning guard
    * below does typed arithmetic on them); `hashCol` must be
    * non-negative and < `hashMax` (minstd's modulus by default);
    * `numShards · hashMax` must not overflow a long. */
  def keyedOffsets(df: DataFrame, keyCol: String, sizeCol: String,
      hashCol: String, tieCol: String, outCol: String = "start_off",
      numShards: Int = 8, hashMax: Long = 2147483647L): DataFrame = {
    // COALESCE makes _shard provably non-null: the downstream
    // (key, _shard) join would otherwise infer IsNotNull(_shard) and
    // push it into ONE branch's scan as a per-row filter, breaking the
    // two consumers' exchange canonicalization (the x28 inferred-
    // IsNotNull trap — here it cost the ReusedExchange, not a double
    // parse). A null hash sorts NULLS FIRST in the window form; shard
    // 0 is the first range, so the sharded order stays identical.
    val sharded = df
      .withColumn("_shard",
        expr(s"CAST(COALESCE(($hashCol * ${numShards}L) DIV ${hashMax}L, 0L) AS INT)"))
      .repartition(col(keyCol), col("_shard"))
    val wPre = Window.partitionBy(keyCol).orderBy("_shard")
      .rowsBetween(Window.unboundedPreceding, -1)
    // the coalesce keeps _tot non-null when a (key, shard) group holds
    // only null-hash/null-tie rows — a bare min() guard would NULL the
    // whole total and silently understate every later shard's offset
    val offsets = sharded.groupBy(col(keyCol), col("_shard"))
      .agg((sum(col(sizeCol).cast("long")) +
        coalesce(min(col(hashCol)), lit(0L)) * 0 +
        coalesce(min(col(tieCol)), lit(0L)) * 0).as("_tot"))
      .withColumn("_off", coalesce(sum(col("_tot")).over(wPre), lit(0L)))
      .drop("_tot")
    val wIn = Window.partitionBy(keyCol, "_shard")
      .orderBy(col(hashCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sharded.withColumn("_cum", sum(col(sizeCol).cast("long")).over(wIn))
      .join(broadcast(offsets), Seq(keyCol, "_shard"))
      .withColumn(outCol,
        col("_cum") - col(sizeCol).cast("long") + col("_off"))
      .drop("_shard", "_cum", "_off")
  }

  /** Concat-and-chunk packing manifest: for each document, the packed
    * sequences it lands in — `first_seq`/`last_seq` (inclusive,
    * 0-based) and its byte-free `start_off` in the token stream. A
    * document spanning a cut boundary appears in >1 sequence, exactly
    * as the loader would split it. */
  def packManifest(df: DataFrame, tokenCol: String, orderCol: String,
      seqLen: Int): DataFrame =
    globalOffsets(df, tokenCol, orderCol)
      .withColumn("first_seq", expr(s"start_off DIV $seqLen"))
      .withColumn("last_seq",
        expr(s"(start_off + $tokenCol - 1) DIV $seqLen"))
      .withColumn("n_seqs", col("last_seq") - col("first_seq") + lit(1L))
}
