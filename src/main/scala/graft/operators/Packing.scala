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
