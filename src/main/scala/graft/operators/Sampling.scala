package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Why not `df.sample()`/`rand()`: those are seeded per-partition, so
  * the selected set changes whenever partitioning, parallelism, or
  * engine changes — unusable for reproducible corpus cuts or
  * differential testing. Hash-mod sampling keys the decision on the
  * ROW (a key column), so any engine, any cluster size, any run picks
  * the same rows, membership is joinable ("was this doc in the 10%
  * eval split?"), and disjoint splits fall out of disjoint residue
  * classes.
  *
  * Scale: both operators are map-only over the scan except the
  * stratified cap's per-stratum window, which Spark executes with
  * WindowGroupLimit pushdown (each mapper keeps ≤ k rows per stratum
  * before the shuffle) — O(strata·k) exchanged rows, not O(rows).
  */
object Sampling {

  /** MINSTD multiplicative hash of an integral key — deterministic,
    * engine-portable (plain % and * — no engine hash builtin), uniform
    * enough for split assignment. The key is reduced mod 2^31−1 BEFORE
    * the multiply, so no long can overflow under ANSI mode (the
    * CLAUDE.md raw-`a*x` trap: pmod < 2^31 times 48271 < 2^47); for
    * keys already below 2^31−1 the value equals the textbook
    * `(key·48271) mod M`, which is what the SQL oracles state. */
  def minstdHash(key: Column): Column = {
    val m = lit(2147483647L)
    pmod(pmod(key.cast("long"), m) * 48271L, m)
  }

  /** Keep rows whose hash falls in `residues` of `modulus` classes —
    * e.g. modulus=10, residues=Seq(0) is a reproducible 10% sample;
    * residues=Seq(1,2) is a disjoint 20%. */
  def hashSample(df: DataFrame, keyCol: String, modulus: Int,
      residues: Seq[Int]): DataFrame =
    df.filter(pmod(minstdHash(col(keyCol)), lit(modulus.toLong))
      .isin(residues.map(_.toLong): _*))

  /** Weighted Bernoulli sample: keep a row iff its deterministic
    * per-key uniform (minstd hash reduced to milli-units) falls below
    * the row's weight, given in milli-units and clamped to [1, 999] —
    * the quality-weighted corpus cut ("keep good documents with high
    * probability, bad ones rarely") with the same engine-portable
    * reproducibility story as hashSample. Emits the Horvitz-Thompson
    * inverse-probability weight `inv_w_micro` = floor(1e9 / w_milli)
    * as an exact integer so downstream token accounting can unbias
    * the sample. Map-only — scales as a pure scan, no shuffle. */
  def weightedBernoulli(df: DataFrame, keyCol: String,
      weightMilli: Column): DataFrame =
    df.withColumn("w_milli",
        least(lit(999L), greatest(lit(1L), weightMilli.cast("long"))))
      .filter(pmod(minstdHash(col(keyCol)), lit(1000L)) < col("w_milli"))
      .withColumn("inv_w_micro", expr("1000000000 DIV w_milli"))

  /** Per-stratum cap: the k rows with smallest (hash, key) per
    * stratum — a deterministic stratified sample (equal quota per
    * class, the "balance languages/sources" step). Emits the rank as
    * `rankCol`. */
  def stratifiedTopK(df: DataFrame, strataCol: String, keyCol: String,
      k: Int, rankCol: String = "strat_rank"): DataFrame = {
    val w = Window.partitionBy(strataCol)
      .orderBy(minstdHash(col(keyCol)), col(keyCol))
    df.withColumn(rankCol, row_number().over(w))
      .filter(col(rankCol) <= k)
  }
}
