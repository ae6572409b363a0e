package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling for joins whose key distribution is heavy-tailed —
  * the manual fallback when AQE's skew-join splitting can't apply
  * (e.g. broadcast ineligible and a handful of hot keys dominate).
  *
  * Salted join: the build side is replicated `factor` times with a salt
  * column, the probe side gets a random-free deterministic salt from a
  * row hash, and the join key becomes (key, salt) — hot keys spread
  * over `factor` reducers at the cost of replicating the (smaller)
  * build side. Deterministic (hash-derived salt, no rand()) so results
  * are reproducible and retries are safe.
  */
object Skew {

  /** Probe-side salt: stable per row, uniform in [0, factor). */
  def probeSalt(factor: Int, cols: Column*): Column =
    pmod(xxhash64(cols: _*), lit(factor)).cast("int")

  /** Inner equi-join `probe ⋈ build` on `key`, salted `factor` ways.
    * `build` must be the smaller side (it is replicated). */
  def saltedJoin(probe: DataFrame, build: DataFrame, key: String,
      factor: Int): DataFrame = {
    require(factor > 0)
    val salted = probe.withColumn("_salt",
      probeSalt(factor, probe.columns.toIndexedSeq.map(col): _*))
    val replicated = build
      .withColumn("_salt", explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
