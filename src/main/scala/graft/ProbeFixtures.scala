package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared fixture generators for the replica-scale probes
  * (ClusterFoldProbe, StreamClustersProbe): relabel-BEARING day
  * batches, built by bridging existing cluster roots — pure appends
  * measure only the cheap half of a fold, so the probes must merge
  * real clusters to time the patch/relabel machinery. */
private[graft] object ProbeFixtures {

  /** Cluster roots (doc_id == cluster_id rows — labels are member
    * minima, so one such row exists per cluster), ranked and joined to
    * their text: the bridge anchors. Materialized (localCheckpoint) —
    * the probes reuse it across days and must not re-run the map
    * build per batch. */
  def rankedRoots(map: DataFrame, docs: DataFrame, limit: Int): DataFrame =
    map.filter(col("doc_id") === col("cluster_id"))
      .select(col("doc_id").as("rid"))
      .orderBy("rid").limit(limit)
      .withColumn("rk", row_number().over(Window.orderBy("rid")))
      .join(docs.withColumnRenamed("doc_id", "rid"), Seq("rid"))
      .localCheckpoint()

  /** Word-mixture bridge chains between consecutive root pairs
    * (startRank, startRank+1), (startRank+2, startRank+3), …: step k
    * of a chain takes the first (S−k)/S of root a's words + the first
    * k/S of root b's words, so consecutive chain docs stay near-dup
    * while the ends are exact copies of a and b — folding them MERGES
    * the bridged clusters (real relabels, not appends). Day 2 starts
    * one rank later, so its bridges UNDERCUT day 1's merges and the
    * stored patch must compose. Bridge ids live in the registered
    * probe domains (ExtensionQueries.ArrivalOffsets — IdDomainSpec
    * guards them at every replica scale). */
  def bridges(roots: DataFrame, startRank: Int, offset: Long,
      steps: Int): DataFrame = {
    val a = roots.filter(col("rk") >= startRank &&
        (col("rk") - startRank) % 2 === 0)
      .select(((col("rk") - startRank) / 2).cast("long").as("pi"),
        split(col("text"), " ").as("wa"))
    val b = roots.filter(col("rk") >= startRank &&
        (col("rk") - startRank) % 2 === 1)
      .select(((col("rk") - startRank) / 2).cast("long").as("pi"),
        split(col("text"), " ").as("wb"))
    a.join(b, Seq("pi"))
      .select(col("pi"), col("wa"), col("wb"),
        explode(sequence(lit(0), lit(steps))).as("k"))
      .select(
        (lit(offset) + col("pi") * (steps + 1) + col("k")).as("doc_id"),
        array_join(concat(
          slice(col("wa"), lit(1), expr(
            s"cast((($steps - k) * size(wa)) div $steps as int)")),
          slice(col("wb"), lit(1), expr(
            s"cast((k * size(wb)) div $steps as int)"))),
          " ").as("text"))
  }
}
