package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC-style latest-revision-wins merge — the incremental-corpus-update
  * primitive: an existing snapshot plus a change batch (upserts and
  * tombstones) collapse to the new snapshot.
  *
  * Physical shape: one `max_by` hash aggregation over the union keyed
  * on the business key — partial (map-side) combine, shuffle O(keys),
  * no per-group sort and no join. The change batch wins ties at equal
  * revision (the "reprocessed same-version file" case), and a winning
  * tombstone deletes the key from the snapshot.
  *
  * At 100 TB the union's snapshot side is the stored table and the
  * change side is a small batch: the aggregate's map-side combine
  * reduces each partition to one row per touched key before the
  * shuffle, so incremental cost tracks the change volume, not the
  * snapshot size, when the snapshot is bucketed on the key.
  */
object Upsert {

  /** Collapse `base ∪ changes` to the latest row per `keyCol`.
    *
    * Both inputs must share a schema containing `keyCol` and a
    * monotonically increasing `versionCol`. If `tombstoneCol` is set
    * (a boolean column), keys whose winning revision carries `true`
    * are dropped from the result.
    */
  def mergeLatest(base: DataFrame, changes: DataFrame, keyCol: String,
      versionCol: String, tombstoneCol: Option[String] = None): DataFrame = {
    val cols = base.columns.toIndexedSeq
    require(changes.columns.toIndexedSeq == cols,
      s"schema mismatch: ${cols.mkString(",")} vs ${changes.columns.mkString(",")}")
    val tagged = base.withColumn("_src", lit(0))
      .unionByName(changes.withColumn("_src", lit(1)))
    val payload = struct(cols.map(col): _*)
    val winner = tagged
      .groupBy(col(keyCol).as("_k"))
      .agg(max_by(payload, struct(col(versionCol), col("_src"))).as("_top"))
      .select(col("_top.*"))
    tombstoneCol.fold(winner)(t => winner.filter(!col(t)))
  }
}
