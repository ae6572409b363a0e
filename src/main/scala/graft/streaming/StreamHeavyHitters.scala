package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.functions.MisraGriesAgg

/** Per-shard Misra-Gries state: a monotone version stamp (so the sink
  * can pick each shard's latest snapshot), the shard's exact item
  * total, and the bounded counter map. */
case class HHShardState(ver: Long, total: Long, counters: Map[String, Long])

/** One emitted snapshot per (shard, batch): the shard's candidate set
  * after folding that batch. */
case class HHSnapshot(shard: Int, ver: Long, total: Long, keys: Seq[String])

/** Streaming twin of the x25 heavy-hitters sketch pass
  * ([[graft.functions.MisraGriesAgg]]): a continuously-maintained
  * frequent-items candidate set over an unbounded token stream.
  *
  * Sharding: terms are hash-partitioned into `nShards` groups and each
  * group's `flatMapGroupsWithState` state is one MG(k) sketch. Because
  * a term lives in exactly ONE shard, its full count is concentrated
  * there, and the shard-local guarantee (undercount ≤ shardTotal/(k+1)
  * ≤ streamTotal/(k+1)) transfers to the stream: the UNION of shard
  * key sets contains every term above streamTotal/(k+1) — the same
  * mergeable-summaries property the batch aggregate relies on, carried
  * across micro-batches by the state store instead of a shuffle.
  *
  * State is O(nShards · k) forever — independent of stream length and
  * of vocabulary size, which is what makes this viable as a standing
  * query; the exact-verify pass stays a batch job over the candidates
  * (state stores answer "what might be hot", storage answers "how hot
  * exactly", same split as x25).
  */
object StreamHeavyHitters {

  /** Same hash as the batch twin's `pmod(xxhash64(term), nShards)`
    * (st6_heavy_hitters) — Spark's xxhash64 with its default seed 42 —
    * so the streaming state layout and the driver-verified batch union
    * shard IDENTICALLY, term for term (parity asserted in
    * StreamHeavyHittersSpec). */
  def shardOf(term: String, nShards: Int): Int =
    math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XxHash64Function.hash(
        org.apache.spark.unsafe.types.UTF8String.fromString(term),
        org.apache.spark.sql.types.StringType, 42L),
      nShards.toLong).toInt

  /** Update-mode stream: one snapshot per touched shard per batch. */
  def streaming(terms: Dataset[String], nShards: Int, k: Int): Dataset[HHSnapshot] = {
    import terms.sparkSession.implicits._
    terms
      .groupByKey(shardOf(_, nShards))
      .flatMapGroupsWithState[HHShardState, HHSnapshot](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (shard: Int, rows: Iterator[String], state: GroupState[HHShardState]) =>
          val st0 = state.getOption.getOrElse(HHShardState(0L, 0L, Map.empty))
          var total = st0.total
          var m = st0.counters
          rows.foreach { t => m = MisraGriesAgg.insert(m, k, t); total += 1 }
          val st1 = HHShardState(st0.ver + 1L, total, m)
          state.update(st1)
          Iterator.single(HHSnapshot(shard, st1.ver, total, m.keys.toSeq.sorted))
      }
  }
}
