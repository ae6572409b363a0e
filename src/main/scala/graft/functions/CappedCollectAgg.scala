package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Bounded-state posting-list collection: `collect_list` whose
  * aggregation state can never exceed `cap + 1` values per key, for
  * the dedup stop-shingle cap (see `Dedup.DfCap` and the measured
  * trade at `Dedup.applyCap`).
  *
  * The plain shape — build the full list, then filter `size ≤ cap` —
  * is the right default (one pass, no extra join), but its transient
  * state is the RAW df of the hottest key: a single pathological
  * boilerplate shingle with df ~10⁸ on a web corpus materializes a
  * GB-scale list before the filter ever sees it. This aggregator is
  * the documented deployment knob for that profile: it stops
  * RETAINING values the moment a key's count passes the cap (the
  * key is already doomed to be dropped), so the hot key costs
  * `cap + 1` longs instead of df longs, with no second pass and no
  * postings join.
  *
  * Semantics pin (CappedCollectSpec): for every key,
  * `capped_sorted_list(cap)(v)` ≡ `sort_array(collect_list(v))` when
  * the key's count ≤ cap, and the EMPTY array otherwise — exactly the
  * kept set of `collect_list` + `filter(size ≤ cap)`, which is what
  * lets `DfCap.FixedBounded`/`AdaptiveBounded` reuse the fixed/
  * adaptive caps' oracles verbatim (empty lists can't pair, so the
  * downstream `size ≥ 2` filter drops them like the filtered form).
  *
  * Buffer layout: one primitive `Array[Long]` of length `cap + 2` —
  * slot 0 is the count, SATURATING at `cap + 1` (each input row
  * reduces into exactly one partial, so the saturated sum of partial
  * counts still detects df > cap across merges); slots 1‥count hold
  * the values in arrival order. One flat array keeps the encoder a
  * primitive-array copy, same as MinHashAgg. The output sort is at
  * most `cap + 1` elements — negligible next to the shuffle that
  * delivered them.
  */
object CappedCollectAgg {

  private final class Agg(cap: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    require(cap >= 0, s"cap must be non-negative, got $cap")
    private val sat = cap + 1

    def zero: Array[Long] = new Array[Long](cap + 2)

    def reduce(buf: Array[Long], v: Long): Array[Long] = {
      val cnt = buf(0).toInt
      if (cnt < sat) {
        buf(1 + cnt) = v
        buf(0) = cnt + 1
      }
      buf
    }

    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      val bn = b(0).toInt
      var cnt = a(0).toInt
      while (i < bn && cnt < sat) {
        a(1 + cnt) = b(1 + i)
        cnt += 1
        i += 1
      }
      // values past the saturation point are dropped, but the count
      // must still saturate so finish sees the key is over the cap
      if (i < bn) cnt = sat
      a(0) = cnt
      a
    }

    def finish(buf: Array[Long]): Seq[Long] = {
      val cnt = buf(0).toInt
      if (cnt > cap) Seq.empty
      else {
        val out = java.util.Arrays.copyOfRange(buf, 1, 1 + cnt)
        java.util.Arrays.sort(out)
        out.toSeq
      }
    }

    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** `sort_array(collect_list(c))` if the group has ≤ cap values,
    * else the empty array — with aggregation state bounded at
    * `cap + 1` longs per key regardless of the true group size. */
  def cappedSortedList(cap: Int): Column => Column = {
    val fn = udaf(new Agg(cap), Encoders.scalaLong)
    c => fn(c)
  }
}
