package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries frequent-items sketch as a typed aggregate — the
  * distributed heavy-hitters primitive. One pass over the token stream
  * builds a bounded map of at most `k` counters per partial state;
  * partial states merge associatively (Agarwal et al., "Mergeable
  * Summaries", PODS'12: summing two MG summaries and trimming back to
  * k keeps the error bound), so Spark's map-side partial aggregation
  * applies and the final merge moves O(k) state per partition, never
  * the token multiset.
  *
  * Guarantee: every item whose true count exceeds N/(k+1) survives in
  * the final key set (undercount ≤ N/(k+1)). The sketch's counts and
  * even its exact key set depend on encounter order, so the key set is
  * NOT deterministic beyond that guarantee — callers must re-verify
  * candidates with an exact count pass (cheap: the second scan only
  * shuffles tokens that hit the ≤k candidate list). That two-pass
  * sketch-then-verify shape is what makes exact heavy hitters viable
  * at 100 TB: pass 1 is map-only + an O(k) merge, pass 2's shuffle
  * carries only hot terms instead of the full vocabulary.
  */
/** Sketch result: exact total item count + candidate key superset.
  * Top-level (not nested in the companion): Catalyst's codegen'd
  * encoder serializer resolves nested-object case-class accessors
  * incorrectly under janino and falls back to interpreted eval. */
final case class MGResult(total: Long, keys: Seq[String])

final case class MGBuf(total: Long, counters: Map[String, Long])

object MisraGriesAgg {

  /** Trim a counter map to at most k entries by subtracting the
    * (k+1)-th largest count from every counter and dropping ≤0 — the
    * MG decrement step, batched. (Shared with the streaming twin,
    * [[graft.streaming.StreamHeavyHitters]].) */
  private[graft] def trim(m: Map[String, Long], k: Int): Map[String, Long] =
    if (m.size <= k) m
    else {
      val d = m.valuesIterator.toArray.sortInPlace()(Ordering[Long].reverse)(k)
      m.collect { case (key, c) if c > d => key -> (c - d) }
    }

  /** One MG insertion into a ≤k-entry counter map. */
  private[graft] def insert(m: Map[String, Long], k: Int, term: String): Map[String, Long] =
    m.get(term) match {
      case Some(c)            => m.updated(term, c + 1L)
      case None if m.size < k => m.updated(term, 1L)
      // full + miss: decrement all by 1, drop zeros (the new item's
      // own +1 and -1 cancel, so it is never inserted)
      case None => m.collect { case (key, c) if c > 1L => key -> (c - 1L) }
    }

  private final class Agg(k: Int) extends Aggregator[String, MGBuf, MGResult] {
    def zero: MGBuf = MGBuf(0L, Map.empty)
    def reduce(b: MGBuf, term: String): MGBuf =
      MGBuf(b.total + 1L, insert(b.counters, k, term))
    def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val summed = b.counters.foldLeft(a.counters) { case (m, (key, c)) =>
        m.updated(key, m.getOrElse(key, 0L) + c)
      }
      MGBuf(a.total + b.total, trim(summed, k))
    }
    def finish(b: MGBuf): MGResult = MGResult(b.total, b.counters.keys.toSeq.sorted)
    def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder[MGBuf]()
    def outputEncoder: Encoder[MGResult] = ExpressionEncoder[MGResult]()
  }

  /** misraGries(k) aggregate over a string column; returns a struct
    * `(total, keys)`. Recall contract: keys ⊇ every item with true
    * count > total/(k+1). */
  def misraGries(k: Int): Column => Column = {
    require(k >= 1, s"k must be >= 1, got $k")
    val fn = udaf(new Agg(k), Encoders.STRING)
    c => fn(c)
  }
}
