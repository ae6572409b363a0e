package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom typed aggregate computing a k-wide MinHash signature in one
  * pass — the case where built-in operators genuinely can't express the
  * computation efficiently: k separate `min(hash_i(x))` agg columns
  * force either a k-wide codegen'd aggregate (blows the JIT method
  * limit and falls back to interpreted eval) or k interpreted
  * higher-order array lambdas (per-element allocation). Here the buffer
  * is one primitive long array and each input costs k inlined
  * mix-rounds — no allocation, no codegen pressure.
  *
  * The permutation family h_i(x) = splitmix64(x ⊕ i·φ′) is a standard
  * stateless construction: the input is already an xxhash64 of the
  * shingle, and splitmix64's finalizer is a bijection on 64 bits.
  */
object MinHashAgg {

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private final class Agg(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
    def zero: Array[Long] = Array.fill(k)(Long.MaxValue)
    def reduce(buf: Array[Long], sh: Long): Array[Long] = {
      var i = 0
      while (i < k) {
        val h = mix(sh ^ (i * 0xC2B2AE3D27D4EB4FL))
        if (h < buf(i)) buf(i) = h
        i += 1
      }
      buf
    }
    def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
      a
    }
    def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** minhash(k) aggregate over a column of 64-bit shingle hashes. */
  def minhash(k: Int): Column => Column = {
    val fn = udaf(new Agg(k), Encoders.scalaLong)
    c => fn(c)
  }
}
