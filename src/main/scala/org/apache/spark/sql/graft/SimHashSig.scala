package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the SimHash signature of a text in ONE
  * pass per row — token boundaries, per-token hash, per-bit ±1 votes,
  * and the majority-bit assembly all fused, no token explode and no
  * aggregate.
  *
  * Semantically identical — pinned by DedupSpec — to the relational
  * reference `Dedup.simhashWith`:
  * {{{ explode(split(text,' ')) → hash token → 64 conditional sums
  *     → bit j set iff sum_j >= 0 }}}
  * (single-space split semantics, empty tokens included and hashed;
  * ties set the bit).
  *
  * Two token hashes:
  *  - `md5Variant = false`: XXH64(token bytes, seed 42) — exactly the
  *    builtin `xxhash64(tok)` (production path; no cross-engine twin);
  *  - `md5Variant = true`: the first 15 hex chars of md5 parsed
  *    base-16 (60 bits) — exactly
  *    `conv(substring(md5(tok),1,15),16,10)::long`, the
  *    engine-portable hash whose bit-majority the DuckDB oracle
  *    recomputes (x4b).
  *
  * Why an Expression: the relational form explodes every token of
  * every document and shuffles a 64-column partial-sum row per doc
  * through a hash aggregate; the signature is per-document state, so
  * at 100 TB it should be a map-only projection fused into the scan —
  * same argument as WordShingleHashes, one level up.
  */
case class SimHashSig(child: Expression, nBits: Int, md5Variant: Boolean)
    extends UnaryExpression with ExpectsInputTypes {

  require(nBits >= 1 && nBits <= 64)

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashUtil.signature(input.asInstanceOf[UTF8String], nBits, md5Variant)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.SimHashUtil.signature($c, $nBits, $md5Variant);")

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

object SimHashUtil {

  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(token) — the value of
    * `conv(substring(md5(tok),1,15),16,10)` without the hex string:
    * 15 hex chars = bytes 0..6 plus the high nibble of byte 7. */
  private def md5Hash60(b: Array[Byte], from: Int, len: Int): Long = {
    val md = digest.get()
    md.reset()
    md.update(b, from, len)
    val d = md.digest()
    var v = 0L
    var k = 0
    while (k < 7) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  def signature(s: UTF8String, nBits: Int, md5Variant: Boolean): Long = {
    val b = s.getBytes
    val n = b.length
    val votes = new Array[Int](nBits)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || b(i) == ' ') {
        val h =
          if (md5Variant) md5Hash60(b, start, i - start)
          else XXH64.hashUnsafeBytes(b, Platform.BYTE_ARRAY_OFFSET + start,
            i - start, 42L)
        var j = 0
        while (j < nBits) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < nBits) {
      if (votes(j) >= 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}
