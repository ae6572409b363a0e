package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct 64-bit hashes of a text's
  * word n-gram shingles, in one pass over the UTF8String bytes.
  *
  * Semantically identical to the composed-builtins formulation
  *
  * {{{ array_distinct(transform(sequence(0, size(ws)-n),
  *       i => xxhash64(ws[i+1], …, ws[i+n]))) }}}
  *
  * (with `ws = split(text, " ")`, empty array when the text has fewer
  * than n words) — each window hash is the same seed-chained XXH64 the
  * `xxhash64` expression computes over its n word arguments, and
  * first-occurrence order is preserved by the dedup.
  *
  * Why an Expression: the builtin HOF lambda evaluates interpreted and
  * re-embeds `split(text, " ")` inside every `element_at`, so each
  * shingle window re-splits the whole document with a regex — measured
  * ~10 s for a 5k-doc corpus where this single fused scan takes
  * milliseconds. The shingle set is the input every dedup shuffle keys
  * on (Dedup.postingsHashed), so this sits on the 100 TB hot path.
  */
case class WordShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashUtil.wordShingleHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleHashUtil.wordShingleHashes($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_hashes"
}

object ShingleHashUtil {

  private val SPACE: Byte = 0x20

  /** Distinct seed-chained XXH64 hashes of every n-word window of `s`,
    * splitting on single spaces exactly like `split(text, " ")` with
    * limit -1 (consecutive spaces yield empty words; empty input is one
    * empty word). First-occurrence order, matching array_distinct. */
  def wordShingleHashes(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    // Pass 1: word count (spaces + 1). Space is a single byte in UTF-8
    // and never a continuation byte, so byte scanning is charset-safe.
    var words = 1
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == SPACE) words += 1
      i += 1
    }
    if (words < n) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // Pass 2: word start offsets; starts(words) sentinels one past a
    // virtual trailing space so word k spans [starts(k), starts(k+1)-1).
    val starts = new Array[Int](words + 1)
    var w = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == SPACE) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(words) = len + 1
    // Window hashes, deduped with open addressing (first-occurrence
    // order kept so results are bit-identical to the HOF formulation).
    val windows = words - n + 1
    var cap = 4
    while (cap < windows * 2) cap <<= 1
    val table = new Array[Long](cap) // 0 = empty slot; 0-hash handled via flag
    var seenZero = false
    val out = new Array[Long](windows)
    var outN = 0
    var wi = 0
    while (wi < windows) {
      var h = 42L
      var k = wi
      while (k < wi + n) {
        h = XXH64.hashUnsafeBytes(base, off + starts(k), starts(k + 1) - 1 - starts(k), h)
        k += 1
      }
      if (h == 0L) {
        if (!seenZero) { seenZero = true; out(outN) = h; outN += 1 }
      } else {
        var slot = (h ^ (h >>> 32)).toInt & (cap - 1)
        var dup = false
        while (!dup && table(slot) != 0L) {
          if (table(slot) == h) dup = true else slot = (slot + 1) & (cap - 1)
        }
        if (!dup) { table(slot) = h; out(outN) = h; outN += 1 }
      }
      wi += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (outN == windows) out else java.util.Arrays.copyOf(out, outN))
  }
}
