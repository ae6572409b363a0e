package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct word n-gram shingle
  * STRINGS of a text, in one pass over the UTF8String bytes — the
  * string-valued sibling of [[WordShingleHashes]] for operators whose
  * output is the gram itself (boilerplate reports, decontamination
  * audits that must name the offending passage).
  *
  * Semantically identical to TextAnalysis.wordShingles' composed form
  *
  * {{{ array_distinct(when(size(ws) >= n, transform(sequence(0, size(ws)-n),
  *       i => concat_ws(" ", ws[i+1], …, ws[i+n]))).otherwise(array())) }}}
  *
  * — each shingle is the n words joined by single spaces (a shingle is
  * a verbatim substring of the text, so it is sliced directly from the
  * source bytes, never concatenated), first-occurrence order preserved.
  *
  * Why an Expression: same reason as WordShingleHashes — the HOF
  * lambda runs interpreted and re-splits the document per window
  * (O(len·windows) regex work per row); this is one fused scan.
  */
case class WordShingleStrings(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleStringUtil.wordShingleStrings(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.ShingleStringUtil.wordShingleStrings($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleStrings =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_strings"
}

object ShingleStringUtil {

  private val SPACE: Byte = 0x20

  /** Distinct n-word window substrings of `s` (single-space split
    * semantics, same as ShingleHashUtil). A window's shingle is the
    * byte span from its first word's start to its last word's end —
    * substrings share the source buffer until materialized. */
  def wordShingleStrings(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var words = 1
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == SPACE) words += 1
      i += 1
    }
    if (words < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](words + 1)
    var w = 1
    i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == SPACE) { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(words) = len + 1
    val windows = words - n + 1
    // dedup via a LinkedHashSet-style insertion-ordered set; shingle
    // count per doc is small (≤ word count), so a JDK set is fine here
    val seen = new java.util.LinkedHashSet[UTF8String](windows * 2)
    val bytes = s.getBytes // one copy of the source, sliced per window
    var wi = 0
    while (wi < windows) {
      val from = starts(wi)
      val until = starts(wi + n) - 1 // end of last word (before space)
      seen.add(UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(bytes, from, until)))
      wi += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
