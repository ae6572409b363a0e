package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: one BPE merge step over a
  * space-separated symbol sequence — every left-to-right,
  * non-overlapping occurrence of the adjacent symbol pair
  * (`left`, `right`) is replaced by the concatenated symbol
  * `left||right` (single pass, no rescan within the step: a symbol
  * produced by a merge never serves as the LEFT of another merge in
  * the same step — the standard BPE pair-application semantics,
  * identical to a left fold that appends `x` without a separator when
  * the accumulator's last token equals `left` and `x` equals `right`).
  *
  * The DuckDB oracle states the same fold directly via `list_reduce`
  * (ExtensionQueries x31), so engine agreement pins the semantics
  * including the subtle left==right runs (`a a a a a` → `aa aa a`,
  * never `aa a aa`).
  *
  * Why an Expression: the merge runs once per learning round over the
  * distinct-word working set; a regex formulation cannot express the
  * non-overlapping rescan rule for left==right runs (lookbehind
  * re-matching diverges), and an interpreted HOF fold would put a
  * per-token lambda on a table that is ~1e8 rows for a web-scale
  * corpus. One fused byte scan, codegen-friendly via a static call.
  */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(StringType, StringType, StringType)

  override def dataType: DataType = StringType

  override def nullSafeEval(sym: Any, l: Any, r: Any): Any =
    BpeUtil.mergePair(sym.asInstanceOf[UTF8String],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l, r) =>
      s"${ev.value} = org.apache.spark.sql.graft.BpeUtil.mergePair($s, $l, $r);")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): BpeMerge =
    copy(first = newFirst, second = newSecond, third = newThird)

  override def prettyName: String = "bpe_merge"
}

/** Native Catalyst expression: ALL word n-gram window strings of a
  * text, WITH multiplicity — the non-distinct sibling of
  * [[WordShingleStrings]] for frequency-weighted pair counting (BPE
  * learning needs `count(pair)`, not `exists(pair)`). Same
  * single-space split semantics; window order preserved. */
case class WordShingleMulti(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(n >= 1, "shingle width must be >= 1")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    BpeUtil.wordShingleMulti(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.BpeUtil.wordShingleMulti($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShingleMulti =
    copy(child = newChild)

  override def prettyName: String = "word_shingle_multi"
}

object BpeUtil {

  private def tokenStarts(b: Array[Byte]): Array[Int] = {
    val n = b.length
    var words = 1
    var i = 0
    while (i < n) { if (b(i) == ' ') words += 1; i += 1 }
    val starts = new Array[Int](words + 1)
    var w = 1
    i = 0
    while (i < n) { if (b(i) == ' ') { starts(w) = i + 1; w += 1 }; i += 1 }
    starts(words) = n + 1 // sentinel one past a virtual trailing space
    starts
  }

  private def tokenEquals(b: Array[Byte], from: Int, until: Int,
      t: Array[Byte]): Boolean = {
    if (until - from != t.length) return false
    var i = 0
    while (i < t.length) {
      if (b(from + i) != t(i)) return false
      i += 1
    }
    true
  }

  /** One left-to-right, non-overlapping application of merge
    * (left, right) to the single-space-separated token sequence. */
  def mergePair(sym: UTF8String, left: UTF8String, right: UTF8String): UTF8String = {
    val b = sym.getBytes
    val starts = tokenStarts(b)
    val words = starts.length - 1
    val lb = left.getBytes
    val rb = right.getBytes
    val out = new java.io.ByteArrayOutputStream(b.length)
    var i = 0
    var first = true
    while (i < words) {
      val merged = i + 1 < words &&
        tokenEquals(b, starts(i), starts(i + 1) - 1, lb) &&
        tokenEquals(b, starts(i + 1), starts(i + 2) - 1, rb)
      if (!first) out.write(' ')
      if (merged) {
        out.write(b, starts(i), starts(i + 1) - 1 - starts(i))
        out.write(b, starts(i + 1), starts(i + 2) - 1 - starts(i + 1))
        i += 2
      } else {
        out.write(b, starts(i), starts(i + 1) - 1 - starts(i))
        i += 1
      }
      first = false
    }
    UTF8String.fromBytes(out.toByteArray)
  }

  /** All n-word window substrings, with multiplicity, window order. */
  def wordShingleMulti(s: UTF8String, n: Int): ArrayData = {
    val b = s.getBytes
    val starts = tokenStarts(b)
    val words = starts.length - 1
    if (words < n) return new GenericArrayData(Array.empty[Any])
    val windows = words - n + 1
    val out = new Array[Any](windows)
    var wi = 0
    while (wi < windows) {
      val from = starts(wi)
      val until = starts(wi + n) - 1
      out(wi) = UTF8String.fromBytes(
        java.util.Arrays.copyOfRange(b, from, until))
      wi += 1
    }
    new GenericArrayData(out)
  }
}
