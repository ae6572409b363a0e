package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{AbstractDataType, DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: Jaro-Winkler similarity between two
  * string columns — the fuzzy-match scorer record-linkage pipelines
  * pair with blocking joins (complements thresholded levenshtein,
  * which rejects early but scores edit counts, not transposition-aware
  * similarity).
  *
  * Textbook algorithm, pinned to the semantics DuckDB's
  * `jaro_winkler_similarity` implements so results are
  * oracle-comparable: match window `max(|a|,|b|)/2 - 1`, transposition
  * halving, Winkler prefix boost `p = 0.1` over at most 4 leading
  * chars, applied only when the Jaro score exceeds 0.7; both-empty
  * strings score 1, one-empty scores 0.
  *
  * Codegen calls the static scorer below (the Spark-native shape —
  * `levenshtein` does the same via UTF8String): the loop body is far
  * too branchy to inline profitably, but the call stays inside
  * whole-stage codegen, so no interpreted-lambda frames and no row
  * boxing. Scoring is O(|a|·|b|) worst case on the match scan —
  * callers block candidates first (shingle/LSH), same as levenshtein.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.similarity(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = JaroWinkler.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"${ev.value} = $cls.similarity($a.toString(), $b.toString());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}

object JaroWinkler {
  /** Plain-JVM scorer, shared by interpreted eval and codegen. */
  def similarity(a: String, b: String): Double = {
    val la = a.length
    val lb = b.length
    if (la == 0 && lb == 0) return 1.0
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(0, math.max(la, lb) / 2 - 1)
    val aMatch = new Array[Boolean](la)
    val bMatch = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!bMatch(j) && a.charAt(i) == b.charAt(j)) {
          aMatch(i) = true; bMatch(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < la) {
      if (aMatch(i)) {
        while (!bMatch(k)) k += 1
        if (a.charAt(i) != b.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    val md = m.toDouble
    // t/2 in INTEGER division: DuckDB (rapidfuzz) floors the
    // transposition count when the raw out-of-order positions are odd
    // (possible whenever the matched subsequences permute 3+ distinct
    // chars, e.g. "blue anvil v1"/"blue bolt v1" raw=3 → 1, not 1.5).
    // Exact halving diverged from the oracle on exactly those pairs —
    // first surfaced by the 5× replica's per-copy p_name suffixes (r9).
    val jaro = (md / la + md / lb + (md - t / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var prefix = 0
    val maxPrefix = math.min(4, math.min(la, lb))
    while (prefix < maxPrefix && a.charAt(prefix) == b.charAt(prefix)) prefix += 1
    jaro + prefix * 0.1 * (1.0 - jaro)
  }
}
