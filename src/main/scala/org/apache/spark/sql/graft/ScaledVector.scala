package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, Decimal, DoubleType, LongType}

/** Native expressions for the EXACT quantized vector path — the oracle
  * form of the vector queries without the per-dimension relational
  * explode.
  *
  * The oracle contract (CLAUDE.md): vector math quantizes floats to
  * DECIMAL(9,6) first so sums are exact and order-independent, which is
  * what lets a DuckDB oracle hash-match a distributed Spark sum. The
  * original formulation got that exactness from a relational layout —
  * `posexplode` to (vec_id, i, v DECIMAL) rows, dots via an
  * equi-join on i and a SUM aggregate — paying O(n·K·dim) exploded
  * rows, a shuffle, and a hash aggregate per dot product.
  *
  * These two expressions keep the arithmetic IDENTICAL and drop the
  * relational detour: a DECIMAL(9,6) value is an integer number of
  * 1e-6 units, so each vector quantizes once to `array<long>` of
  * unscaled units ([[QuantizeDecimal6]], the same
  * `Decimal(d).changePrecision(9,6)` rounding as Spark's
  * double→decimal cast), and a dot product is an exact integer sum of
  * scale-12 long products ([[ScaledDotProduct]], overflow-checked) —
  * the same exact rational the decimal SUM produced, as one fused
  * per-row loop in whole-stage codegen. Downstream cosine math then
  * converts scale-12 longs to double with one exact division by 1e12:
  * a scale-12 BigDecimal's `.doubleValue()` and `(double)unscaled/1e12`
  * are both correctly-rounded-to-nearest, so the doubles — and any
  * ROUND(…, 6) of them — are bit-identical to the decimal-cast path.
  *
  * Domain: |element| must stay under ~3.0e3 so a 64-dim scale-12 sum
  * fits a long with headroom ([[ScaledDotProduct]] uses exact ops and
  * throws on overflow rather than wrapping silently); embeddings here
  * are unit-scale (|v| ≤ 0.58).
  */
case class QuantizeDecimal6(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(a: Any): Any =
    QuantizeDecimal6.quantize(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.QuantizeDecimal6.quantize($a)")

  override protected def withNewChildInternal(c: Expression): QuantizeDecimal6 =
    copy(child = c)
  override def prettyName: String = "quantize_decimal6"
}

object QuantizeDecimal6 {
  /** Spark's own double→DECIMAL(9,6) rounding (HALF_UP on the shortest
    * decimal representation), returned as unscaled 1e-6 units. Called
    * once per ROW from generated code — the element loop runs compiled
    * here, not interpreted per element. */
  def quantize(x: ArrayData): ArrayData = {
    val n = x.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = Decimal(x.getDouble(i))
      if (!d.changePrecision(9, 6))
        throw new ArithmeticException(
          s"quantize_decimal6: ${x.getDouble(i)} overflows DECIMAL(9,6)")
      out(i) = d.toUnscaledLong
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Exact integer dot product of two unscaled-long vectors (see
  * [[QuantizeDecimal6]]): scale-6 in, scale-12 out. Overflow throws
  * (exact ops) — silent wraparound would corrupt oracle sums. */
case class ScaledDotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    ScaledDotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.graft.ScaledDotProduct.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ScaledDotProduct =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "scaled_dot"
}

object ScaledDotProduct {
  def dot(x: ArrayData, y: ArrayData): Long = {
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    acc
  }
}
