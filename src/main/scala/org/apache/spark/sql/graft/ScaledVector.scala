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
  * Domain: bit-equality with the decimal-cast path additionally needs
  * the scale-12 result within ±2^53 — beyond that, long→double is no
  * longer exact and the cast+divide double-rounds relative to a
  * BigDecimal `.doubleValue()`. [[ScaledDotProduct]] therefore throws
  * both on long wraparound (exact ops) AND when |result| exceeds 2^53,
  * so the contract cannot be silently exceeded; embeddings here are
  * unit-scale (|v| ≤ 0.58), far inside the exact region.
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
      if (x.isNullAt(i))
        throw new IllegalArgumentException(
          s"quantize_decimal6: null element at index $i — the decimal " +
            "reference null-skips via SUM; quantized vectors must be dense")
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
  private final val Exact53 = 1L << 53

  def dot(x: ArrayData, y: ArrayData): Long = {
    val n = x.numElements()
    if (n != y.numElements())
      throw new IllegalArgumentException(
        s"scaled_dot: dimension mismatch ($n vs ${y.numElements()}) — " +
          "equal dims are an invariant of every call site")
    var acc = 0L
    var i = 0
    while (i < n) {
      acc = Math.addExact(acc, Math.multiplyExact(x.getLong(i), y.getLong(i)))
      i += 1
    }
    if (acc > Exact53 || acc < -Exact53)
      throw new ArithmeticException(
        s"scaled_dot: |$acc| exceeds 2^53 — long→double is no longer " +
          "exact here, breaking bit-equality with the decimal reference")
    acc
  }
}
