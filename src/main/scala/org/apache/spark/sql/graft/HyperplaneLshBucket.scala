package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, FloatType, LongType}

/** Native Catalyst expression: sign-bit hyperplane-LSH bucket id of an
  * `array<float>` embedding — bit `p` set iff the dot product with
  * pseudo-random hyperplane `p` is ≥ 0.
  *
  * Bit-identical to the composed-builtins formulation
  * (Similarity.lshBucketHof): plane weights are
  * `pmod(xxhash64(p, i), 2000001)/1e6 − 1` (deterministic, no RNG
  * state), accumulation is a left fold in double over ascending i.
  *
  * Why an Expression: the HOF form rebuilds the weight vector with
  * `transform(sequence(...))` and folds with interpreted lambdas PER
  * ROW PER PLANE — O(nPlanes·dim) lambda frames plus the hash
  * recomputation for weights that are constants of (p, i). Here the
  * weight matrix is computed once per operator instance and the per-row
  * work is the nPlanes·dim fused multiply-add loop inside whole-stage
  * codegen — what a map-only bucketing stage over 10⁹ embeddings must
  * cost. Measured ~100× per-row (see PERF.md ANN stress).
  */
case class HyperplaneLshBucket(child: Expression, dim: Int, nPlanes: Int,
    planeOffset: Int = 0)
    extends UnaryExpression with ExpectsInputTypes {

  require(nPlanes >= 1 && nPlanes <= 63, "nPlanes must be in [1, 63]")
  require(planeOffset >= 0, "planeOffset must be >= 0")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))

  override def dataType: DataType = LongType

  @transient private lazy val weights: Array[Double] =
    LshUtil.planeWeights(dim, nPlanes, planeOffset)

  override def nullSafeEval(input: Any): Any =
    LshUtil.bucket(input.asInstanceOf[ArrayData], weights, dim, nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("lshWeights", weights, "double[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.LshUtil.bucket($c, $w, $dim, $nPlanes);")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneLshBucket =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_lsh_bucket"
}

object LshUtil {

  /** weights(p*dim + i) = the (plane p+offset, dimension i) weight,
    * exactly the value `(pmod(xxhash64(p+offset, i), 2000001) - 1e6) /
    * 1e6` computes: xxhash64 of two int arguments is the seed-chained
    * XXH64 (42 → plane → index). `planeOffset` gives each LSH table its
    * own independent plane family (table t uses planes t·r..t·r+r-1). */
  def planeWeights(dim: Int, nPlanes: Int, planeOffset: Int = 0): Array[Double] = {
    val w = new Array[Double](nPlanes * dim)
    var p = 0
    while (p < nPlanes) {
      val hp = XXH64.hashInt(p + planeOffset, 42L)
      var i = 0
      while (i < dim) {
        val h = XXH64.hashInt(i, hp)
        val m = 2000001L
        val pm = ((h % m) + m) % m // pmod: non-negative remainder
        w(p * dim + i) = (pm.toDouble - 1000000.0) / 1000000.0
        i += 1
      }
      p += 1
    }
    w
  }

  def bucket(vec: ArrayData, weights: Array[Double], dim: Int, nPlanes: Int): Long = {
    // HOF-parity edge: on a length mismatch zip_with pads with nulls,
    // the fold turns null, `when(null >= 0, bit)` falls to the
    // otherwise(0) branch for every plane → code 0. Mirror that
    // instead of silently truncating to min(len, dim).
    if (vec.numElements() != dim) return 0L
    var code = 0L
    var p = 0
    while (p < nPlanes) {
      var proj = 0.0
      val base = p * dim
      var i = 0
      while (i < dim) {
        proj += vec.getFloat(i).toDouble * weights(base + i)
        i += 1
      }
      // Spark SQL orders NaN greater than every double (so NaN >= 0 is
      // TRUE there); Java says false — follow Spark for bit parity.
      if (proj >= 0 || java.lang.Double.isNaN(proj)) code |= 1L << p
      p += 1
    }
    code
  }
}
