package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{ColumnShim, QuantizeDecimal6, ScaledDotProduct}

/** Pins the quantized-long exact vector path to the decimal-relational
  * reference it replaced in the ORACLE queries (x5/x5b/x6/x6b/x22):
  * this is a bit-equality contract, not an eps-tolerance twin — both
  * paths compute the same DECIMAL(9,6) rational and the same
  * correctly-rounded doubles, so every row must match exactly, at two
  * corpus sizes. Plus unit pins on the two expressions themselves. */
class ScaledVectorSpec extends SparkTestBase {
  import spark.implicits._

  private def q6(c: org.apache.spark.sql.Column) =
    ColumnShim.column(QuantizeDecimal6(ColumnShim.expression(c)))
  private def sdot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    ColumnShim.column(ScaledDotProduct(
      ColumnShim.expression(a), ColumnShim.expression(b)))

  test("quantize_decimal6 == Spark's double→DECIMAL(9,6) cast, incl. " +
      "HALF_UP ties and float-artifact values") {
    val vals = Seq(0.0000005, -0.0000005, 0.0000015, -0.0000015,
      0.1f.toDouble, 0.5773653984069824, -0.5193882584571838, 0.0,
      123.4567894999, -0.9999995, 999.9999994)
    val df = Seq(Tuple1(vals)).toDF("arr")
    val want = df.select(posexplode(col("arr")))
      .select((col("col").cast("decimal(9,6)") * 1000000).cast("long"))
      .as[Long].collect().toSeq
    val got = df.select(explode(q6(col("arr"))))
      .as[Long].collect().toSeq
    assert(got === want)
  }

  test("quantize_decimal6 == cast over seeded random regimes " +
      "(magnitudes, float artifacts, exact 0.5e-6 ties)") {
    // no scalatest-scalacheck bridge offline — seeded Gen loop, the
    // ColumnFunctionsSpec pattern, batched into one comparison
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val regimes: Gen[Double] = Gen.oneOf(
      Gen.chooseNum(-999.999999, 999.999999),
      Gen.chooseNum(-1.0, 1.0),
      Gen.chooseNum(-1e-5, 1e-5),
      Gen.chooseNum(-999f, 999f).map(_.toDouble), // float artifacts
      Gen.chooseNum(-1999999L, 1999999L).map(_ / 2e6)) // exact ties
    val vals = (0 until 2000).map(i =>
      regimes.pureApply(Gen.Parameters.default, Seed(42L + i)))
    val df = Seq(Tuple1(vals)).toDF("arr")
    val want = df.select(posexplode(col("arr")))
      .select((col("col").cast("decimal(9,6)") * 1000000).cast("long"))
      .as[Long].collect().toSeq
    val got = df.select(explode(q6(col("arr")))).as[Long].collect().toSeq
    assert(got === want)
  }

  test("quantize_decimal6 overflows loudly past DECIMAL(9,6)") {
    val df = Seq(Tuple1(Seq(1000.0))).toDF("arr")
    val e = intercept[Exception] {
      df.select(q6(col("arr"))).collect()
    }
    assert(e.getMessage.contains("DECIMAL(9,6)") ||
      e.getCause != null && e.getCause.getMessage.contains("DECIMAL(9,6)"))
  }

  test("scaled_dot is the exact integer dot product") {
    val df = Seq((Seq(2000000L, -3L, 500000L), Seq(1000000L, 7L, -4L)))
      .toDF("a", "b")
    val got = df.select(sdot(col("a"), col("b"))).as[Long].head()
    assert(got === 2000000L * 1000000L + (-3L * 7L) + 500000L * -4L)
  }

  test("scaled_dot throws on dimension mismatch instead of truncating") {
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    val e = intercept[Exception] { df.select(sdot(col("a"), col("b"))).collect() }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("dimension mismatch"))
  }

  test("scaled_dot throws loudly past the 2^53 exact-double bound") {
    // 3e9 * 4e9 = 1.2e19 wraps a long → addExact/multiplyExact throws;
    // 1e8 * 1e8 = 1e16 > 2^53 ≈ 9.007e15 fits a long but breaks the
    // bit-equality contract → the explicit guard throws.
    val wrap = Seq((Seq(3000000000L), Seq(4000000000L))).toDF("a", "b")
    intercept[Exception] { wrap.select(sdot(col("a"), col("b"))).collect() }
    val inexact = Seq((Seq(100000000L), Seq(100000000L))).toDF("a", "b")
    val e = intercept[Exception] {
      inexact.select(sdot(col("a"), col("b"))).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("2^53"))
  }

  test("quantize_decimal6 throws on null array elements (decimal " +
      "reference null-skips via SUM — silent divergence otherwise)") {
    val df = Seq(Tuple1(Seq[java.lang.Double](1.0, null, 2.0))).toDF("arr")
    val e = intercept[Exception] { df.select(q6(col("arr"))).collect() }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("null element"))
  }

  private val queryPairs: Seq[(String, String,
      (org.apache.spark.sql.SparkSession, String, Boolean) =>
        org.apache.spark.sql.DataFrame)] = Seq(
    ("x5_ann_cosine", "/root/testdata/sf0.01",
      ExtensionQueries.x5AnnCosineTopKImpl _),
    ("x5b_ann_lsh", "/root/testdata/sf0.001",
      ExtensionQueries.x5bAnnLshTopKImpl _),
    ("x6_neardup", "/root/testdata/sf0.001",
      ExtensionQueries.x6EmbeddingNearDupImpl _),
    ("x6b_neardup_lsh", "/root/testdata/sf0.001",
      ExtensionQueries.x6bNearDupLshImpl _),
    ("x22_topic_balance", "/root/testdata/sf0.01",
      ExtensionQueries.x22TopicBalanceImpl _))

  queryPairs.foreach { case (name, dir, impl) =>
    test(s"$name: quantized path is row-for-row bit-identical to the " +
        s"decimal-relational reference ($dir)") {
      val quantized = impl(spark, dir, false).collect().toSeq
      val reference = impl(spark, dir, true).collect().toSeq
      assert(quantized.size === reference.size)
      quantized.zip(reference).foreach { case (g, w) =>
        assert(g === w, s"$name row mismatch")
      }
    }
  }
}
