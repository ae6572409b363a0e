package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class ColumnFunctionsSpec extends SparkTestBase {

  /** Deterministic property loop (no scalatest-scalacheck bridge in the
    * offline cache): draw n samples from a seeded Gen. */
  private def forAllSeeded[A](gen: Gen[A], n: Int)(check: A => Unit): Unit =
    (0 until n).foreach { i =>
      check(gen.pureApply(Gen.Parameters.default, Seed(42L + i)))
    }
  import ColumnFunctions._
  import spark.implicits._

  test("tryToDateMulti: 3 formats accepted, garbage → null") {
    val rows = Seq("2013-01-05", "1/5/2013", "2013/1/5", "13/45/2013", "nope")
      .toDF("s")
      .select(tryToDateMulti(col("s"),
        Seq("yyyy-M-d", "M/d/yyyy", "yyyy/M/d")).as("d"))
      .collect().map(r => Option(r.getDate(0)).map(_.toString))
    assert(rows.take(3).forall(_.contains("2013-01-05")))
    assert(rows.drop(3).forall(_.isEmpty))
  }

  test("tryBigintGuarded ≡ try_cast(bigint) across the accept/reject matrix") {
    // The guard exists to skip the per-row exception on FAILING casts
    // (see its doc); it must never change a result. Matrix covers:
    // plain/signed/whitespace-wrapped integers (accepted), Long.Max,
    // Long.Min, 19-digit overflow (guard admits, TRY nulls), decimal
    // and exponent forms (ANSI integral cast rejects — CLAUDE.md pins
    // '12.5' nulling), garbage, empty, null. Round-6 additions: a
    // valid long with >19 digits via leading zeros, tab/control-char
    // padding (the cast's trimAll is wider than regex \s — it trims
    // isWhitespace ∪ isISOControl), NBSP padding (trimmed by NEITHER
    // engine path — both null), and an all-zeros run.
    val inputs = Seq("42", "+7", "-13", "  99  ", "9223372036854775807",
      "-9223372036854775808", "9999999999999999999", "12.5", "1e3",
      "TYPE-0", "", " ", "abc", null,
      "00000000000000000042", "000000000000000000000", "\t42\n",
      "\u0000" + "42" + "\u0000", "\u001c" + "42" + "\u001f",
      "\u00a0" + "42")
    val df = inputs.toDF("s")
    val got = df.select(tryBigintGuarded(col("s")).as("g"),
        col("s").try_cast("bigint").as("t"))
      .collect()
    got.zip(inputs).foreach { case (r, in) =>
      assert(r.isNullAt(0) == r.isNullAt(1) &&
        (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
        s"input '$in': guarded=${r.get(0)} try_cast=${r.get(1)}")
    }
    assert(got.count(!_.isNullAt(0)) == 11) // the eleven integral forms
  }

  test("property: tryBigintGuarded ≡ try_cast(bigint) on random strings") {
    // the matrix test pins the known corners; this hammers the guard
    // with adversarial near-numeric garbage (digits, signs, spaces,
    // dots, exponent chars, unicode) — any divergence from try_cast
    // is a bug in the guard regex, whichever way it falls
    val numericish = Gen.listOf(Gen.oneOf(
      Gen.numChar, Gen.oneOf('+', '-', ' ', '.', 'e', 'E', '_', ',', '\t',
        '0', '9', 'a', '∞', '١'))).map(_.mkString)
    forAllSeeded(Gen.listOfN(64, numericish), 8) { batch =>
      val rows = batch.toDF("s")
        .select(tryBigintGuarded(col("s")).as("g"),
          col("s").try_cast("bigint").as("t"))
        .collect()
      rows.zip(batch).foreach { case (r, in) =>
        assert(r.isNullAt(0) == r.isNullAt(1) &&
          (r.isNullAt(0) || r.getLong(0) == r.getLong(1)),
          s"input '$in': guarded=${r.get(0)} try_cast=${r.get(1)}")
      }
    }
  }

  test("TRY_TO_NUMBER corner semantics: leading +, spaces, thousands " +
      "separators, fraction-into-int (SURVEY §7 risk list)") {
    def num38(s: String): Option[java.math.BigDecimal] = {
      val r = Seq(s).toDF("s").select(tryToNumber38(col("s"))).head()
      Option(r.getDecimal(0))
    }
    // Snowflake TO_NUMBER accepts an explicit leading sign — so does
    // Spark's cast
    assert(num38("+12").map(_.longValueExact()) === Some(12L))
    assert(num38("-12").map(_.longValueExact()) === Some(-12L))
    // surrounding whitespace is trimmed before parsing (both engines)
    assert(num38(" 42 ").map(_.longValueExact()) === Some(42L))
    // thousands separators WITHOUT a grouped format are a parse error
    // → NULL (Snowflake plain TRY_TO_NUMBER agrees; DuckDB TRY_CAST
    // also nulls)
    assert(num38("1,234") === None)
    // double signs / stray text → NULL, never an ANSI error
    assert(num38("++1") === None)
    assert(num38("12abc") === None)
    // fractional string into a scale-0 target: Spark TRY_CAST *rounds*
    // to the target scale (12.5 → 13, half-up) — Snowflake
    // TO_NUMBER(x) defaults to scale 0 and rounds the same way; DuckDB
    // TRY_CAST(... AS INT) is the engine that rounds-to-even. Pinned
    // here so oracle SQL never routes this pattern through DuckDB INT
    // casts (CLAUDE.md invariant).
    assert(num38("12.5").map(_.longValueExact()) === Some(13L))
  }

  test("tryToNumberGrouped: thousands separators parse only via the " +
      "grouped form; overflow still nulls") {
    def grouped(s: String, p: Int = 38, sc: Int = 0): Option[java.math.BigDecimal] = {
      val r = Seq(s).toDF("s").select(tryToNumberGrouped(col("s"), p, sc)).head()
      Option(r.getDecimal(0))
    }
    assert(grouped("1,234,567").map(_.longValueExact()) === Some(1234567L))
    assert(grouped("12").map(_.longValueExact()) === Some(12L))
    // positionally sloppy grouping is accepted (documented leniency)
    assert(grouped("1,23,4").map(_.longValueExact()) === Some(1234L))
    assert(grouped("nope") === None)
    // TRY_TO_NUMERIC overflow: value exceeding DECIMAL(p,s) capacity
    // → NULL, not an error (Snowflake and Spark try_cast agree)
    assert(grouped("12345", p = 4, sc = 0) === None)
    assert(grouped("9,999", p = 4, sc = 0).map(_.longValueExact()) === Some(9999L))
  }

  test("tryToNumeric: precision/scale overflow and rounding at scale " +
      "boundaries") {
    def numeric(s: String, p: Int, sc: Int): Option[String] = {
      val r = Seq(s).toDF("s").select(tryToNumeric(col("s"), p, sc)).head()
      Option(r.getDecimal(0)).map(_.toPlainString)
    }
    assert(numeric("123.4567", 18, 4) === Some("123.4567"))
    // extra fractional digits round half-up into the target scale
    assert(numeric("1.00005", 18, 4) === Some("1.0001"))
    assert(numeric("1.00004", 18, 4) === Some("1.0000"))
    // integer part wider than p-s → NULL (no truncation, no error)
    assert(numeric("100000", 7, 4) === None)
    assert(numeric("999.9999", 7, 4) === Some("999.9999"))
  }

  test("nullIfIn + nullifEmpty + intFlag corner cases") {
    val out = Seq(("\\N", "", "2"), ("ok", "x", "1"), ("N/A", "y", "0"))
      .toDF("a", "b", "f")
      .select(
        nullIfIn(col("a"), Seq("\\N", "NULL", "", "N/A")).as("a"),
        nullifEmpty(col("b")).as("b"),
        intFlag(col("f")).as("f"))
      .collect()
    assert(out(0).isNullAt(0) && out(0).isNullAt(1) && !out(0).getBoolean(2))
    assert(out(1).getString(0) == "ok" && out(1).getString(1) == "x"
      && out(1).getBoolean(2))
    assert(out(2).isNullAt(0) && !out(2).getBoolean(2))
  }

  test("zip5: strip non-digits then left-pad/truncate to 5") {
    val out = Seq("60601", "6-0601", "601", "98x52", "abcdef")
      .toDF("z").select(zip5(col("z"))).collect().map(_.getString(0))
    assert(out.toSeq === Seq("60601", "60601", "00601", "09852", "00000"))
  }

  test("property: haversine is symmetric, zero on self, bounded by πR") {
    val coords = for {
      lat1 <- Gen.choose(-89.0, 89.0); lon1 <- Gen.choose(-179.0, 179.0)
      lat2 <- Gen.choose(-89.0, 89.0); lon2 <- Gen.choose(-179.0, 179.0)
    } yield (lat1, lon1, lat2, lon2)
    forAllSeeded(coords, 30) { case (lat1, lon1, lat2, lon2) =>
      val Array(dAB, dBA, dAA) =
        Seq((lat1, lon1, lat2, lon2)).toDF("a", "b", "c", "d")
          .select(
            haversineKm(col("a"), col("b"), col("c"), col("d")),
            haversineKm(col("c"), col("d"), col("a"), col("b")),
            haversineKm(col("a"), col("b"), col("a"), col("b")))
          .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
      assert(math.abs(dAB - dBA) < 1e-6)
      assert(dAA === 0.0)
      assert(dAB >= 0.0 && dAB <= math.Pi * 6371.0 + 1e-6)
    }
  }
}
