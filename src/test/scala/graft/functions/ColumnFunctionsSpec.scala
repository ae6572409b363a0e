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
