package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.graft.{BpeMerge, ColumnShim, WordShingleMulti}

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def merge(sym: String, l: String, r: String): String =
    Seq(sym).toDF("s").select(ColumnShim.column(BpeMerge(
      ColumnShim.expression(col("s")),
      ColumnShim.expression(lit(l)),
      ColumnShim.expression(lit(r))))).as[String].head()

  private def pairs(sym: String): Seq[String] =
    Seq(sym).toDF("s").select(ColumnShim.column(WordShingleMulti(
      ColumnShim.expression(col("s")), 2))).as[Seq[String]].head()

  test("merge is left-to-right and non-overlapping") {
    assert(merge("a b a b a b", "a", "b") === "ab ab ab")
    assert(merge("h e l l o", "l", "l") === "h e ll o")
    assert(merge("a a b", "a", "b") === "a ab")
    // a merged symbol never serves as LEFT within the same step
    assert(merge("a b b", "a", "b") === "ab b")
  }

  test("left==right runs merge at even run offsets only") {
    assert(merge("a a a", "a", "a") === "aa a")
    assert(merge("a a a a", "a", "a") === "aa aa")
    assert(merge("a a a a a", "a", "a") === "aa aa a")
  }

  test("no-match and single-token sequences pass through") {
    assert(merge("x y z", "a", "b") === "x y z")
    assert(merge("x", "a", "b") === "x")
    // whole-token equality, not substring: "xa b" must not merge on (a,b)
    assert(merge("xa b", "a", "b") === "xa b")
    assert(merge("a bx", "a", "b") === "a bx")
  }

  test("pair shingles keep multiplicity and order") {
    assert(pairs("a b a b") === Seq("a b", "b a", "a b"))
    assert(pairs("a") === Seq.empty)
    assert(pairs("l l l") === Seq("l l", "l l"))
  }

  test("x31b encoding bounds: words <= bpe tokens <= chars, ppm exact") {
    val out = graft.ExtensionQueries
      .x31bBpeEncode(spark, "/root/testdata/sf0.001").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, c, t, ppm) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(w <= t && t <= c, s"bounds violated for ${r.getLong(0)}")
      assert(ppm === c * 1000000L / t)
    }
  }

  test("x31 learns a deterministic 8-merge table on the fixture") {
    val d = "/root/testdata/sf0.001"
    val out = graft.ExtensionQueries.x31BpeMerges(spark, d).collect()
    assert(out.length === 8)
    out.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) === i + 1)
      assert(r.getString(3) === r.getString(1) + r.getString(2))
      assert(r.getLong(4) > 0L)
    }
    // rerun-stable: the merge table is a deterministic corpus artifact
    // (buildBpeMerges bypasses the session memo, so this re-learns)
    val a = graft.ExtensionQueries.buildBpeMerges(spark, d)
    val b = graft.ExtensionQueries.buildBpeMerges(spark, d)
    assert(a === b)
    assert(out.map(r => (r.getInt(0), r.getString(1), r.getString(2),
      r.getString(3), r.getLong(4))).toSeq === a)
  }
}
