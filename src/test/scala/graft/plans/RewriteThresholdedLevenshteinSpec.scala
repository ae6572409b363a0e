package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._

class RewriteThresholdedLevenshteinSpec extends SparkTestBase {
  import spark.implicits._

  // parquet-backed (a LocalRelation would be constant-folded through
  // the filter and leave no Levenshtein in the optimized plan at all)
  private lazy val pairs: DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_lev").toString
    Seq(
      ("kitten", "sitting"),   // dist 3
      ("flaw", "lawn"),        // dist 2
      ("abc", "abc"),          // dist 0
      ("aaaa", "zzzz"),        // dist 4
      (null.asInstanceOf[String], "x")
    ).toDF("a", "b").write.mode("overwrite").parquet(dir)
    spark.read.parquet(dir)
  }

  private def thresholded(df: DataFrame): Seq[Levenshtein] =
    df.queryExecution.optimizedPlan
      .collect { case node => node.expressions }.flatten
      .flatMap(_.collect { case l @ Levenshtein(_, _, Some(_)) => l })

  test("lev(a,b) <= k predicate is rewritten to the banded form") {
    val q = pairs.filter(levenshtein(col("a"), col("b")) <= 2)
    assert(thresholded(q).nonEmpty, "expected a thresholded levenshtein")
    assert(q.select("a").collect().map(_.getString(0)).toSet
      === Set("flaw", "abc"))
  }

  test("strict < and reversed spellings rewrite too, same results") {
    val lt = pairs.filter(levenshtein(col("a"), col("b")) < 3)
    val rev = pairs.filter(lit(3) >= levenshtein(col("a"), col("b")))
    assert(thresholded(lt).nonEmpty && thresholded(rev).nonEmpty)
    assert(lt.count() === 2)  // dist 2 and 0
    assert(rev.count() === 3) // dist 3, 2, 0
  }

  test("a projected full distance is NOT rewritten") {
    val q = pairs.select(levenshtein(col("a"), col("b")).as("d"))
    assert(thresholded(q).isEmpty)
    assert(q.collect().map(r => Option(r.get(0))).count(_.isDefined) === 4)
  }

  test("pushdown case: filter on a projected alias still rewrites") {
    val q = pairs.select(col("a"),
        levenshtein(col("a"), col("b")).as("d"))
      .filter(col("d") <= 2)
    assert(thresholded(q).nonEmpty)
    assert(q.select("a").collect().map(_.getString(0)).toSet
      === Set("flaw", "abc"))
  }
}
