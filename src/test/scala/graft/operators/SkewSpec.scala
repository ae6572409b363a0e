package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkewSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin equals plain join on skewed data") {
    // heavy-tailed: 900 rows of key 1, a few others
    val probe = ((1 to 900).map(i => (1L, i)) ++ Seq((2L, 1), (3L, 2)))
      .toDF("k", "payload")
    val build = Seq((1L, "hot"), (2L, "warm"), (4L, "unmatched"))
      .toDF("k", "label")
    val plain = probe.join(build, Seq("k"), "inner")
      .orderBy("k", "payload")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(probe, build, "k", factor = 8)
      .select("k", "payload", "label")
      .orderBy("k", "payload")
      .collect().map(_.toSeq).toSeq
    assert(salted === plain)
    assert(salted.count(_.head == 1L) === 900)
  }
}
