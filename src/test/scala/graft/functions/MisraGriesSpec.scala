package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MisraGriesSpec extends SparkTestBase {
  import spark.implicits._

  private def sketch(items: Seq[String], k: Int, parts: Int) =
    items.toDF("term").repartition(parts)
      .agg(MisraGriesAgg.misraGries(k)(col("term")).as("st"))
      .select(col("st.total"), col("st.keys"))
      .as[(Long, Seq[String])].head()

  test("recall guarantee: every item above total/(k+1) survives") {
    // zipf-ish stream: item i appears 1000/i times, shuffled deterministically
    val items = (1 to 40).flatMap(i => Seq.fill(1000 / i)(s"w$i"))
    val shuffled = new scala.util.Random(7).shuffle(items)
    for (parts <- Seq(1, 2, 7); k <- Seq(4, 8, 16)) {
      val (total, keys) = sketch(shuffled, k, parts)
      assert(total === items.size)
      val exact = items.groupBy(identity).view.mapValues(_.size.toLong)
      val mustKeep = exact.collect {
        case (w, c) if c > total.toDouble / (k + 1) => w
      }.toSet
      assert(mustKeep.subsetOf(keys.toSet),
        s"k=$k parts=$parts missing ${mustKeep -- keys.toSet}")
      assert(keys.size <= k)
    }
  }

  test("all-distinct stream keeps state bounded and total exact") {
    val (total, keys) = sketch((1 to 5000).map(i => s"u$i"), 8, 3)
    assert(total === 5000L)
    assert(keys.size <= 8)
  }

  test("x25 query is deterministic and exact regardless of partitioning") {
    val d = "/root/testdata/sf0.001"
    val base = graft.ExtensionQueries.x25HeavyHitters(spark, d)
      .collect().map(_.toSeq).toSeq
    assert(base.nonEmpty)
    // exact recount without any sketch
    val tok = graft.Tables.documents(spark, d)
      .select(explode(split(lower(col("text")), "[^a-z]+")).as("term"))
      .filter(col("term") =!= "")
    val total = tok.count()
    val exact = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * 50 >= total)
      .select(col("term"), col("cnt"),
        expr(s"cnt * 1000000 div ${total}L").as("share_ppm"))
      .orderBy(col("cnt").desc, col("term"))
      .collect().map(_.toSeq).toSeq
    assert(base === exact)
  }
}
