package graft.plans

import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f, 3.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (2L, Array(0.3f, -0.7f, 0.2f), Array(-0.1f, 0.9f, 0.4f))
  ).toDF("id", "a", "b")

  test("native expression agrees with the HOF reference implementation") {
    val rows = vecs.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineHof(col("a"), col("b")).as("hof")).collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6,
        s"native=${r.getDouble(0)} hof=${r.getDouble(1)}")
    }
    assert(math.abs(rows(0).getDouble(0) - 1.0) < 1e-12)
    assert(rows(1).getDouble(0) === 0.0)
  }

  test("null inputs propagate null") {
    val out = Seq((Option.empty[Array[Float]], Option(Array(1.0f))))
      .toDF("a", "b")
      .select(Similarity.cosine(col("a"), col("b"))).head()
    assert(out.isNullAt(0))
  }

  test("registered as SQL function via GraftExtensions") {
    vecs.createOrReplaceTempView("cos_vecs")
    val out = spark.sql(
      "SELECT cosine_sim(a, b) FROM cos_vecs WHERE id = 0").head()
    assert(math.abs(out.getDouble(0) - 1.0) < 1e-12)
  }

  test("stays inside WholeStageCodegen over a parquet scan") {
    // a LocalTableScan is computed driver-side, so use a file source
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val plan = emb.select(Similarity.cosine(col("embedding"), col("embedding")))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators fused into WholeStageCodegen
    assert(plan.contains("*(1) Project"), plan)
    assert(plan.contains("cosine_sim"), plan)
  }
}
