package graft
import org.apache.spark.sql.SparkSession
object TimeOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def dfFor(n: String) = n match {
      case "sig128" => operators.Dedup.minhashSignature(Tables.documents(spark, sfDir), "doc_id", "text", 3, 128)
      case "sig64"  => operators.Dedup.minhashSignature(Tables.documents(spark, sfDir), "doc_id", "text", 3, 64)
      case other    => SparkEntry.queries(other)(spark, sfDir)
    }
    SparkEntry.queries("a1_po_totals")(spark, sfDir).write.format("noop").mode("overwrite").save()
    (1 to reps).foreach { r =>
      val t0 = System.nanoTime()
      dfFor(name).write.format("noop").mode("overwrite").save()
      println(f"[timeone] $name rep$r: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
