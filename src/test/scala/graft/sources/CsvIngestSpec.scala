package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

import java.nio.file.Files

class CsvIngestSpec extends SparkTestBase {

  test("stageSubdir: yyyy-mm, yyyy_mm, misc fallback, 1-digit month") {
    assert(CsvIngest.stageSubdir("purchases_2013-01.csv") === "2013/01")
    assert(CsvIngest.stageSubdir("po_2020_7_extra.csv") === "2020/07")
    assert(CsvIngest.stageSubdir("purchases_1995_03.csv") === "1995/03") // 19xx
    assert(CsvIngest.stageSubdir("nodate.csv") === "misc/00")
    assert(CsvIngest.stageSubdir("199-12.csv") === "misc/00") // 3-digit year
  }

  test("readPositionalWithMeta: filename column + positional cols coexist") {
    val dir = Files.createTempDirectory("graft_csvmeta")
    Files.writeString(dir.resolve("po_2021_04.csv"), "h1,h2\n1,x\n2,y\n")
    val df = CsvIngest.readPositionalWithMeta(spark, dir.toString + "/*.csv")
    val rows = df.orderBy(CsvIngest.pos(1)).collect()
    assert(rows.length === 2)
    assert(rows.forall(_.getAs[String]("SRC_FILENAME") == "po_2021_04.csv"))
    assert(!rows.exists(_.isNullAt(df.columns.indexOf("SRC_FILE_TS"))))
  }

  test("readPositional: header skipped, positional addressing, null-likes") {
    val dir = Files.createTempDirectory("graft_csvspec")
    Files.writeString(dir.resolve("t.csv"),
      """colA,colB,colC
        |1,\N,ok
        |2,NULL,"quoted, comma"
        |3,N/A,
        |""".stripMargin)
    val df = CsvIngest.readPositional(spark, dir.toString + "/*.csv")
    val rows = df.orderBy(CsvIngest.pos(1)).collect()
    assert(rows.length === 3)                 // header not a data row
    assert(rows.map(_.getString(1)).forall(_ == null))  // all null-likes
    assert(rows(1).getString(2) === "quoted, comma")    // quote handling
    assert(rows(2).isNullAt(2))                          // empty → null
  }

  test("row tolerance: ragged rows survive with nulls (ON_ERROR=CONTINUE analog)") {
    val dir = Files.createTempDirectory("graft_csvrag")
    Files.writeString(dir.resolve("t.csv"),
      """a,b,c
        |1,2,3
        |only-one-field
        |4,5,6,EXTRA-FIELD
        |""".stripMargin)
    val df = CsvIngest.readPositional(spark, dir.toString + "/*.csv")
    val rows = df.orderBy(CsvIngest.pos(1)).collect()
    // permissive mode: short rows padded with null, long rows truncated —
    // the job never fails (row-level tolerance, distributed)
    assert(rows.length === 3)
    assert(rows.find(_.getString(0) == "only-one-field").get.isNullAt(1))
    assert(rows.find(_.getString(0) == "4").get.getString(2) === "6")
  }

  test("gzip-compressed CSV reads transparently (AUTO_COMPRESS analog)") {
    val dir = Files.createTempDirectory("graft_csvgz")
    val gz = new java.util.zip.GZIPOutputStream(
      Files.newOutputStream(dir.resolve("t.csv.gz")))
    gz.write("h1,h2\n1,a\n2,b\n".getBytes("UTF-8")); gz.close()
    val df = CsvIngest.readPositional(spark, dir.toString + "/*.csv.gz")
    assert(df.count() === 2)
    assert(df.orderBy(CsvIngest.pos(1)).collect()(1).getString(1) === "b")
  }

  test("write with compression=gzip emits .csv.gz parts that read back (s18)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_csvgzw").toString + "/out"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
      .write.option("header", "true").option("compression", "gzip").csv(dir)
    val parts = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty && parts.forall(_.getName.endsWith(".csv.gz")),
      parts.map(_.getName).mkString(","))
    assert(CsvIngest.readPositional(spark, dir).count() === 3)
  }

  test("per-file headers are skipped across a multi-file glob") {
    val dir = Files.createTempDirectory("graft_csvmulti")
    Files.writeString(dir.resolve("a.csv"), "h1,h2\n1,x\n")
    Files.writeString(dir.resolve("b.csv"), "h1,h2\n2,y\n")
    val df = CsvIngest.readPositional(spark, dir.toString + "/*.csv")
    assert(df.count() === 2)
    assert(df.filter(CsvIngest.pos(1) === "h1").count() === 0)
  }
}
