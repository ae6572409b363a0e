package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class XmlShredSpec extends SparkTestBase {
  import spark.implicits._

  private val good = "<R><T><A>1</A><B>x</B></T><T><A>2</A></T></R>"
  private val bad = "<R><T><A>1</A>"  // unclosed

  test("shredDoc: document order, missing tags absent, nested text concat") {
    val maps = XmlShred.shredDoc(
      "<R><T><A>1</A><B>hi <i>there</i>!</B></T><T><B>only-b</B></T></R>")
    assert(maps.length === 2)
    assert(maps(0)("A") === "1")
    assert(maps(0)("B") === "hi there!")   // nested element text concatenated
    assert(!maps(1).contains("A"))
  }

  test("strict mode aborts on malformed XML (reference ABORT_STATEMENT)") {
    val df = Seq(good, bad).toDF("DOC")
    intercept[org.apache.spark.SparkException] {
      XmlShred.explodeDocs(df).collect()
    }
  }

  test("permissive mode drops malformed documents, keeps the rest") {
    val df = Seq(good, bad).toDF("DOC")
    val out = XmlShred.explodeDocs(df, permissive = true)
      .select(col("XML_INDEX"), XmlShred.xmlGet("A").as("a")).collect()
    assert(out.length === 2) // both records of the good doc, bad doc dropped
    assert(out.map(_.getString(1)).toSet === Set("1", "2"))
  }

  test("empty and element-less documents yield zero rows") {
    val df = Seq("<R></R>", "<R>whitespace only</R>").toDF("DOC")
    assert(XmlShred.explodeDocs(df).count() === 0)
  }
}
