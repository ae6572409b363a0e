package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** XML ingestion + shredding (SURVEY.md §2a S6/S7, reference
  * BlueForty.py:128-201): whole XML documents land as raw strings (the
  * VARIANT analog), then a lateral explode turns each repeated child
  * element of the document root into one row, exposing per-element
  * named-child text (the `XMLGET(t.value,'Tag'):"$"` accessor) and the
  * 0-based element ordinal (Snowflake `FLATTEN ... t.index`).
  *
  * spark-xml isn't on the offline classpath, so parsing is a scala-xml
  * UDF that runs once per *document* (not per extracted field) and
  * returns an array of name→text maps in document order; `posexplode`
  * then restores the ordinal distributively. Documents are independent
  * rows, so the shred parallelizes across files/documents — the UDF cost
  * is one DOM parse per document at ingest, off every query's hot path.
  */
object XmlShred {

  /** Read whole XML files as (DOC, SRC_FILENAME) — the
    * SUPPLIER_INVOICES_XML_RAW shape (BlueForty.py:159-176). */
  def readRaw(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("text").option("wholetext", "true").load(pathGlob)
      .select(col("value").as("DOC"),
        col("_metadata.file_name").as("SRC_FILENAME"))

  /** doc string → array of (child-element-name → concatenated text) for
    * each repeated element under the root, in document order. Missing
    * children are simply absent (getItem → NULL, matching XMLGET's NULL
    * for a missing tag).
    *
    * Parsed with StAX (streaming pull parser): one pass, no DOM
    * materialization — a DOM parse (scala.xml) allocates a node tree
    * per document, which dominates shred time and bounds document size
    * by heap; streaming keeps memory O(record) so multi-GB documents
    * shred fine. Field text concatenates all descendant text in
    * document order (XMLGET ':"$"' semantics for simple elements). */
  private val xmlFactory = new ThreadLocal[javax.xml.stream.XMLInputFactory] {
    override def initialValue(): javax.xml.stream.XMLInputFactory = {
      val f = javax.xml.stream.XMLInputFactory.newInstance()
      f.setProperty(javax.xml.stream.XMLInputFactory.IS_COALESCING, true)
      f.setProperty(javax.xml.stream.XMLInputFactory.SUPPORT_DTD, false)
      f
    }
  }

  private[sources] def shredDoc(doc: String): Array[Map[String, String]] = {
    import javax.xml.stream.XMLStreamConstants._
    val out = scala.collection.mutable.ArrayBuffer.empty[Map[String, String]]
    val r = xmlFactory.get().createXMLStreamReader(new java.io.StringReader(doc))
    try {
      var depth = 0
      var record: scala.collection.mutable.Map[String, String] = null
      var fieldName: String = null
      var fieldText: java.lang.StringBuilder = null
      while (r.hasNext) {
        r.next() match {
          case START_ELEMENT =>
            depth += 1
            if (depth == 2) record = scala.collection.mutable.Map.empty
            else if (depth == 3) {
              fieldName = r.getLocalName
              fieldText = new java.lang.StringBuilder
            }
          case CHARACTERS | CDATA =>
            if (depth >= 3 && fieldText != null) fieldText.append(r.getText)
          case END_ELEMENT =>
            if (depth == 3 && record != null) {
              record.put(fieldName, fieldText.toString)
              fieldName = null; fieldText = null
            } else if (depth == 2 && record != null) {
              out += record.toMap
              record = null
            }
            depth -= 1
          case _ => ()
        }
      }
    } finally r.close()
    out.toArray
  }

  private val shredToMaps = udf { (doc: String) =>
    if (doc == null) Array.empty[Map[String, String]] else shredDoc(doc)
  }

  /** Malformed documents yield zero rows instead of failing the job —
    * the ON_ERROR='CONTINUE' posture, per-document. */
  private val shredToMapsPermissive = udf { (doc: String) =>
    if (doc == null) Array.empty[Map[String, String]]
    else try shredDoc(doc)
    catch { case _: javax.xml.stream.XMLStreamException =>
      Array.empty[Map[String, String]] }
  }

  /** Explode a raw-doc DataFrame: one output row per repeated root-child
    * element, carrying all passthrough columns, `XML_INDEX` (0-based,
    * like FLATTEN's t.index) and an `_xml` map for [[xmlGet]].
    *
    * `permissive=false` (default) aborts on malformed XML — matching
    * the reference's ON_ERROR='ABORT_STATEMENT' for the XML COPY
    * (BlueForty.py:176); permissive=true drops bad documents instead. */
  def explodeDocs(raw: DataFrame, docCol: String = "DOC",
      permissive: Boolean = false): DataFrame = {
    val shred = if (permissive) shredToMapsPermissive else shredToMaps
    raw.select(
      (raw.columns.filter(_ != docCol).map(col).toSeq :+
        posexplode(shred(col(docCol))).as(Seq("XML_INDEX", "_xml"))): _*)
  }

  /** `XMLGET(t.value,'Tag'):"$"` equivalent over the exploded rows. */
  def xmlGet(tag: String): Column = col("_xml").getItem(tag)
}
