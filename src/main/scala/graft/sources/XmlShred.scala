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
    * for a missing tag). */
  private val shredToMaps = udf { (doc: String) =>
    if (doc == null) Array.empty[Map[String, String]]
    else {
      val root = scala.xml.XML.loadString(doc)
      root.child.collect { case e: scala.xml.Elem =>
        e.child.collect { case c: scala.xml.Elem => c.label -> c.text }.toMap
      }.toArray
    }
  }

  /** Explode a raw-doc DataFrame: one output row per repeated root-child
    * element, carrying all passthrough columns, `XML_INDEX` (0-based,
    * like FLATTEN's t.index) and an `_xml` map for [[xmlGet]]. */
  def explodeDocs(raw: DataFrame, docCol: String = "DOC"): DataFrame =
    raw.select(
      (raw.columns.filter(_ != docCol).map(col).toSeq :+
        posexplode(shredToMaps(col(docCol))).as(Seq("XML_INDEX", "_xml"))): _*)

  /** `XMLGET(t.value,'Tag'):"$"` equivalent over the exploded rows. */
  def xmlGet(tag: String): Column = col("_xml").getItem(tag)
}
