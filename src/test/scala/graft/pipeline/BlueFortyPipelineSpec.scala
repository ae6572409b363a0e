package graft.pipeline

import graft.SparkTestBase
import graft.sources.CsvIngest
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Paths}
import java.sql.Date

/** End-to-end replay of the reference's 8-stage topology on
  * BlueForty-shaped fixtures (FIXTURES.md §A), asserting the semantic
  * invariants the reference records as row-count comments. */
class BlueFortyPipelineSpec extends SparkTestBase {

  private val res = Paths.get("src/test/resources/blueforty")
  private lazy val stageRoot = {
    val root = Files.createTempDirectory("graft_stage")
    CsvIngest.stageFiles(
      CsvIngest.discover(res).filter(_.getFileName.toString.startsWith("purchases")),
      root)
    root
  }

  private lazy val purchases =
    BlueFortyPipeline.loadPurchases(spark, stageRoot.toString + "/*/*/*.csv").cache()
  private lazy val poTotals = BlueFortyPipeline.purchaseOrderTotals(purchases)
  private lazy val invoices = BlueFortyPipeline.shredSupplierInvoices(
    graft.sources.XmlShred.readRaw(spark,
      res.resolve("supplier_transactions.xml").toString)).cache()
  private lazy val poInv =
    BlueFortyPipeline.purchaseOrdersAndInvoices(poTotals, invoices).cache()
  private lazy val supplierCase =
    BlueFortyPipeline.loadSupplierCase(spark,
      res.resolve("supplier_case.csv").toString).cache()

  test("S2/S3: staging lays files out by yyyy/mm with misc fallback") {
    assert(Files.exists(stageRoot.resolve("2013/01/purchases_2013-01.csv")))
    assert(Files.exists(stageRoot.resolve("2013/02/purchases_2013_02.csv")))
    assert(Files.exists(stageRoot.resolve("misc/00/purchases_extra.csv")))
  }

  test("Q1: typed permissive load with TRY casts and metadata columns") {
    val rows = purchases.collect()
    assert(rows.length === 8)
    // bad row: unparseable id and date become NULL, row survives
    val bad = purchases.filter(col("PurchaseOrderID").isNull).collect()
    assert(bad.length === 1)
    assert(bad(0).getAs[Date]("OrderDate") === null)
    // null-likes: \N ReceivedOuters, NULL SupplierReference, N/A ref
    assert(purchases.filter(col("ReceivedOuters").isNull).count() === 1)
    assert(purchases
      .filter(col("PurchaseOrderID") === 3 && col("SupplierReference").isNull)
      .count() === 1)
    // trim + metadata
    val r1 = purchases.filter(col("PurchaseOrderLineID") === 1).head()
    assert(r1.getAs[String]("Description") === "Pack of 10 handles")
    assert(r1.getAs[String]("SRC_FILENAME") === "purchases_2013-01.csv")
    assert(r1.getAs[java.time.LocalDateTime]("SRC_FILE_TS") !== null)
  }

  test("Q2: PO totals aggregate with COALESCE-zero and ROUND") {
    val t = poTotals.filter(col("PurchaseOrderID") === 1).head()
    assert(t.getAs[java.math.BigDecimal]("POAmount").doubleValue() === 548.00)
    // \N ReceivedOuters → COALESCE 0 contribution
    val t5 = poTotals.filter(col("PurchaseOrderID") === 5).head()
    assert(t5.getAs[java.math.BigDecimal]("POAmount").doubleValue() === 0.0)
  }

  test("Q3: XML shred skips keyless elements, keeps 0-based ordinal") {
    val rows = invoices.orderBy("SupplierTransactionID").collect()
    assert(rows.length === 4) // 5 elements, 1 without SupplierTransactionID
    val r1003 = rows(2)
    assert(r1003.getAs[java.math.BigDecimal]("SupplierTransactionID").intValue === 1003)
    assert(r1003.getAs[java.math.BigDecimal]("XML_INDEX").intValue === 3)
    // empty string PurchaseOrderID → NULL; empty FinalizationDate → NULL
    val r1002 = rows(1)
    assert(r1002.getAs[java.math.BigDecimal]("PurchaseOrderID") === null)
    assert(r1002.getAs[Date]("FinalizationDate") === null)
    assert(r1002.getAs[Boolean]("IsFinalized") === false)
  }

  test("Q5: reconciliation inner-joins; POs without invoices drop") {
    val rows = poInv.orderBy("PurchaseOrderID").collect()
    assert(rows.map(_.getAs[java.math.BigDecimal]("PurchaseOrderID").intValue).toSeq
      === Seq(1, 2, 3))
    val po2 = rows(1)
    assert(po2.getAs[java.math.BigDecimal]("POAmount").doubleValue() === 36.0)
    assert(po2.getAs[java.math.BigDecimal]("InvoiceExTaxTotal").doubleValue() === 40.0)
    assert(po2.getAs[java.math.BigDecimal]("invoiced_vs_quoted").doubleValue() === 4.0)
  }

  test("Q6: inference types + ZIP5 view (reference operator order)") {
    val fields = supplierCase.schema.fields.map(f => f.name -> f.dataType.typeName).toMap
    assert(fields("supplierid") === "long")
    assert(fields("postalpostalcode") === "string") // 98x52 forces STRING
    assert(fields("deliverypostalcode") === "long")
    assert(fields("accountopened") === "date")      // 3 different formats
    assert(fields("creditlimit") === "double")      // int/float mix
    assert(fields("allnull") === "string")          // all null-like
    val zips = BlueFortyPipeline.supplierZip5(supplierCase)
      .orderBy("supplierid").collect()
      .map(r => r.getLong(1) -> r.getString(0)).toMap
    assert(zips(2L) === "60601")
    assert(zips(7L) === "10001") // falls back to deliverypostalcode
    assert(zips(9L) === "9852")  // LPAD-then-strip quirk: 4 digits
  }

  test("Q7/Q8: KNN nearest station, weather join, final enrichment") {
    import spark.implicits._
    val gaz = BlueFortyPipeline.loadGazetteer(spark,
      res.resolve("gazetteer.tsv").toString)
    assert(gaz.count() === 4)
    val stations = Seq(
      ("ST_CHI", 41.95, -87.75), ("ST_SF", 37.62, -122.38),
      ("ST_NY", 40.78, -73.97), ("ST_FAR", -33.95, 151.18)
    ).toDF("NOAA_WEATHER_STATION_ID", "LATITUDE", "LONGITUDE")
    val closest = BlueFortyPipeline.closestStations(supplierCase, gaz, stations)
    val cmap = closest.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // suppliers with joinable postal codes: 60601 (Chicago), 94107 (SF)
    assert(cmap === Map("60601" -> "ST_CHI", "94107" -> "ST_SF"))

    val ts = Seq(
      ("ST_CHI", "2013-01-02", 3.0, "Maximum Temperature"),
      ("ST_CHI", "2013-01-02", -4.0, "Minimum Temperature"),
      ("ST_CHI", "2013-01-05", 5.0, "Maximum Temperature"),
      ("ST_SF", "2013-01-03", 15.0, "Maximum Temperature"),
      ("ST_NY", "2013-01-02", 1.0, "Maximum Temperature")
    ).toDF("NOAA_WEATHER_STATION_ID", "DATE", "VALUE", "VARIABLE_NAME")
    val weather = BlueFortyPipeline.supplierZipWeather(closest, ts)
    assert(weather.count() === 3) // only max-temp rows for matched stations

    val enriched = BlueFortyPipeline.purchasesWithWeather(poInv, supplierCase, weather)
      .orderBy("PurchaseOrderID").collect()
    // PO1 (60601, 1/2) → 3.0; PO2 (94107, 1/3) → 15.0; PO3 (60601, 1/5) → 5.0
    assert(enriched.map(r => (r.getAs[java.math.BigDecimal]("PurchaseOrderID").intValue,
      r.getAs[Double]("high_temperature"))).toSeq
      === Seq((1, 3.0), (2, 15.0), (3, 5.0)))
  }
}
