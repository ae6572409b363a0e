package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{CsvIngest, SchemaInference, XmlShred}
import graft.functions.ColumnFunctions.tryBigintGuarded

/** Source/sink operator queries (SURVEY.md §2a): each runs a real
  * ingest path end-to-end — write a derived file/table, read it back
  * through the graft source implementation, and produce a result the
  * DuckDB oracle can recompute straight from the original parquet. A
  * hash match therefore proves the full write→stage→read→type chain is
  * lossless, not just the final SELECT.
  */
object SourceQueries {

  private def tmpDir(prefix: String): String = Scratch.dir(prefix)

  /** S1/S4/P1 — option-rich CSV write+read roundtrip with positional
    * `$i` projection and TRY casts (the COPY INTO shape,
    * BlueForty.py:78-116), aggregated TPC-H-Q1-style so the oracle can
    * recompute from parquet. */
  def s1CsvRoundtrip(s: SparkSession, d: String): DataFrame = {
    import CsvIngest._
    val dir = tmpDir("graft_csv_rt")
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_linestatus"), col("l_quantity"), col("l_extendedprice"),
        col("l_shipdate").cast("date").as("l_shipdate"))
      .write.mode("overwrite").option("header", "true").csv(dir)
    // read the dir, not a "/*.csv" glob: globbed paths make Spark's
    // FileStreamSink metadata probe log a spurious FileNotFoundException
    // stack trace at WARN ( _SUCCESS files are skipped either way)
    val raw = readPositional(s, dir)
    raw.select(
        pos(1).try_cast("bigint").as("l_orderkey"),
        pos(3).as("l_returnflag"),
        pos(4).as("l_linestatus"),
        pos(5).try_cast("decimal(18,4)").as("qty"),
        pos(6).try_cast("decimal(18,4)").as("price"),
        try_to_date(pos(7)).as("ship_date"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("qty")), 2).cast("double").as("sum_qty"),
        round(sum(col("price")), 2).cast("double").as("sum_price"),
        count(col("ship_date")).as("n_dates"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** S18 — gzip-transparent CSV (the reference's `.csv.gz` stage
    * pattern, ref BlueForty.py:78-116 `PATTERN=>'.*\.(csv|csv.gz)$'`):
    * write orders as gzip-compressed CSV (one .csv.gz file per task),
    * read the directory back with codec auto-detection (extension
    * sniffing — no option needed on read), and aggregate. Gzip is NOT
    * splittable: at 100 TB each .gz file is one read task, so the
    * writer's parallelism fixes the reader's — the repartition(8) here
    * is the knob that matters (many medium files beat one giant
    * unsplittable stream; production would use bzip2/zstd-in-parquet
    * for splittable compression). The oracle recomputes from the base
    * table, so a hash match proves the compressed roundtrip lossless. */
  def s18GzipCsv(s: SparkSession, d: String): DataFrame = {
    import CsvIngest._
    val dir = tmpDir("graft_csv_gz")
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate").cast("date").as("o_orderdate"))
      .repartition(8)
      .write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(dir)
    val raw = readPositional(s, dir)
    raw.select(
        pos(1).try_cast("bigint").as("o_orderkey"),
        pos(2).as("o_orderstatus"),
        pos(3).try_cast("decimal(18,4)").as("price"),
        try_to_date(pos(4)).as("o_date"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("price")), 2).cast("double").as("sum_price"),
        count_distinct(col("o_date")).as("n_dates"),
        min(col("o_orderkey")).as("min_key"),
        max(col("o_orderkey")).as("max_key"))
      .orderBy("o_orderstatus")
  }

  /** S6/S7/S13/P19 — XML shredding at corpus scale: synthesize one XML
    * document per order-group (deterministic fragment order via
    * sort_array), shred through the scala-xml generator with posexplode
    * ordinals, TRY-cast fields, skip keyless elements — then hash-match
    * the recovered rows against SQL straight over `orders`. Mirrors
    * BlueForty.py:179-201 semantics (incl. empty-tag→NULL and the
    * 0-based FLATTEN index). */
  def s7XmlShred(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val keyPart = concat(
      lit("<SupplierTransactionID>"), col("o_orderkey"),
      lit("</SupplierTransactionID>"))
    val frag = concat(
      lit("<Transaction>"),
      when(col("o_orderkey") % 97 === 0, lit("")).otherwise(keyPart),
      lit("<SupplierID>"), col("o_custkey"), lit("</SupplierID>"),
      lit("<SupplierInvoiceNumber>"),
      when(col("o_orderkey") % 3 === 0, lit(""))
        .otherwise(concat(lit("INV-"), col("o_orderkey"))),
      lit("</SupplierInvoiceNumber>"),
      lit("<TransactionDate>"), col("o_orderdate").cast("date"),
      lit("</TransactionDate>"),
      lit("<TransactionAmount>"), col("o_totalprice").cast("decimal(18,2)"),
      lit("</TransactionAmount>"),
      lit("<IsFinalized>"), (col("o_orderkey") % 2).cast("string"),
      lit("</IsFinalized>"),
      lit("</Transaction>"))
    val docs = ord
      .select((col("o_orderkey") % 200).as("g"),
        struct(col("o_orderkey"), frag.as("frag")).as("kf"))
      .groupBy("g")
      .agg(concat(lit("<SupplierTransactions>"),
        concat_ws("", transform(sort_array(collect_list(col("kf"))),
          x => x.getField("frag"))),
        lit("</SupplierTransactions>")).as("DOC"))
    import graft.functions.ColumnFunctions._
    XmlShred.explodeDocs(docs, "DOC")
      .filter(XmlShred.xmlGet("SupplierTransactionID").isNotNull)
      .select(
        XmlShred.xmlGet("SupplierTransactionID").try_cast("bigint").as("transaction_id"),
        XmlShred.xmlGet("SupplierID").try_cast("bigint").as("supplier_id"),
        nullifEmpty(XmlShred.xmlGet("SupplierInvoiceNumber")).as("invoice_number"),
        tryToDate(XmlShred.xmlGet("TransactionDate")).as("transaction_date"),
        XmlShred.xmlGet("TransactionAmount").try_cast("decimal(18,2)")
          .cast("double").as("amount"),
        intFlag(XmlShred.xmlGet("IsFinalized")).as("is_finalized"),
        col("XML_INDEX").cast("bigint").as("xml_index"))
      .orderBy("transaction_id")
  }

  /** S2/S3/S5 — the staged-ingest chain end-to-end (PUT + filename
    * partitioning + METADATA$ columns, BlueForty.py:64-75,106-107):
    * orders are exported as one CSV per month named
    * `purchases_<yyyy>_<mm>.csv` (the reference's landing-file naming),
    * staged under `yyyy/mm/` by [[CsvIngest.stageFiles]]'s filename
    * regex, read back through one glob with `_metadata` file columns,
    * and aggregated per (year, month, source file). A hash match proves
    * the stage layout routed every file, the glob found them all, and
    * the metadata filename column round-trips — straight from parquet
    * the oracle recomputes the same totals and states the filenames.
    *
    * Scale notes: the per-month export is driver-looped only in the
    * rename step (one cheap FS move per file, mirroring the
    * reference's per-file PUT); the data pass is a single partitionBy
    * write, and the staged read is one glob scan whose `yyyy/mm/`
    * layout lets a month-bounded variant prune at file-listing time. */
  def s2StagedPartitions(s: SparkSession, d: String): DataFrame = {
    import CsvIngest._
    val stageRoot = s2Stage(s, d)
    readPositionalWithMeta(s, s"$stageRoot/*/*/*.csv")
      .select(
        pos(1).try_cast("bigint").as("o_orderkey"),
        pos(3).try_cast("decimal(18,4)").as("price"),
        col("SRC_FILENAME").as("src_filename"))
      .groupBy(
        regexp_extract(col("src_filename"), raw"purchases_(\d{4})_(\d{2})", 1)
          .cast("int").as("yr"),
        regexp_extract(col("src_filename"), raw"purchases_(\d{4})_(\d{2})", 2)
          .cast("int").as("mo"),
        col("src_filename"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("price")), 2).cast("double").as("total"))
      .orderBy("yr", "mo")
  }

  /** S2's export → landing-rename → stage chain, returning the stage
    * root (shared with the pruning proof in PlanLintSpec: a
    * month-bounded glob over the returned `yyyy/mm/` tree must list
    * exactly that month's file). */
  private[graft] def s2Stage(s: SparkSession,
      d: String): java.nio.file.Path = {
    import CsvIngest._
    import java.nio.file.{Files, Path, Paths}
    val exportDir = Paths.get(tmpDir("graft_stage_export"))
    val landing   = Paths.get(tmpDir("graft_stage_landing"))
    val stageRoot = Paths.get(tmpDir("graft_stage_root"))
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        date_format(col("o_orderdate").cast("date"), "yyyy_MM").as("ym"))
      .repartition(col("ym"))                   // one file per month dir
      .write.mode("overwrite").option("header", "true")
      .partitionBy("ym").csv(exportDir.toString)
    // landing rename: <export>/ym=1995_01/part-*.csv → purchases_1995_01.csv
    val landed: Seq[Path] = {
      val dirs = Files.list(exportDir)
      try {
        import scala.jdk.CollectionConverters._
        dirs.iterator().asScala.toSeq
          .filter(p => p.getFileName.toString.startsWith("ym="))
          .sortBy(_.toString)
          .map { monthDir =>
            val ym = monthDir.getFileName.toString.stripPrefix("ym=")
            val part = Files.list(monthDir)
            val src =
              try {
                import scala.jdk.CollectionConverters._
                part.iterator().asScala
                  .filter(_.getFileName.toString.endsWith(".csv")).toSeq match {
                  case Seq(one) => one
                  case many => sys.error(s"expected 1 csv in $monthDir, got ${many.size}")
                }
              } finally part.close()
            Files.move(src, landing.resolve(s"purchases_$ym.csv"))
          }
      } finally dirs.close()
    }
    stageFiles(landed, stageRoot)               // → <stage>/yyyy/mm/…
    stageRoot
  }

  /** S10 — TSV gazetteer read (BlueForty.py:392-422): export a
    * tab-separated zip/lat/lng/state file derived from supplier, read
    * it back through the shared option-rich reader with `sep='\t'`,
    * TRY-cast positionally, aggregate per state. */
  def s10Tsv(s: SparkSession, d: String): DataFrame = {
    import CsvIngest._
    val dir = tmpDir("graft_tsv")
    Tables.supplier(s, d)
      .select(
        lpad(pmod(col("s_suppkey"), lit(100000)).cast("string"), 5, "0").as("zip"),
        (pmod(col("s_suppkey") * 7, lit(120)) - 60).cast("decimal(10,4)").as("lat"),
        (pmod(col("s_suppkey") * 13, lit(340)) - 170).cast("decimal(10,4)").as("lng"),
        concat(lit("ST"), lpad(col("s_nationkey").cast("string"), 2, "0")).as("state"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").option("sep", "\t")
      .csv(dir)
    readPositional(s, dir, Options(sep = "\t"))
      .select(
        pos(1).as("zip"),
        pos(2).try_cast("decimal(10,4)").as("lat"),
        pos(3).try_cast("decimal(10,4)").as("lng"),
        pos(4).as("state"))
      .groupBy("state")
      .agg(count(lit(1)).as("n_zips"),
        round(sum(col("lat")), 4).cast("double").as("sum_lat"),
        round(sum(col("lng")), 4).cast("double").as("sum_lng"),
        min(col("zip")).as("min_zip"))
      .orderBy("state")
  }

  /** S9 — sampled schema inference (BlueForty.py:239-297): write a CSV
    * whose columns exercise every precedence rule (int, float, string,
    * 3-format dates, int/float mix, all-null-like), infer, and return
    * the (column, type) table the oracle states literally. */
  def s9SchemaInference(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dir = tmpDir("graft_infer")
    Tables.supplier(s, d)
      .select(
        col("s_suppkey").cast("string").as("id_col"),
        col("s_acctbal").cast("decimal(12,2)").cast("string").as("num_col"),
        col("s_name").as("name_col"),
        date_format(date_add(lit("1995-01-01").cast("date"),
          (col("s_suppkey") % 1000).cast("int")),
          "yyyy-MM-dd").as("date_col"),
        when(col("s_suppkey") % 3 === 0,
          date_format(date_add(lit("1995-01-01").cast("date"),
            (col("s_suppkey") % 1000).cast("int")), "M/d/yyyy"))
          .when(col("s_suppkey") % 3 === 1,
            date_format(date_add(lit("1995-01-01").cast("date"),
              (col("s_suppkey") % 1000).cast("int")), "yyyy/M/d"))
          .otherwise(
            date_format(date_add(lit("1995-01-01").cast("date"),
              (col("s_suppkey") % 1000).cast("int")), "yyyy-MM-dd"))
          .as("date_mixed_fmt"),
        when(col("s_suppkey") % 2 === 0, col("s_suppkey").cast("string"))
          .otherwise(col("s_acctbal").cast("decimal(12,2)").cast("string"))
          .as("mixed_col"),
        when(col("s_suppkey") % 4 === 0, lit("NULL"))
          .when(col("s_suppkey") % 4 === 1, lit("\\N"))
          .when(col("s_suppkey") % 4 === 2, lit("None"))
          .otherwise(lit("")).as("null_col"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(dir)
    val schema = SchemaInference.inferSchema(s, dir) // dir, not glob (WARN-trace avoidance, see s1)
    schema.fields.toSeq
      .map(f => (f.name, f.dataType.typeName))
      .toDF("column_name", "inferred_type")
      .orderBy("column_name")
  }

  /** S15 (extension) — JSONL roundtrip: the interchange format of LLM
    * data pipelines. Write documents as JSON-lines, read back with an
    * explicit schema in PERMISSIVE mode (malformed lines null out, the
    * ON_ERROR='CONTINUE' posture), aggregate per language. */
  def s15JsonlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("graft_jsonl_rt")
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"), col("lang"), col("source"),
        col("n_chars"))
      .write.mode("overwrite").json(dir)
    val back = s.read
      .schema("doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT")
      .option("mode", "PERMISSIVE")
      .json(dir)
    back.groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(col("n_chars")).as("sum_chars"),
        max(length(col("text"))).cast("bigint").as("max_len"))
      .orderBy("lang")
  }

  /** S16 (extension) — ORC roundtrip: second columnar format, same
    * write→read→aggregate proof shape as the parquet/CSV paths. */
  def s16OrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("graft_orc_rt")
    Tables.documents(s, d).write.mode("overwrite").orc(dir)
    s.read.orc(dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
      .orderBy("source")
  }

  /** S8 — JDBC relational extract, driver-visible end-to-end (the
    * reference's PostgreSQL boundary, `BlueForty.py:300-321`): load
    * the supplier parquet INTO an embedded Derby database over Spark's
    * JDBC writer (Derby stands in for PG — same DriverManager path,
    * in-JVM so the offline container can run it), extract it back
    * through [[graft.sources.Jdbc.readTableOrFixture]] as a
    * range-partitioned parallel scan (8 concurrent range predicates on
    * the key — the knob that makes a relational extract
    * cluster-parallel), land the extract as parquet (the reference's
    * landing-file posture), and aggregate per nation. The oracle
    * recomputes from the ORIGINAL parquet, so a hash match proves the
    * whole parquet→JDBC-write→typed-read→parquet chain is lossless for
    * bigint/int/double/varchar. JdbcSpec covers the connection-level
    * contract (pushdown, partition count); this row makes S8 visible
    * to the driver's correctness ledger. */
  def s8JdbcExtract(s: SparkSession, d: String): DataFrame = {
    import graft.sources.Jdbc
    val url = "jdbc:derby:memory:graft_s8;create=true"
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
    sup.write.format("jdbc")
      .option("url", url).option("dbtable", "supplier_case")
      .option("createTableColumnTypes",
        "s_suppkey BIGINT, s_name VARCHAR(64), s_nationkey INT, " +
          "s_acctbal DOUBLE")
      .mode("overwrite").save()
    // range bounds for the partitioned extract: one tiny min/max scan
    // of the dimension table (driver-side by nature, not a hot path).
    // min/max over an empty fixture are NULL — fail with a clear
    // message instead of an opaque NPE deep in the cast. The Derby
    // memory db is intentionally reuse-overwrite (mode=overwrite drops
    // and recreates the table): one in-JVM db per name for the JVM
    // lifetime is the fixture's contract, not a leak.
    val bounds = sup
      .agg(min(col("s_suppkey")), max(col("s_suppkey")))
      .collect()(0)
    require(!bounds.isNullAt(0) && !bounds.isNullAt(1),
      s"s8_jdbc_extract: supplier fixture at $d is empty — no key range")
    val (lo, hi) = (bounds.getLong(0), bounds.getLong(1))
    val extracted = Jdbc.readTableOrFixture(s, Some(Jdbc.Options(url,
        "supplier_case",
        partitioning = Some(Jdbc.Partitioning("s_suppkey", lo, hi + 1, 8)))),
      fixturePath = d + "/supplier.parquet")
    val land = tmpDir("graft_jdbc_land")
    extracted.write.mode("overwrite").parquet(land)
    s.read.parquet(land)
      .groupBy(col("s_nationkey").cast("int").as("nation"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(length(col("s_name"))).as("sum_name_len"),
        round(sum(col("s_acctbal").cast("decimal(18,2)")), 2)
          .cast("double").as("total_bal"))
      .orderBy("nation")
  }

  /** S11/S12/S13/S14 — CTAS, append-INSERT, view registration, SQL
    * entry point: materialize a filtered slice, append a second, read
    * back through a registered temp view with spark.sql. */
  def s11CtasInsertView(s: SparkSession, d: String): DataFrame = {
    val dir = tmpDir("graft_ctas")
    val ord = Tables.orders(s, d)
    ord.filter(col("o_orderstatus") === "F")
      .write.mode("overwrite").parquet(dir)           // CTAS
    ord.filter(col("o_orderstatus") === "O")
      .write.mode("append").parquet(dir)              // INSERT INTO … SELECT
    s.read.parquet(dir).createOrReplaceTempView("graft_ctas_orders") // VIEW
    s.sql(
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
        |FROM graft_ctas_orders
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin)
  }

  /** S17 (extension) — Z-order clustering layout: quantize order-key
    * points to a 12-bit grid (the j10 coordinate convention), compute
    * the Morton z-value (Layout.zValue), and bucket rows by the z
    * prefix (top 6 bits → 64 cells). The per-cell aggregates emit the
    * min/max of BOTH dimensions and the exact bbox area — the file
    * skipping stats a z-clustered write would give every file. All
    * integer bit math, map-only + one hash aggregate; LayoutSpec
    * additionally proves the clustering claim (z-cells bound ~64× less
    * area than key-ordered cells on the same points). */
  def s17ZorderLayout(s: SparkSession, d: String): DataFrame = {
    import graft.sources.Layout
    val pts = Tables.orders(s, d).select(
      (col("o_orderkey") * 7 % 4096).as("px"),
      (col("o_orderkey") * 13 % 4096).as("py"))
    pts.select(col("px"), col("py"),
        Layout.zValue(col("px"), col("py"), bits = 12).as("z"))
      .groupBy(shiftrightunsigned(col("z"), 18).as("cell"))
      .agg(count(lit(1)).as("n_points"),
        min(col("px")).as("min_px"), max(col("px")).as("max_px"),
        min(col("py")).as("min_py"), max(col("py")).as("max_py"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"))
      .withColumn("bbox_area",
        (col("max_px") - col("min_px") + 1) *
          (col("max_py") - col("min_py") + 1))
      .orderBy("cell")
  }

  /** V1 (extension) — native VARIANT semi-structured path. The
    * reference stores whole XML/JSON payloads in a Snowflake VARIANT
    * column and extracts typed fields with `doc:path::type` + the
    * TRY_ family (BlueForty.py:130-201); graft's `t4` covers the
    * string-path form (get_json_object), this covers Spark 4's real
    * `VariantType`: build a nested JSON doc per event, `parse_json` it
    * into a VARIANT, then pull typed paths back out with `variant_get`
    * (strict, `:` + `::type`) and `try_variant_get` (missing path and
    * failed cast → null, the TRY_ shape). Per-row output: a hash match
    * proves the JSON→VARIANT→typed-path chain is bit-lossless
    * (including double round-trip) because the oracle recomputes every
    * extracted value straight from the base columns. Map-only — no
    * shuffle but the final ORDER BY — so it scales as a pure scan. */
  def v1VariantShred(s: SparkSession, d: String): DataFrame = {
    val doc = to_json(struct(
      col("event_id").as("id"),
      col("event_type").as("type"),
      struct(
        col("value").as("value"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
        .as("metrics"),
      array(length(col("event_type")).cast("bigint"),
        pmod(col("user_id"), lit(7)).cast("bigint")).as("tags")))
    Tables.events(s, d)
      // ORDER BY runs on the narrow scan, BEFORE the expensive
      // json→variant work: a global sort's range-partition sampling
      // re-executes its child, and below-sort projections are paid
      // again on the real pass — sorting first keeps the sampled
      // subtree to the raw columns (row order survives the later
      // per-row projections)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .orderBy("event_id")
      // generator barrier: CollapseProject would otherwise inline the
      // aliased parse_json into all seven variant_get consumers (7
      // parses per row); projections do not collapse through a
      // Generate, so the parse runs once
      .select(col("event_id"), explode(array(parse_json(doc))).as("v"))
      .select(
        col("event_id"),
        variant_get(col("v"), "$.type", "string").as("etype"),
        variant_get(col("v"), "$.metrics.value", "double").as("val_back"),
        variant_get(col("v"), "$.metrics.k", "bigint").as("k"),
        variant_get(col("v"), "$.tags[0]", "bigint").as("type_len"),
        variant_get(col("v"), "$.tags[1]", "bigint").as("user_mod7"),
        try_variant_get(col("v"), "$.metrics.absent", "bigint").as("absent"),
        // type is string-typed by construction — guarded twin skips
        // the per-row TRY-cast-failure exception (see tryBigintGuarded)
        tryBigintGuarded(variant_get(col("v"), "$.type", "string"))
          .as("type_as_num"))
      // deterministic order comes from the pre-projection sort above
      // (EliminateSorts would keep only a TRAILING sort and re-plan the
      // expensive subtree below it — exactly the shape being avoided)
  }

  /** V2 (extension) — LATERAL FLATTEN over an ARRAY inside a VARIANT:
    * the JSON-side flatten a Snowflake migrator runs daily
    * (BlueForty.py:179-201 is the XML analog covered by s7; v1 covers
    * typed scalar paths). Each event carries a 1–3 element `items`
    * array in its VARIANT doc; `variant_explode` shreds it to one row
    * per element with the ordinal (`pos`) and the element VARIANT, and
    * typed extraction + the TRY_ family run per element — `key` is
    * null for array mode (vs object mode), `try_variant_get` nulls on
    * both a failed cast and a missing path. The doc is synthesized
    * from base columns with codegen'd concat (no HOF, no per-row
    * interpreter), so the oracle restates every element straight from
    * the same key arithmetic and a hash match proves the whole
    * JSON→VARIANT→explode→typed-path chain. Map-only, same
    * sort-before-project shape as v1 (Generate preserves row order, so
    * the narrow pre-sort survives both projections and the explode). */
  def v2VariantFlatten(s: SparkSession, d: String): DataFrame = {
    def codeOf(i: Int) =
      pmod(pmod(col("event_id"), lit(1000)) * 7 + lit(i * 13), lit(1000))
    def elem(i: Int) = concat(
      lit("{\"idx\":" + i + ",\"code\":"), codeOf(i).cast("string"),
      lit(",\"name\":\""), col("event_type"), lit("-" + i + "\"}"))
    val doc = concat(
      lit("{\"id\":"), col("event_id").cast("string"), lit(",\"items\":["),
      elem(0),
      when(pmod(col("user_id"), lit(3)) >= 1, concat(lit(","), elem(1)))
        .otherwise(lit("")),
      when(pmod(col("user_id"), lit(3)) >= 2, concat(lit(","), elem(2)))
        .otherwise(lit("")),
      lit("]}"))
    Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"))
      .orderBy("event_id")
      // generator barrier (as v1): one parse_json per row, not one per
      // downstream consumer
      .select(col("event_id"), explode(array(parse_json(doc))).as("v"))
      .select(col("event_id"), {
        // variant_explode lives in the TableFunctionRegistry (SQL
        // LATERAL position) — build the Generator directly for the
        // DataFrame path, as functions.explode does for arrays
        import org.apache.spark.sql.graft.ColumnShim
        ColumnShim.column(
          new org.apache.spark.sql.catalyst.expressions.variant.VariantExplode(
            ColumnShim.expression(expr("variant_get(v, '$.items')"))))
      })
      .select(col("event_id"),
        col("pos").cast("bigint").as("ord"),
        col("key").as("elem_key"),
        variant_get(col("value"), "$.idx", "bigint").as("idx"),
        variant_get(col("value"), "$.code", "bigint").as("code"),
        variant_get(col("value"), "$.name", "string").as("name"),
        // name is string-typed by construction, so the guarded twin
        // (string get + pre-guarded TRY cast) is exact — and skips the
        // per-row exception Spark throws for every failing TRY cast
        // (this one column was 2.1 s of the query's 3.5 s; see
        // tryBigintGuarded's doc for the measurement)
        tryBigintGuarded(variant_get(col("value"), "$.name", "string"))
          .as("name_as_num"),
        try_variant_get(col("value"), "$.missing", "string").as("absent"))
  }

  /** S19 (extension) — training-shard export with manifest: the final
    * materialization step of a curation pipeline. Documents are
    * assigned to a fixed shard count by the engine-portable minstd
    * hash (reproducible across engines and reruns), written as one
    * parquet file per shard (`repartition(n, shard)` puts every row of
    * a shard value in exactly one task; `partitionBy` then gives each
    * shard its own directory), read back, and summarized as the
    * manifest a downstream trainer consumes: per-shard doc count,
    * byte/token mass, id range — and the FILE count, which the oracle
    * pins to literal 1: a hash match proves the one-file-per-shard
    * layout, not just the row routing. 100 TB shape: assignment is
    * map-only; the write is one hash exchange wide; shard count scales
    * with the cluster (here 8 so every shard is non-empty at sf0.001).
    */
  def s19ShardManifest(s: SparkSession, d: String): DataFrame = {
    import graft.operators.Sampling
    val nShards = 8
    val dir = tmpDir("graft_shards")
    Tables.documents(s, d)
      .select(col("doc_id"), col("text"),
        pmod(Sampling.minstdHash(col("doc_id")), lit(nShards.toLong))
          .cast("int").as("shard"))
      .repartition(nShards, col("shard"))
      .write.mode("overwrite").partitionBy("shard").parquet(dir)
    s.read.parquet(dir)
      .withColumn("fname", input_file_name())
      .groupBy(col("shard").cast("bigint").as("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(octet_length(col("text"))).cast("bigint").as("sum_bytes"),
        sum(operators.TextAnalysis.wordCount(col("text"))).as("sum_tokens"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"),
        count_distinct(col("fname")).as("n_files"))
      .orderBy("shard")
  }
}
