package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.ColumnFunctions._

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.util.matching.Regex

/** Option-rich CSV/TSV ingestion reproducing the reference's file-format +
  * COPY INTO semantics (SURVEY.md §2a S1-S5, S10).
  *
  * Mirrored reference behavior:
  *  - `FF_PURCHASES_CSV` (BlueForty.py:23-33): skip header, `"` quoting,
  *    trim, NULL_IF ('\\N','NULL','','N/A'), empty→null.
  *  - `COPY INTO` (BlueForty.py:78-116): positional `$1..$n` projection
  *    with TRY_* casts, `ON_ERROR='CONTINUE'` row tolerance,
  *    glob `PATTERN`, and METADATA$FILENAME / FILE_LAST_MODIFIED columns.
  *  - `PUT` + stage partitioning (BlueForty.py:34-36,61-75): local files
  *    copied under `yyyy/mm/` stage paths derived from a filename regex.
  *
  * Scale notes: the reader is the plain Spark CSV datasource, so schema
  * is fixed up-front (no inference scan), the glob prunes at file-listing
  * time, and PERMISSIVE mode drops malformed rows per-task without
  * failing the job — the same row-level tolerance semantics as
  * ON_ERROR='CONTINUE' but fully distributed.
  */
object CsvIngest {

  /** The reference's NULL_IF list (BlueForty.py:28). */
  val DefaultNullLikes: Seq[String] = Seq("\\N", "NULL", "", "N/A")

  /** Options mirroring STAGE.FF_PURCHASES_CSV / FF_TSV. */
  final case class Options(
      sep: String = ",",
      header: Boolean = true,
      quote: String = "\"",
      trimWhitespace: Boolean = true,
      nullLikes: Seq[String] = DefaultNullLikes,
      permissive: Boolean = true)

  /** Read files positionally: columns come back as `_c0.._cN` (header
    * skipped, not used for naming — the `$1..$21` addressing model).
    * Pass a glob for `PATTERN`-style pruning. All columns are strings;
    * typing happens in [[project]] via TRY casts. */
  def readPositional(spark: SparkSession, pathGlob: String, opts: Options = Options()): DataFrame = {
    val base = spark.read
      .option("header", opts.header.toString)
      .option("quote", opts.quote)
      .option("sep", opts.sep)
      .option("mode", if (opts.permissive) "PERMISSIVE" else "FAILFAST")
      .option("ignoreLeadingWhiteSpace", opts.trimWhitespace.toString)
      .option("ignoreTrailingWhiteSpace", opts.trimWhitespace.toString)
      .option("inferSchema", "false")
      .csv(pathGlob)
    // Re-address columns positionally regardless of header contents.
    val positional = base.toDF(base.columns.indices.map(i => s"_c$i"): _*)
    // Snowflake NULL_IF takes a list; Spark's nullValue takes one value,
    // so apply the full null-like list as a post-read projection (stays
    // in the same codegen stage as the scan — no extra pass).
    positional.select(positional.columns.toIndexedSeq.map { c =>
      nullIfIn(col(c), opts.nullLikes).as(c)
    }: _*)
  }

  /** Positional `$i` accessor (1-based, like COPY INTO's `$1..$21`). */
  def pos(i: Int): Column = col(s"_c${i - 1}")

  /** [[readPositional]] plus the file-metadata columns (the
    * METADATA$FILENAME / FILE_LAST_MODIFIED projection of
    * BlueForty.py:106-107) — the hidden `_metadata` struct must be
    * selected while the plan is still the raw file scan, so the
    * combined read lives here rather than composing the two. */
  def readPositionalWithMeta(spark: SparkSession, pathGlob: String,
      opts: Options = Options(),
      filenameCol: String = "SRC_FILENAME",
      mtimeCol: String = "SRC_FILE_TS"): DataFrame = {
    val base = spark.read
      .option("header", opts.header.toString)
      .option("quote", opts.quote)
      .option("sep", opts.sep)
      .option("mode", if (opts.permissive) "PERMISSIVE" else "FAILFAST")
      .option("ignoreLeadingWhiteSpace", opts.trimWhitespace.toString)
      .option("ignoreTrailingWhiteSpace", opts.trimWhitespace.toString)
      .option("inferSchema", "false")
      .csv(pathGlob)
    val dataCols = base.columns.indices.map(i =>
      nullIfIn(col(base.columns(i)), opts.nullLikes).as(s"_c$i"))
    base.select(dataCols :+
      col("_metadata.file_name").as(filenameCol) :+
      col("_metadata.file_modification_time").cast("timestamp_ntz")
        .as(mtimeCol): _*)
  }

  /** METADATA$FILENAME / METADATA$FILE_LAST_MODIFIED equivalents
    * (BlueForty.py:106-107) from the hidden `_metadata` struct. Must be
    * selected against a freshly-read file source DataFrame. */
  def withFileMetadata(df: DataFrame,
      filenameCol: String = "SRC_FILENAME",
      mtimeCol: String = "SRC_FILE_TS"): DataFrame =
    df.withColumn(filenameCol, col("_metadata.file_name"))
      .withColumn(mtimeCol,
        col("_metadata.file_modification_time").cast("timestamp_ntz"))

  /** Stage-path partitioning (BlueForty.py:64-71): extract `yyyy[-_]mm`
    * from a file name (19xx/20xx years); unmatched files land in
    * `misc/00`. */
  val PartitionPattern: Regex = raw"((?:19|20)\d{2})[-_](\d{1,2})".r.unanchored

  def stageSubdir(fileName: String): String = fileName match {
    case PartitionPattern(y, m) => f"$y/${m.toInt}%02d"
    case _                      => "misc/00"
  }

  /** `PUT`-equivalent: copy local files into a stage directory laid out
    * as `<stageRoot>/<yyyy>/<mm>/<file>` so Spark partition discovery /
    * path-glob pruning can skip whole months at scan time. */
  def stageFiles(files: Seq[Path], stageRoot: Path): Seq[Path] =
    files.map { f =>
      val dest = stageRoot.resolve(stageSubdir(f.getFileName.toString))
        .resolve(f.getFileName.toString)
      Files.createDirectories(dest.getParent)
      Files.copy(f, dest, StandardCopyOption.REPLACE_EXISTING)
      dest
    }

  /** List plain files in a directory (the reference's glob discovery,
    * BlueForty.py:61-62). */
  def discover(dir: Path, suffix: String = ".csv"): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.filter(p =>
        p.getFileName.toString.endsWith(suffix)).toSeq.sortBy(_.toString)
    finally s.close()
  }

  private implicit class IterScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
