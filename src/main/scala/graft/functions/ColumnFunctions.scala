package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, DecimalType}

/** Null-safe scalar / geo / casting helpers mirroring the reference's
  * expression surface (see SURVEY.md §2b). All helpers return `Column`s
  * built from codegen'd Spark built-ins — no UDFs — so every use stays
  * inside WholeStageCodegen and remains pushdown/prune-friendly at scale.
  *
  * Reference semantics being reproduced:
  *  - `TRY_TO_NUMBER / TRY_TO_DATE / TRY_CAST` (BlueForty.py:90-104) →
  *    [[tryCast]], [[tryToDateMulti]] — null on unparseable, never error.
  *  - `NULLIF(x,'')`, `TRIM`, `COALESCE` (BlueForty.py:102,105,122).
  *  - zip normalization `LPAD(REGEXP_REPLACE(...,'[^0-9]',''),5,'0')`
  *    (BlueForty.py:364-388) → [[zip5]].
  *  - haversine distance in km (BlueForty.py:438-439) → [[haversineKm]].
  */
object ColumnFunctions {

  /** Null-on-failure cast (Snowflake TRY_CAST, BlueForty.py:416-418). */
  def tryCast(c: Column, to: DataType): Column = c.try_cast(to.sql)

  def tryCast(c: Column, to: String): Column = c.try_cast(to)

  /** String→bigint TRY cast with a numeric-shape pre-guard. Spark
    * prices a TRY-cast FAILURE as a thrown-and-caught exception PER
    * ROW (measured ~13 µs/row — 2.1 s of v2_variant_flatten's 3.5 s
    * was one always-failing try cast over 156k exploded rows; a bare
    * `try_cast` times identically, so the cost is the failure path,
    * not the variant machinery). The regex admits exactly the
    * integral-literal shapes the ANSI cast parses, so guarded-out
    * rows return the null `try_cast` would have returned without ever
    * constructing the exception; admitted rows still go through the
    * real `try_cast` (19-digit strings can exceed Long.MaxValue — the
    * TRY handles the rare overflow). Use for failure-heavy columns;
    * success-heavy columns pay an extra ~1 µs regex and should use
    * `try_cast` directly.
    *
    * Shape notes (each spec-pinned against plain try_cast):
    *  - leading zeros don't count toward the 19-digit cap
    *    ('0…042' parses however many zeros pad it), so the guard
    *    strips `0*` before counting significant digits;
    *  - the ANSI cast trims Character.isWhitespace ∪ isISOControl at
    *    both ends (UTF8String.trimAll), which is wider than regex \s —
    *    the guard's edge class is javaWhitespace + \x00-\x1F\x7F-\x9F
    *    to admit exactly what the cast would trim. */
  private val bigintShape =
    "^[\\p{javaWhitespace}\\x00-\\x1f\\x7f-\\x9f]*[+-]?0*[0-9]{1,19}" +
      "[\\p{javaWhitespace}\\x00-\\x1f\\x7f-\\x9f]*$"
  def tryBigintGuarded(c: Column): Column =
    when(c.rlike(bigintShape), c.try_cast("bigint"))

  /** Snowflake TRY_TO_NUMBER(x) → NUMBER(38,0) (BlueForty.py:90-96). */
  def tryToNumber38(c: Column): Column = c.try_cast("decimal(38,0)")

  /** Snowflake TRY_TO_NUMERIC(x,18,4) (BlueForty.py:100-101). */
  def tryToNumeric(c: Column, p: Int, s: Int): Column =
    c.try_cast(s"decimal($p,$s)")

  /** Snowflake TRY_TO_NUMBER with a grouped numeric format
    * ('9,999,999'): Snowflake only accepts thousands separators when
    * the format says so — the plain form nulls them (pinned in
    * ColumnFunctionsSpec). Spark's equivalent: strip the group
    * separator, then the null-on-failure cast. A separator-position
    * check is deliberately NOT applied ('1,23,4' parses) — Snowflake's
    * own format matching is positionally lenient the same way. */
  def tryToNumberGrouped(c: Column, p: Int = 38, s: Int = 0): Column =
    regexp_replace(c, ",", "").try_cast(s"decimal($p,$s)")

  /** Format-free TRY_TO_DATE (BlueForty.py:190,195). */
  def tryToDate(c: Column): Column = try_to_date(c)

  /** TRY_TO_DATE with an explicit format (BlueForty.py:97-99's
    * 'MM/DD/YYYY' → Spark pattern "MM/dd/yyyy"). */
  def tryToDate(c: Column, fmt: String): Column = try_to_date(c, fmt)

  /** First format that parses wins; null if none do. Mirrors the
    * reference's 3-format date sniffing (BlueForty.py:256). */
  def tryToDateMulti(c: Column, fmts: Seq[String]): Column =
    coalesce(fmts.map(f => try_to_date(c, f)): _*)

  /** NULLIF(x,'') (BlueForty.py:102,188-189). */
  def nullifEmpty(c: Column): Column = nullif(c, lit(""))

  /** Treat any member of `nullLikes` as SQL NULL — the CSV format's
    * NULL_IF = ('\\N','NULL','','N/A') list (BlueForty.py:28). Spark's
    * CSV reader takes a single nullValue, so the full list is applied
    * as a post-read expression. */
  def nullIfIn(c: Column, nullLikes: Seq[String]): Column =
    when(c.isin(nullLikes.map(lit): _*), lit(null)).otherwise(c)

  /** int-ish string → BOOLEAN via `(x::INT = 1)` (BlueForty.py:103-104). */
  def intFlag(c: Column): Column = c.try_cast("int") === 1

  /** 5-digit zip normalization: strip non-digits, left-pad to 5
    * (BlueForty.py:367-375). Note LPAD *truncates* strings longer than
    * 5 — Snowflake, Spark and DuckDB all agree on that behavior. */
  def zip5(c: Column): Column =
    lpad(regexp_replace(c, "[^0-9]", ""), 5, "0")

  /** Great-circle distance in km between two (lat, lon) pairs, exactly
    * the reference's formula shape (BlueForty.py:438-439):
    * 2·R·asin(√(sin²(Δφ/2) + cosφ₁·cosφ₂·sin²(Δλ/2))), R = 6371 km.
    * Pure built-ins → codegen'd, usable inside joins at any scale. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2) - radians(lat1)
    val dLon = radians(lon2) - radians(lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2) * lit(6371.0) * asin(sqrt(a))
  }

  /** Squared euclidean distance over exact decimal coordinates — an
    * order-independent, float-free ranking key for nearest-neighbor
    * selection. Ranking by d² is equivalent to ranking by the monotone
    * haversine for small neighborhoods and is reproducible bit-for-bit
    * across engines, which the trigonometric form is not. */
  def sqDist(x1: Column, y1: Column, x2: Column, y2: Column): Column =
    (x2 - x1) * (x2 - x1) + (y2 - y1) * (y2 - y1)

  /** COALESCE(x, 0) used around every aggregated measure
    * (BlueForty.py:122). */
  def zeroIfNull(c: Column): Column = coalesce(c, lit(0))

  /** Decimal re-typing of a double measure column so that SUM/AVG are
    * exact and order-independent — required for differential testing
    * against other engines, and good hygiene for money math at scale. */
  def asMoney(c: Column, p: Int = 18, s: Int = 4): Column =
    c.cast(DecimalType(p, s))
}
