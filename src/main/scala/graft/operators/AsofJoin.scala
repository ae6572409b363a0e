package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-timestamp) join — the time-series enrichment join the
  * reference's warehouse dialect lacks but every "attach the latest
  * quote/config/price as of event time" pipeline needs.
  *
  * Semantics ([[backward]]): for each left row, append the right row
  * with the LARGEST right timestamp ≤ the left timestamp within the
  * same key (equality matches; left-outer — unmatched left rows keep
  * nulls). [[forward]] is the mirror (smallest right ts ≥ left ts).
  * Equivalent to DuckDB/QuestDB `ASOF JOIN` and pandas `merge_asof`.
  *
  * Scale design: NOT the naive `l.ts >= r.ts` inequality join (which
  * Catalyst can only plan as a broadcast-nested-loop producing
  * O(|l|·|r|) per key and needing a per-left-row argmax on top).
  * Instead both sides are tagged and unioned, then ONE shuffle on the
  * key + ONE per-partition sort on (ts, side) lets a running
  * `last(right_row, ignoreNulls)` window carry the most recent right
  * row forward into each left row — the sort-merge formulation: cost
  * identical to a sort-merge join of the union, no candidate blowup,
  * no re-shuffle for the argmax. At 100 TB the bound is per-key data
  * volume (window sort), exactly like any SMJ; skewed keys take the
  * same salting/AQE remedies.
  *
  * Requirements: right rows should be unique per (key, ts) — if not,
  * the LAST one in (ts, insertion) sort order wins nondeterministically;
  * pre-aggregate the right side to make the winner explicit.
  * Column names of `right` (minus the key) must not collide with
  * `left`'s (rename before calling).
  */
object AsofJoin {

  def backward(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, key: String,
      tolerance: Option[Column] = None): DataFrame =
    asof(left, leftTs, right, rightTs, key, tolerance, ascending = true)

  def forward(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, key: String,
      tolerance: Option[Column] = None): DataFrame =
    asof(left, leftTs, right, rightTs, key, tolerance, ascending = false)

  private def asof(left: DataFrame, leftTs: String,
      right: DataFrame, rightTs: String, key: String,
      tolerance: Option[Column], ascending: Boolean): DataFrame = {
    val rightVals = right.columns.filterNot(_ == key)
    val collisions = rightVals.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right columns collide with left: ${collisions.mkString(",")}")

    val lStruct = struct(left.columns.toIndexedSeq.map(col): _*)
    val rStruct = struct(rightVals.toIndexedSeq.map(col): _*)
    val rType = right.select(rStruct).schema.fields.head.dataType
    val lType = left.select(lStruct).schema.fields.head.dataType

    // side 1 = left, 0 = right: at equal ts the right row sorts first,
    // so the running last() includes equal-timestamp matches (ASOF >=).
    // Null-timestamp semantics match SQL comparison (and DuckDB ASOF):
    // a null never satisfies l.ts >= r.ts, so null-ts right rows are
    // dropped up front (they could otherwise sort first under asc
    // nulls-first and "match" everything) and null-ts left rows get a
    // null match via the explicit gate below (under desc they'd sort
    // last and see every right row).
    val lPrep = left.select(col(key).as("_k"), col(leftTs).as("_t"),
      lit(1).as("_side"), lStruct.as("_lrow"), lit(null).cast(rType).as("_rrow"))
    val rPrep = right.filter(col(rightTs).isNotNull)
      .select(col(key).as("_k"), col(rightTs).as("_t"),
        lit(0).as("_side"), lit(null).cast(lType).as("_lrow"), rStruct.as("_rrow"))

    val ord = if (ascending) col("_t").asc else col("_t").desc
    val w = Window.partitionBy("_k").orderBy(ord, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lPrep.unionByName(rPrep)
      .withColumn("_m", when(col("_t").isNotNull,
        last(col("_rrow"), ignoreNulls = true).over(w)))
      .filter(col("_side") === 1)
    // tolerance: |l.ts - r.ts| must be within `tolerance` (a Column in
    // the timestamp's units) or the match is dropped back to null.
    val gated = tolerance.fold(matched) { tol =>
      val dist = if (ascending) col("_t") - col("_m").getField(rightTs)
                 else col("_m").getField(rightTs) - col("_t")
      matched.withColumn("_m", when(dist <= tol, col("_m")))
    }
    gated.select(
      left.columns.toIndexedSeq.map(c => col(s"_lrow.$c").as(c)) ++
        rightVals.toIndexedSeq.map(c => col(s"_m.$c").as(c)): _*)
  }
}
