package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-1/top-k-per-key in two physical shapes:
  *
  *  - [[rowNumberTopK]] — the reference's formulation
  *    (BlueForty.py:445-447): window sort per key then rn ≤ k. Requires
  *    a full sort of every partition group.
  *  - [[minByTop1]] — the 100 TB rewrite: `min_by`/`max_by` aggregate
  *    with partial (map-side) combine, no per-group sort, one shuffle
  *    of pre-aggregated rows. Identical result for top-1 when the
  *    ordering key is unique per group (add a tie-break column
  *    otherwise).
  */
object TopPerKey {

  def rowNumberTopK(df: DataFrame, partitionCols: Seq[String],
      orderBy: Seq[Column], k: Int = 1, rnCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(orderBy: _*)
    df.withColumn(rnCol, row_number().over(w))
      .filter(col(rnCol) <= k)
      .drop(rnCol)
  }

  /** argmin: one row per key minimizing `ordCol` (struct payload keeps
    * all columns). Partial aggregation makes this shuffle O(keys). */
  def minByTop1(df: DataFrame, keyCols: Seq[String], ordCol: Column): DataFrame = {
    val payload = struct(df.columns.toIndexedSeq.map(col): _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(min_by(payload, ordCol).as("_top"))
      .select(col("_top.*"))
  }
}
