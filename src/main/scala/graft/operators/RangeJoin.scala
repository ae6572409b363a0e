package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Range (interval-containment) join: points ⋈ intervals on
  * `lo <= point < hi`, as a bucketed EQUI join instead of the
  * broadcast-nested-loop Catalyst plans for a bare inequality
  * condition.
  *
  * Scheme (the standard interval-bucketing rewrite): pick a fixed
  * bucket width W; every interval is replicated to each W-aligned
  * bucket it overlaps, every point maps to its single containing
  * bucket, and a hash equi-join on the bucket id meets exactly the
  * (point, interval) pairs whose buckets coincide — the residual
  * `lo <= p < hi` filter keeps true containments. Each true pair is
  * produced exactly once (a point has ONE bucket, and the interval has
  * at most one copy in it), so no distinct pass is needed.
  *
  * Scale: the join is a shuffle/broadcast HASH join on a long key —
  * O(|points| + Σ(interval width/W)) shuffled rows, versus O(|p|·|i|)
  * compared pairs for the nested-loop plan. Pick W near the median
  * interval width: replication per interval is ceil(width/W)+1 ≤ 2
  * copies at W = width, while points never replicate. Domain is
  * integral (longs — timestamps in µs, money in cents); bucket ids
  * use exact floor division (decimal, not double, so magnitudes past
  * 2^53 stay exact).
  */
object RangeJoin {

  /** Exact floor(c / w). Integral columns take the long fast path —
    * `(c - pmod(c, w)) div w` is all 64-bit arithmetic (pmod makes the
    * numerator divisible AND ≤ c, so truncating `div` equals floor) —
    * since the decimal fallback costs a per-row BigDecimal pmod+divide
    * that dominated the whole join when measured. */
  private def floorDiv(df: DataFrame, colName: String, w: Long): Column = {
    val c = col(colName)
    df.schema(colName).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        val x = c.cast("long")
        ColumnShim.column(
          new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
            ColumnShim.expression(x - pmod(x, lit(w))),
            ColumnShim.expression(lit(w))))
      case _ =>
        val d = c.cast("decimal(38,0)")
        ((d - pmod(d, lit(w))) / lit(w)).cast("long")
    }
  }

  /** Inner join `points` to `intervals` where
    * `intervals(loCol) <= points(pointCol) < intervals(hiCol)`.
    * Output: all point columns + all interval columns (names must not
    * collide). Empty intervals (hi <= lo) match nothing. */
  def pointInInterval(points: DataFrame, pointCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val collisions = intervals.columns.toSet.intersect(points.columns.toSet)
    require(collisions.isEmpty,
      s"interval columns collide with points: ${collisions.mkString(",")}")
    val reserved = Set("_bucket", "_hi1")
      .intersect(points.columns.toSet ++ intervals.columns.toSet)
    require(reserved.isEmpty,
      s"reserved working columns present in input: ${reserved.mkString(",")}")
    val ivb = intervals
      .filter(col(hiCol) > col(loCol))
      .withColumn("_hi1", col(hiCol) - 1)
    pointInBucketedIntervals(points, pointCol, ivb, loCol, hiCol, bucketWidth)
  }

  private def pointInBucketedIntervals(points: DataFrame, pointCol: String,
      ivb: DataFrame, loCol: String, hiCol: String,
      bucketWidth: Long): DataFrame = {
    val ivb2 = ivb.withColumn("_bucket", explode(sequence(
        floorDiv(ivb, loCol, bucketWidth),
        floorDiv(ivb, "_hi1", bucketWidth)))).drop("_hi1")
    val pb = points.withColumn("_bucket", floorDiv(points, pointCol, bucketWidth))
    pb.join(ivb2, Seq("_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }

  /** 2D spatial containment join: points (x, y) ⋈ boxes on
    * `xlo <= x < xhi AND ylo <= y < yhi` — the interval-bucketing
    * rewrite applied per dimension (the grid-cell / geohash-style
    * spatial join). Each box replicates to the cross product of the
    * x- and y-bucket ranges it spans, each point maps to its single
    * (bx, by) cell, and the hash equi join on the cell meets each true
    * pair exactly once; the residual 2D containment filter keeps true
    * hits. Replication per box is (⌈w/Wx⌉+1)·(⌈h/Wy⌉+1) ≤ 4 copies at
    * cell ≈ box size, points never replicate — versus the
    * O(|points|·|boxes|) nested loop the bare conjunction plans. */
  def pointInBox(points: DataFrame, xCol: String, yCol: String,
      boxes: DataFrame, xloCol: String, xhiCol: String,
      yloCol: String, yhiCol: String,
      xBucket: Long, yBucket: Long): DataFrame = {
    require(xBucket > 0 && yBucket > 0, "bucket widths must be positive")
    val collisions = boxes.columns.toSet.intersect(points.columns.toSet)
    require(collisions.isEmpty,
      s"box columns collide with points: ${collisions.mkString(",")}")
    val reserved = Set("_bx", "_by", "_xh1", "_yh1")
      .intersect(points.columns.toSet ++ boxes.columns.toSet)
    require(reserved.isEmpty,
      s"reserved working columns present in input: ${reserved.mkString(",")}")
    val b1 = boxes
      .filter(col(xhiCol) > col(xloCol) && col(yhiCol) > col(yloCol))
      .withColumn("_xh1", col(xhiCol) - 1)
      .withColumn("_yh1", col(yhiCol) - 1)
    val b2 = b1.withColumn("_bx", explode(sequence(
      floorDiv(b1, xloCol, xBucket), floorDiv(b1, "_xh1", xBucket))))
    val b3 = b2.withColumn("_by", explode(sequence(
      floorDiv(b2, yloCol, yBucket), floorDiv(b2, "_yh1", yBucket))))
      .drop("_xh1", "_yh1")
    val pb = points
      .withColumn("_bx", floorDiv(points, xCol, xBucket))
      .withColumn("_by", floorDiv(points, yCol, yBucket))
    pb.join(b3, Seq("_bx", "_by"))
      .filter(col(xCol) >= col(xloCol) && col(xCol) < col(xhiCol) &&
        col(yCol) >= col(yloCol) && col(yCol) < col(yhiCol))
      .drop("_bx", "_by")
  }
}
