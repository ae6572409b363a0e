package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Inline data-quality counters via `Dataset.observe` — validation
  * metrics (row counts, null counts, constraint violations) collected
  * DURING the job's existing pass with accumulator semantics. The
  * alternative — a separate validation aggregation — is a second full
  * scan, which at 100 TB doubles the pipeline's read; observe rides
  * the same tasks for free and survives whatever the job does
  * downstream (write, count, noop). */
object Observe {

  /** Attach row/null counters for `cols` plus any named `checks`
    * (count of rows where the predicate holds — use for violation
    * counts). Read the metrics from the returned Observation after
    * the FIRST action on the returned frame. */
  def withQualityMetrics(df: DataFrame, cols: Seq[String],
      checks: Map[String, Column] = Map.empty): (DataFrame, Observation) = {
    val obs = Observation()
    val metrics =
      count(lit(1)).as("n_rows") +:
        (cols.map(c =>
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}_nulls")) ++
          checks.toSeq.sortBy(_._1).map { case (name, pred) =>
            sum(when(pred, 1L).otherwise(0L)).as(name)
          })
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
