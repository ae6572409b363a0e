package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hierarchy traversal — the `WITH RECURSIVE` migration gap. Spark has
  * no recursive CTE; the scale-correct replacement for "walk every
  * node to its root" is POINTER DOUBLING: keep a jump table of
  * (node → 2^k-th ancestor, distance) and square it each round while
  * states apply the current jumps. After r rounds every node has
  * advanced up to 2^r − 1 steps, so SIX rounds resolve any hierarchy
  * of depth ≤ 63 — org charts, BOM explosions, thread trees, category
  * taxonomies all fit with room to spare. A naive per-level loop costs
  * O(depth) shuffle rounds (a 40-deep BOM = 40 jobs); doubling costs
  * O(log depth) with the same per-round join+select shape, which is
  * the difference between 6 and 40 barriers at 100 TB.
  */
object Hierarchy {

  /** Resolve every node to (id, anc, depth): `anc` = the root of its
    * tree (or the 2^rounds−1-step ancestor if deeper — callers size
    * `rounds` to ⌈log2(maxDepth+1)⌉), `depth` = exact distance
    * travelled. Roots (no outgoing edge) keep anc = id, depth = 0.
    * Both the state and the jump table persist per round, and the
    * previous round unpersists — bounded lineage, bounded storage,
    * exactly the connectedComponents discipline.
    *
    * CONVERGENCE-AWARE: the per-round materialization action doubles
    * as the convergence probe (number of nodes that advanced this
    * round — same job, one extra aggregate column, never an extra
    * pass), and a zero-advance round ends the loop: `rounds` is a
    * ceiling for the deepest tree the caller accepts, not a fixed
    * price. An org-chart-shaped hierarchy (depth ≤ 7) resolves in 4
    * rounds under the default 6; callers can leave a generous ceiling
    * without paying for it (HierarchySpec pins the job count). */
  def resolveToRoot(nodes: DataFrame, idCol: String,
      edges: DataFrame, childCol: String, parentCol: String,
      rounds: Int = 6): DataFrame = {
    var state = nodes
      .select(col(idCol).cast("long").as("id"),
        col(idCol).cast("long").as("anc"), lit(0L).as("depth"))
    var jump = edges
      .select(col(childCol).cast("long").as("node"),
        col(parentCol).cast("long").as("janc"), lit(1L).as("jd"))
    var prev: Seq[DataFrame] = Nil
    var r = 1
    var converged = false
    while (r <= rounds && !converged) {
      val s2 = state.join(jump, state("anc") === jump("node"), "left")
        .select(state("id"),
          coalesce(col("janc"), state("anc")).as("anc"),
          (state("depth") + coalesce(col("jd"), lit(0L))).as("depth"),
          col("janc").isNotNull.as("_adv"))
        .persist()
      // one action: materializes s2 AND reports how many rows advanced
      val advanced = s2
        .agg(coalesce(sum(when(col("_adv"), 1L).otherwise(0L)), lit(0L)))
        .head().getLong(0)
      converged = advanced == 0L
      val j2 =
        if (converged || r == rounds) jump // no further jumps applied
        else jump.as("a")
          .join(jump.as("b"), col("a.janc") === col("b.node"), "left")
          .select(col("a.node").as("node"),
            coalesce(col("b.janc"), col("a.janc")).as("janc"),
            (col("a.jd") + coalesce(col("b.jd"), lit(0L))).as("jd"))
          .persist()
      if (j2 ne jump) j2.count()
      prev.foreach(_.unpersist(blocking = false))
      prev = Seq(s2) ++ (if (j2 ne jump) Seq(j2) else Nil)
      state = s2
      jump = j2
      r += 1
    }
    state.select(col("id"), col("anc"), col("depth"))
  }
}
