package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HierarchySpec extends SparkTestBase {
  import spark.implicits._

  private def resolve(nodes: Seq[Long], edges: Seq[(Long, Long)]) =
    Hierarchy.resolveToRoot(
        nodes.toDF("id"), "id",
        edges.toDF("child", "parent"), "child", "parent")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("deep chain resolves in 6 doubling rounds (depth 40 > 2^5)") {
    // 0 ← 1 ← 2 ← … ← 40: naive per-level loop needs 40 rounds,
    // doubling covers depth ≤ 63 in the default 6
    val out = resolve(0L to 40L, (1L to 40L).map(i => i -> (i - 1)))
    assert(out(0L) === ((0L, 0L)))
    assert(out(40L) === ((0L, 40L)))
    assert(out(17L) === ((0L, 17L)))
  }

  test("forest: each tree resolves to its own root, roots stay put") {
    //   0 ← 1, 0 ← 2, 2 ← 3   and a second tree   10 ← 11
    val out = resolve(Seq(0L, 1L, 2L, 3L, 10L, 11L),
      Seq(1L -> 0L, 2L -> 0L, 3L -> 2L, 11L -> 10L))
    assert(out(3L) === ((0L, 2L)))
    assert(out(11L) === ((10L, 1L)))
    assert(out(10L) === ((10L, 0L)))
    assert(out(0L) === ((0L, 0L)))
  }

  test("empty edges: every node is its own root at depth 0") {
    val out = resolve(Seq(5L, 6L), Seq.empty)
    assert(out === Map(5L -> ((5L, 0L)), 6L -> ((6L, 0L))))
  }
}
