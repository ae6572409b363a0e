package graft.operators

import graft.SparkTestBase

class UpsertSpec extends SparkTestBase {
  import spark.implicits._

  private def base = Seq(
    (1L, 1, "one-v1", false),
    (2L, 1, "two-v1", false),
    (3L, 1, "three-v1", false)
  ).toDF("k", "rev", "payload", "deleted")

  test("latest revision wins, new keys insert, tombstones delete") {
    val changes = Seq(
      (1L, 2, "one-v2", false),  // update
      (2L, 2, "two-v2", true),   // delete
      (4L, 1, "four-v1", false)  // insert
    ).toDF("k", "rev", "payload", "deleted")

    val out = Upsert.mergeLatest(base, changes, "k", "rev",
        tombstoneCol = Some("deleted"))
      .orderBy("k")
      .as[(Long, Int, String, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 2, "one-v2", false),
      (3L, 1, "three-v1", false),
      (4L, 1, "four-v1", false)))
  }

  test("change batch wins a same-revision tie; stale lower rev loses") {
    val changes = Seq(
      (1L, 1, "one-v1-reprocessed", false), // same rev → change side wins
      (3L, 0, "three-v0-stale", false)      // lower rev → base wins
    ).toDF("k", "rev", "payload", "deleted")

    val out = Upsert.mergeLatest(base, changes, "k", "rev")
      .orderBy("k")
      .as[(Long, Int, String, Boolean)].collect().toSeq
    assert(out === Seq(
      (1L, 1, "one-v1-reprocessed", false),
      (2L, 1, "two-v1", false),
      (3L, 1, "three-v1", false)))
  }

  test("tombstones are kept when no tombstone column is declared") {
    val changes = Seq((2L, 2, "two-v2", true))
      .toDF("k", "rev", "payload", "deleted")
    val out = Upsert.mergeLatest(base, changes, "k", "rev")
      .filter($"k" === 2L)
      .as[(Long, Int, String, Boolean)].collect().toSeq
    assert(out === Seq((2L, 2, "two-v2", true)))
  }
}
