package graft

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures what [[ExtensionQueries.foldClusterMapDurable]] buys a
  * nightly deployment: the durable persist cost of a day's cluster-map
  * fold (tiny patch-table overwrite + batch-sized new-node append) vs
  * the corpus-sized snapshot overwrite ([[ExtensionQueries
  * .writeClusterMap]]) it replaces — plus the patched-read tax and the
  * periodic compaction cost, at replica scale where the corpus:batch
  * ratio makes the difference visible.
  *
  *   SPARK_GRAFT_CPUS=32 SPARK_DRIVER_MEM=48g \
  *   sbt "runMain graft.ClusterFoldProbe /tmp/sf12.5xm"
  *
  * Stages (each timed separately so the persist cost is isolated from
  * the pair discovery and CC build every strategy shares):
  *  1. ccbuild  — the corpus cluster map (label propagation), built
  *                once per snapshot under EITHER strategy;
  *  2. snapwrite— the bucketed corpus-sized table write (what a
  *                fold-less nightly job re-pays per day);
  *  3. pairs    — the day's new incremental pairs (x39's fixture,
  *                shared by both strategies);
  *  4. fold     — foldClusterMapDurable: clusterFoldDelta + patch
  *                overwrite + new-node bucketed append (the O(batch)
  *                persist);
  *  5. read     — readClusterMap on the patched table (full count —
  *                the broadcast-relabel tax every consumer pays);
  *  6. compact  — compactClusterMap (the periodic canonicalization,
  *                corpus-sized by design).
  * Prints one JSON line. */
object ClusterFoldProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val table = "g_fold_probe_map"
    // 1. corpus cluster map build (memoized persisted frame)
    val (map, tBuild) = timed {
      val m = ExtensionQueries.clusterMapArtifact.memoized(spark, sfDir)
      val _ = m.count()
      m
    }
    val mapRows = map.count()
    // 2. the corpus-sized snapshot write — the per-day cost WITHOUT
    // the durable fold (build already paid above, so this times the
    // bucketed table write alone)
    val (_, tSnapWrite) = timed {
      ExtensionQueries.writeClusterMap(spark, sfDir, table)
    }
    // 3. the day's new pairs (x39's increment fixture)
    val docs = Tables.wide(Tables.documents(spark, sfDir))
      .select(col("doc_id"), col("text"))
    val kWords = expr("cast((size(split(text, ' ')) * 9 + 9) div 10 as int)")
    val increment = docs.filter(col("doc_id") % 9 === 4)
      .select((col("doc_id") + 5000000000000L).as("doc_id"),
        array_join(slice(split(col("text"), " "), lit(1), kWords), " ")
          .as("text"))
    val (nPairs, tPairs) = timed {
      val p = Dedup.incrementalJaccardPairsPpm(docs, increment,
        "doc_id", "text", 3, 800000L, Dedup.DfCap.NoCap).persist()
      p.count()
    }
    val pairs = Dedup.incrementalJaccardPairsPpm(docs, increment,
      "doc_id", "text", 3, 800000L, Dedup.DfCap.NoCap)
    // 4. the durable O(batch) fold persist
    val (_, tFold) = timed {
      ExtensionQueries.foldClusterMapDurable(spark, sfDir, table, pairs)
    }
    val patchRows = spark.table(table +
      ExtensionQueries.ClusterMapPatchSuffix).count()
    // 5. the patched read every consumer pays post-fold
    val (foldedRows, tRead) = timed {
      ExtensionQueries.readClusterMap(spark, table).count()
    }
    // 6. periodic compaction back to a canonical snapshot
    val (_, tCompact) = timed {
      ExtensionQueries.compactClusterMap(spark, table)
    }
    println(s"""{"probe":"cluster_fold","sf":"$sfDir"""" +
      s""","map_rows":$mapRows,"n_pairs":$nPairs""" +
      s""","patch_rows":$patchRows,"folded_rows":$foldedRows""" +
      f""","ccbuild_s":$tBuild%.2f,"snapwrite_s":$tSnapWrite%.2f""" +
      f""","pairs_s":$tPairs%.2f,"fold_s":$tFold%.2f""" +
      f""","read_s":$tRead%.2f,"compact_s":$tCompact%.2f}""")
    spark.stop()
  }
}
