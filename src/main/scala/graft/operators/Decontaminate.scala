package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag corpus documents sharing long
  * n-gram spans with an evaluation set (the n=13 overlap rule from the
  * GPT-3/PaLM eval cards). Two physical strategies for the same
  * logical result:
  *
  *   - [[overlapCounts]]: broadcast the exact benchmark gram set and
  *     hash-join map-side. Right whenever the benchmark fits the
  *     broadcast budget (eval suites usually do).
  *   - [[overlapCountsBloom]]: when the gram set is too big to ship
  *     exactly (many benchmarks × many grams), broadcast an O(bits)
  *     Bloom sketch instead, drop the ~100% of corpus grams that miss
  *     it AT THE MAPPERS, and exact-verify only the survivors with a
  *     shuffle join. False positives cost only verify traffic — the
  *     final result is EXACT (identical to [[overlapCounts]]), which
  *     is why the driver can hold both to the same oracle. The
  *     shuffled volume drops from O(corpus grams) to
  *     O(matches + fpp·corpus grams): at 100 TB that is the difference
  *     between shuffling the corpus and shuffling a rounding error.
  *
  * The gram stream rides the native codegen'd shingle hasher
  * (WordShingleHashes) in both paths; the Bloom probe is Spark's own
  * `might_contain` (BloomFilterMightContain) over a binary-literal
  * sketch — fully codegen'd, no UDF anywhere in the path.
  */
object Decontaminate {

  /** Distinct benchmark gram hashes (the contamination dictionary). */
  def benchGrams(bench: DataFrame, textCol: String, n: Int): DataFrame =
    bench.select(explode(
      TextAnalysis.wordShingleHashesNative(col(textCol), n)).as("h"))
      .distinct()

  /** Per-document count of distinct benchmark grams it contains;
    * documents with zero overlap are absent (inner join). */
  def overlapCounts(corpus: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 13): DataFrame =
    corpus.select(col(idCol),
        explode(TextAnalysis.wordShingleHashesNative(col(textCol), n)).as("h"))
      .join(broadcast(benchGrams(bench, textCol, n)), Seq("h"))
      .groupBy(idCol)
      .agg(countDistinct(col("h")).as("n_shared_grams"))

  /** Same result via a broadcast Bloom sketch + exact verify join.
    * `expectedGrams`/`fpp` size the sketch (n·ln(1/fpp)/ln2² bits);
    * the verify join is deliberately NOT broadcast — the premise is
    * the exact set exceeds the broadcast budget. */
  def overlapCountsBloom(corpus: DataFrame, bench: DataFrame,
      idCol: String = "doc_id", textCol: String = "text", n: Int = 13,
      expectedGrams: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    // grams is evaluated twice (bloom build job + verify join); a
    // production pipeline persists or checkpoints it between the two —
    // not done here because the returned plan is lazy and an eager
    // unpersist would silently drop the cache before the query runs.
    val grams = benchGrams(bench, textCol, n)
    val bf = grams.stat.bloomFilter("h", expectedGrams, fpp)
    // probe through the native BloomFilterMightContain expression (a
    // codegen'd bitset test) rather than a boxed long→boolean UDF: the
    // sketch rides the plan as a foldable binary literal, so every
    // task gets it with its closure — same distribution cost as a
    // broadcast, none of the per-row UDF boxing on the gram stream
    val sketchBytes = {
      val out = new java.io.ByteArrayOutputStream()
      bf.writeTo(out)
      out.toByteArray
    }
    // The literal path has a hard ceiling: the serialized sketch
    // (~1.2 MB at the 2^20/0.01 defaults, linear in expectedGrams) is
    // carried in EVERY serialized plan fragment, explain string and
    // event-log entry. 32 MB (expectedGrams ≈ 2.8e7 at fpp=0.01) is
    // far past any benchmark-contamination set; beyond that, feed the
    // sketch the way Spark's own runtime bloom join does — a scalar
    // subquery evaluated once and broadcast — instead of a literal.
    require(sketchBytes.length <= (32 << 20),
      s"serialized bloom sketch is ${sketchBytes.length} B; the plan-literal " +
        "path is capped at 32 MB — lower expectedGrams or feed the sketch " +
        "via a scalar-subquery/broadcast expression")
    corpus.select(col(idCol),
        explode(TextAnalysis.wordShingleHashesNative(col(textCol), n))
          .as("h"))
      .filter(org.apache.spark.sql.graft.ColumnShim.column(
        new org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          org.apache.spark.sql.graft.ColumnShim.expression(lit(sketchBytes)),
          org.apache.spark.sql.graft.ColumnShim.expression(col("h")))))
      .join(grams.hint("shuffle_hash"), Seq("h"))
      .groupBy(idCol)
      .agg(countDistinct(col("h")).as("n_shared_grams"))
  }
}
