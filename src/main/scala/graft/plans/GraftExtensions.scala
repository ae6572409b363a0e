package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** SparkSessionExtensions installer: registers graft's native
  * expressions as SQL functions, so `spark.sql("... cosine_sim(a,b)")`
  * works in any session built with
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (the (c)-tier extension mechanism; used by Verify/Bench/tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.CosineSimilarity].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graft.CosineSimilarity(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.JaroWinkler].getName, "jaro_winkler"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graft.JaroWinkler(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("canonical_url"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.CanonicalUrl].getName, "canonical_url"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graft.CanonicalUrl(children(0))))
    // simhash_sig(text, nBits, md5Variant) — width/variant must be
    // foldable literals (they parameterize codegen, not per-row data)
    ext.injectFunction((
      FunctionIdentifier("simhash_sig"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.SimHashSig].getName, "simhash_sig"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graft.SimHashSig(children(0),
          children(1).eval().asInstanceOf[Int],
          children(2).eval().asInstanceOf[Boolean])))
    ext.injectFunction((
      FunctionIdentifier("bpe_merge"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.BpeMerge].getName, "bpe_merge"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graft.BpeMerge(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("word_shingle_hashes"),
      new ExpressionInfo(classOf[org.apache.spark.sql.graft.WordShingleHashes].getName, "word_shingle_hashes"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        org.apache.spark.sql.graft.WordShingleHashes(children(0),
          children(1).eval().asInstanceOf[Int])))
    // Opt-in top-1-window → min_by rewrite (see RewriteTop1Window;
    // inert unless spark.graft.rewriteTop1Window=true).
    ext.injectOptimizerRule(_ => org.apache.spark.sql.graft.RewriteTop1Window)
    // Always-on: bound-compares of levenshtein use the banded
    // thresholded form (unconditionally sound — see the rule).
    ext.injectOptimizerRule(_ =>
      org.apache.spark.sql.graft.RewriteThresholdedLevenshtein)
  }
}
