package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{DotProduct, MinHashSignature, RollingFingerprint, SimHash64, SimHashBits, TopKPairs, WordShingles}
import org.apache.spark.sql.catalyst.expressions.Literal

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions as SQL functions so `spark.sql("SELECT dot_product(a, b)")`
  * works anywhere DataFrame code does.
  *
  * Activate with:
  * {{{
  *   SparkSession.builder()
  *     .withExtensions(new GraftExtensions)           // programmatic
  *   // or: --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Scale-safety rewrite: SUM(x) OVER () → broadcast one-row aggregate
    // (an unpartitioned window serializes the dataset through one task;
    // see graft.plans.RewriteGlobalWindowTotals).
    ext.injectOptimizerRule(_ => graft.plans.RewriteGlobalWindowTotals)
    // Custom operator tier (c): AsOfJoinNode (LogicalPlan) planned by
    // AsOfJoinStrategy into AsOfJoinExec — a one-pass sort-merge
    // point-in-time join over co-partitioned children.
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - sequential dot product of two array<double>"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit SimHash of an array<string>"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(tokens, k) - distinct word k-shingles"),
      (children: Seq[Expression]) => WordShingles(children(0), intArg(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("minhash_signature"),
      info("minhash_signature",
        "minhash_signature(md5_hashes, n) - n-element double-hashed minhash signature"),
      (children: Seq[Expression]) => MinHashSignature(children(0), intArg(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("simhash_bits"),
      info("simhash_bits",
        "simhash_bits(hashes, width) - SimHash over precomputed array<bigint> hashes"),
      (children: Seq[Expression]) => SimHashBits(children(0), intArg(children(1)))))
    ext.injectFunction((
      FunctionIdentifier("topk_pairs"),
      info("topk_pairs",
        "topk_pairs(score, id, k) - bounded best-first top-k aggregate of (score, id) pairs"),
      (children: Seq[Expression]) => TopKPairs(children(0), children(1),
        intArg(children(2)))))
    ext.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      info("rolling_fingerprint",
        "rolling_fingerprint(text, window, stride) - winnowed Rabin-Karp fingerprints"),
      (children: Seq[Expression]) => RollingFingerprint(children(0),
        intArg(children(1)), intArg(children(2)))))
  }

  /** Constant int argument (k / numHashes must be literal at plan time). */
  private def intArg(e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"expected a literal integer argument, got $other")
  }
}
