package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Divide, Expression, ExpressionInfo, Multiply, Sqrt}

import org.apache.spark.sql.catalyst.expressions.IntegerLiteral

import graft.functions.{CharEntropy, CharNgrams, CmsEstimate, DeletionNeighbors, DotProduct, MinHashes, SimHash64, WordChunks, WordNgrams, WordTokens}

/** SparkSessionExtensions module: registers the engine's native expressions
  * as SQL functions so `spark.sql("SELECT graft_dot(a,b) ...")` works.
  * Install with `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[DotProduct].getName, null, name, usage, "")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      new FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two double arrays"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_cosine"),
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two double arrays"),
      (args: Seq[Expression]) => {
        val (a, b) = (args(0), args(1))
        Divide(DotProduct(a, b),
          Multiply(Sqrt(DotProduct(a, a)), Sqrt(DotProduct(b, b))))
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_word_tokens"),
      info("graft_word_tokens",
        "graft_word_tokens(text) - lowercased word tokens, one fused scan"),
      (args: Seq[Expression]) => WordTokens(args(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_word_ngrams"),
      info("graft_word_ngrams",
        "graft_word_ngrams(text, n) - distinct word n-gram shingles"),
      (args: Seq[Expression]) => args(1) match {
        case IntegerLiteral(n) => WordNgrams(args(0), n, distinct = true)
        case other => throw new IllegalArgumentException(
          s"graft_word_ngrams: n must be an integer literal, got $other")
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_minhashes"),
      info("graft_minhashes",
        "graft_minhashes(shingles, k) - k seeded minhash minima"),
      (args: Seq[Expression]) => args(1) match {
        case IntegerLiteral(k) => MinHashes(args(0), k)
        case other => throw new IllegalArgumentException(
          s"graft_minhashes: k must be an integer literal, got $other")
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_char_ngrams"),
      info("graft_char_ngrams",
        "graft_char_ngrams(text, n) - distinct character n-gram shingles"),
      (args: Seq[Expression]) => args(1) match {
        case IntegerLiteral(n) => CharNgrams(args(0), n)
        case other => throw new IllegalArgumentException(
          s"graft_char_ngrams: n must be an integer literal, got $other")
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_char_entropy"),
      info("graft_char_entropy",
        "graft_char_entropy(text) - character Shannon entropy (nats)"),
      (args: Seq[Expression]) => CharEntropy(args(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_simhash64"),
      info("graft_simhash64",
        "graft_simhash64(tokens) - 64-bit simhash of a token array"),
      (args: Seq[Expression]) => SimHash64(args(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_word_chunks"),
      info("graft_word_chunks",
        "graft_word_chunks(text, size, stride) - overlapping token windows"),
      (args: Seq[Expression]) => (args(1), args(2)) match {
        case (IntegerLiteral(size), IntegerLiteral(stride)) =>
          WordChunks(args(0), size, stride)
        case other => throw new IllegalArgumentException(
          s"graft_word_chunks: size/stride must be integer literals, got $other")
      }))
    // Spark's runtime-filter bloom expressions, exposed as user-callable
    // SQL functions: build a bloom over a long column, probe it with a
    // scalar-subquery filter. The probe is a pure projection-side predicate
    // — the 100 TB decontamination prefilter with zero corpus shuffle.
    e.injectFunction((
      new FunctionIdentifier("graft_bloom_agg"),
      info("graft_bloom_agg",
        "graft_bloom_agg(col[, expectedItems]) - bloom binary over bigints"),
      (args: Seq[Expression]) => args match {
        case Seq(c) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c)
        case Seq(c, IntegerLiteral(n)) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, n.toLong)
        case Seq(c, org.apache.spark.sql.catalyst.expressions
            .Literal(n: Long, _)) =>
          new org.apache.spark.sql.catalyst.expressions.aggregate
            .BloomFilterAggregate(c, n)
        case other => throw new IllegalArgumentException(
          "graft_bloom_agg takes (col) or (col, int-literal expectedItems), " +
            s"got $other")
      }))
    e.injectFunction((
      new FunctionIdentifier("graft_might_contain"),
      info("graft_might_contain",
        "graft_might_contain(bloom, v) - probe a bloom filter binary"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions
          .BloomFilterMightContain(args(0), args(1))))
    e.injectFunction((
      new FunctionIdentifier("graft_deletion_neighbors"),
      info("graft_deletion_neighbors",
        "graft_deletion_neighbors(s) - identity + single-deletion variants"),
      (args: Seq[Expression]) => DeletionNeighbors(args(0))))
    e.injectFunction((
      new FunctionIdentifier("graft_cms_estimate"),
      info("graft_cms_estimate",
        "graft_cms_estimate(sketch, item) - probe a count_min_sketch " +
          "binary (sketch must be foldable, e.g. a scalar-subquery literal)"),
      (args: Seq[Expression]) => CmsEstimate(args(0), args(1))))
  }
}
