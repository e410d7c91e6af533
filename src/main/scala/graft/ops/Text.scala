package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All are pure
  * column expressions (codegen'd, no UDFs) so they run inside whole-stage
  * codegen over 100 TB of documents.
  */
object Text {

  /** Lowercased word tokens. */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\W+"), t => length(t) > 0)

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish token count: letter runs, digit runs, and single
    * punctuation/symbol characters each count as one token — the usual
    * pre-tokenization shape of byte-pair encoders. RE2/Java-regex-portable
    * pattern so the DuckDB oracle can mirror it. */
  val bpeTokenPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeTokenPattern), lit(0)))

  // Tiny per-language stopword lists for the n-gram/stopword heuristic.
  private val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "was"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "que", "una"),
    "fr" -> Seq("le", "la", "les", "est", "et", "une", "dans", "que", "pas"))

  /** Per-language stopword hit count over the token array. */
  private def hits(toks: Column, lang: String): Column =
    size(filter(toks, t => t.isin(stopwords(lang): _*)))

  /** Heuristic language ID: CJK character ratio decides zh; otherwise the
    * language whose stopword list scores most hits (en on tie/no-hits).
    * A real pipeline swaps in a fastText-style model via the same column
    * contract; this stays expression-only and deterministic. */
  def langIdGuess(text: Column): Column = {
    val toks = tokens(text)
    val cjk = size(regexp_extract_all(text, lit("[\\u4e00-\\u9fff]"), lit(0)))
    val scored = Seq("de", "es", "fr").foldLeft(
      struct(hits(toks, "en").as("score"), lit("en").as("lang"))) {
      case (best, lang) =>
        val cand = struct(hits(toks, lang).as("score"), lit(lang).as("lang"))
        when(cand("score") > best("score"), cand).otherwise(best)
    }
    when(cjk * 4 > length(text), lit("zh")).otherwise(scored("lang"))
  }

  /** Quality score in [0,1] from cheap surface statistics: length band,
    * alphabetic ratio, stopword ratio, mean token length band. Mirrors the
    * C4/Gopher-style filters expressible without models. */
  def qualityScore(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    val alpha =
      size(regexp_extract_all(text, lit("[A-Za-z]"), lit(0))).cast("double")
    val stops = hits(toks, "en").cast("double")
    val meanTok = (alpha / greatest(nToks, lit(1.0)))
    val lenScore = least(nChars / 500.0, lit(1.0))
    val alphaRatio = alpha / greatest(nChars, lit(1.0))
    val stopRatio = least(stops * 10.0 / greatest(nToks, lit(1.0)), lit(1.0))
    val tokScore = when(meanTok.between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lenScore + alphaRatio + stopRatio + tokScore) / 4.0, 6)
  }

  /** Winnowing-style document fingerprint: xxhash64 over every w-token
    * shingle, keep the minimum per document (plus shingle count). Two
    * documents sharing long runs of text collide on fingerprints; grouping
    * by `min_fp` buckets candidates for containment checks. */
  def fingerprint(df: DataFrame, textCol: String, idCol: String,
                  w: Int = 8): DataFrame = {
    val sh = Dedup.shingles(df, textCol, w)
    sh.select(col(idCol),
        transform(col("shingles"), s => xxhash64(s)).as("fps"))
      .select(col(idCol),
        array_min(col("fps")).as("min_fp"),
        size(col("fps")).as("n_shingles"))
  }
}
