package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All are pure
  * column expressions (codegen'd, no UDFs) so they run inside whole-stage
  * codegen over 100 TB of documents.
  */
object Text {

  /** Lowercased word tokens — fused native expression (the HOF form
    * `filter(split(lower(..)))` is CodegenFallback; see
    * [[graft.functions.NgramUtil]]). */
  def tokens(text: Column): Column = graft.functions.wordTokens(text)

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

  /** Winner pick over already-staged score columns: argmax over
    * (en, de, es, fr) with ties going to the earlier language, zh when CJK
    * characters dominate. Flat CASE chain — each score column is referenced
    * a bounded number of times, vs a struct-fold whose branches duplicate
    * the whole scoring subtree exponentially. */
  private def langWinner(text: Column, cjk: Column, sEn: Column, sDe: Column,
                         sEs: Column, sFr: Column): Column =
    when(cjk * 4 > length(text), lit("zh"))
      .when(sEn >= sDe && sEn >= sEs && sEn >= sFr, lit("en"))
      .when(sDe >= sEs && sDe >= sFr, lit("de"))
      .when(sEs >= sFr, lit("es"))
      .otherwise(lit("fr"))

  /** Heuristic language ID: CJK character ratio decides zh; otherwise the
    * language whose stopword list scores most hits (en on tie/no-hits).
    * A real pipeline swaps in a fastText-style model via the same column
    * contract; this stays expression-only and deterministic.
    *
    * Column-level convenience — for per-row cost at corpus scale use
    * [[withLangId]], which stages the tokenizer and score columns so each
    * is computed once per row. */
  def langIdGuess(text: Column): Column = {
    val toks = tokens(text)
    val cjk = regexp_count(text, lit("[\\u4e00-\\u9fff]"))
    langWinner(text, cjk, hits(toks, "en"), hits(toks, "de"),
      hits(toks, "es"), hits(toks, "fr"))
  }

  /** Staged language ID: tokenizer and per-language scores become real
    * projection stages (CollapseProject keeps non-cheap aliases staged), so
    * the regex split and each stopword filter run exactly once per row. */
  def withLangId(df: DataFrame, textCol: String, out: String): DataFrame = {
    val text = col(textCol)
    df.withColumn("_toks", tokens(text))
      .withColumn("_cjk", regexp_count(text, lit("[\\u4e00-\\u9fff]")))
      .withColumn("_s_en", hits(col("_toks"), "en"))
      .withColumn("_s_de", hits(col("_toks"), "de"))
      .withColumn("_s_es", hits(col("_toks"), "es"))
      .withColumn("_s_fr", hits(col("_toks"), "fr"))
      .withColumn(out, langWinner(text, col("_cjk"), col("_s_en"),
        col("_s_de"), col("_s_es"), col("_s_fr")))
      .drop("_toks", "_cjk", "_s_en", "_s_de", "_s_es", "_s_fr")
  }

  /** Quality-score formula over staged statistics columns. */
  private def qualityFormula(text: Column, toks: Column,
                             alpha: Column, stops: Column): Column = {
    val nChars = length(text).cast("double")
    val nToks = size(toks).cast("double")
    val meanTok = (alpha / greatest(nToks, lit(1.0)))
    val lenScore = least(nChars / 500.0, lit(1.0))
    val alphaRatio = alpha / greatest(nChars, lit(1.0))
    val stopRatio = least(stops * 10.0 / greatest(nToks, lit(1.0)), lit(1.0))
    val tokScore = when(meanTok.between(3.0, 10.0), 1.0).otherwise(0.5)
    round((lenScore + alphaRatio + stopRatio + tokScore) / 4.0, 6)
  }

  /** Quality score in [0,1] from cheap surface statistics: length band,
    * alphabetic ratio, stopword ratio, mean token length band. Mirrors the
    * C4/Gopher-style filters expressible without models. For corpus-scale
    * per-row cost use [[withQualityScore]] (staged evaluation). */
  def qualityScore(text: Column): Column =
    qualityFormula(text, tokens(text),
      regexp_count(text, lit("[A-Za-z]")).cast("double"),
      hits(tokens(text), "en").cast("double"))

  /** Staged quality score: tokenizer and counters computed once per row. */
  def withQualityScore(df: DataFrame, textCol: String,
                       out: String): DataFrame = {
    val text = col(textCol)
    df.withColumn("_toks", tokens(text))
      .withColumn("_alpha", regexp_count(text, lit("[A-Za-z]")).cast("double"))
      .withColumn("_stops", hits(col("_toks"), "en").cast("double"))
      .withColumn(out,
        qualityFormula(text, col("_toks"), col("_alpha"), col("_stops")))
      .drop("_toks", "_alpha", "_stops")
  }

  /** Winnowing-style document fingerprint: xxhash64 over every w-token
    * shingle, keep the minimum per document (plus shingle count). Two
    * documents sharing long runs of text collide on fingerprints; grouping
    * by `min_fp` buckets candidates for containment checks. */
  def fingerprint(df: DataFrame, textCol: String, idCol: String,
                  w: Int = 8, keepText: Boolean = false): DataFrame = {
    val base = Seq(col(idCol),
      element_at(graft.functions.minHashes(col("shingles"), 1,
        seedIndexed = false), 1).as("min_fp"),
      size(col("shingles")).as("n_shingles"))
    val projected = if (keepText) base :+ col(textCol) else base
    Dedup.shingles(df, textCol, w).select(projected: _*)
  }
}
