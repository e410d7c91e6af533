package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.TableCatalog

/** Corpus-preparation operators a production LLM training-data pipeline
  * runs after dedup/quality filtering: PII scrubbing, intra-document
  * repetition statistics (Gopher-style filters), deterministic hash-based
  * train/val/test splitting, and token-budget sequence packing.
  *
  * Not in the reference (its corpus is relational rows, not documents) —
  * this tier extends SURVEY.md §2.11 per the north star. Everything here
  * is pure codegen'd column expressions + windows: no UDFs, no shuffles
  * beyond the ones the semantics require, and every operator is exactly
  * SQL-expressible so the DuckDB oracle checks it bit-for-bit.
  */
object Corpus {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    TableCatalog.load(spark, dir, name)

  // Patterns are written in the Java∩RE2 common subset so Spark and the
  // DuckDB oracle compile them identically.
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[^\\s]+"
  val phonePattern = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII scrub: replace emails, URLs, and phone-shaped numbers with typed
    * placeholder tokens, counting redactions per category. URL first so an
    * email inside a URL is counted once, as a URL. One projection — scales
    * as a pure map over the corpus. */
  def scrubPii(df: DataFrame, textCol: String): DataFrame = {
    val text = col(textCol)
    df.withColumn("n_url", regexp_count(text, lit(urlPattern)).cast("long"))
      .withColumn("_t1",
        regexp_replace(text, urlPattern, "<URL>"))
      .withColumn("n_email",
        regexp_count(col("_t1"), lit(emailPattern)).cast("long"))
      .withColumn("_t2",
        regexp_replace(col("_t1"), emailPattern, "<EMAIL>"))
      .withColumn("n_phone",
        regexp_count(col("_t2"), lit(phonePattern)).cast("long"))
      .withColumn("clean_text",
        regexp_replace(col("_t2"), phonePattern, "<PHONE>"))
      .drop("_t1", "_t2")
  }

  /** Intra-document repetition statistics (the Gopher/C4 repetition
    * filters): type-token ratio and duplicate-bigram fraction. A document
    * whose bigrams repeat heavily is boilerplate or degenerate generation;
    * both scores are pure per-row expressions. */
  def repetitionStats(df: DataFrame, textCol: String): DataFrame = {
    val toks = Text.tokens(col(textCol))
    val grams = graft.functions.wordNgrams(col(textCol), 2, distinct = false)
    df.withColumn("n_toks", size(toks).cast("long"))
      .withColumn("ttr",
        round(size(array_distinct(toks)).cast("double") /
          greatest(size(toks), lit(1)).cast("double"), 6))
      .withColumn("dup_bigram_ratio",
        round(lit(1.0) - size(array_distinct(grams)).cast("double") /
          greatest(size(grams), lit(1)).cast("double"), 6))
  }

  /** Deterministic train/val/test assignment from the md5 of the document
    * text: first hex nibble e → val, f → test, else train (14/16 – 1/16 –
    * 1/16). Content-keyed, so the split survives re-ingestion, re-ordering
    * and re-partitioning — the property a reproducible corpus needs; no
    * shuffle at all. */
  def hashSplit(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("split",
      when(substring(md5(col(textCol)), 1, 1) === "e", "val")
        .when(substring(md5(col(textCol)), 1, 1) === "f", "test")
        .otherwise("train"))

  /** Token-budget sequence packing: documents in `orderCol` order are
    * laid end-to-end and cut into shards of `budget` tokens; a document's
    * shard is the one its first token lands in (offset sharding — the
    * streaming-friendly packer).
    *
    * Scale note: a single global running sum is one range-partitioned
    * window — fine into the billions, but at 100 TB pass `groupCol` to
    * pack independently inside each group (e.g. a date or domain bucket):
    * the window becomes hash-partitioned and embarrassingly parallel. */
  def packSequences(df: DataFrame, orderCol: String, tokCol: String,
                    budget: Int, groupCol: Option[String] = None): DataFrame = {
    val w0 = groupCol.fold(Window.orderBy(col(orderCol)))(g =>
      Window.partitionBy(col(g)).orderBy(col(orderCol)))
    val w = w0.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("cum_tokens", sum(col(tokCol)).over(w))
      .withColumn("shard",
        expr(s"(cum_tokens - $tokCol) div $budget"))
  }

  /** Per-stratum hex threshold for [[stratifiedSample]]: a rate r maps to
    * the 8-hex-digit string ⌊r·16⁸⌋, and a document is kept when the first
    * 8 hex digits of md5(text) compare lexicographically below it —
    * identical semantics in any engine with md5 and string compare, no
    * float parsing of hex needed. */
  private def rateThreshold(rate: Double): String =
    f"${(math.min(math.max(rate, 0.0), 1.0) * 4294967296L).toLong}%08x"
      .take(8)

  /** Deterministic stratified sampling: each stratum (e.g. language) keeps
    * its configured fraction of documents, selected by content hash — so
    * the sample is reproducible across runs, re-ingestion and partitioning,
    * and needs no shuffle or RNG state. The standard corpus-balancing move
    * (downsample the dominant language) expressed as one projection +
    * filter. Rates ≥ 1.0 keep everything; strata not in `rates` use
    * `defaultRate`. */
  def stratifiedSample(df: DataFrame, textCol: String, strataCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    val prefix = substring(md5(col(textCol)), 1, 8)
    def keepFor(rate: Double): Column =
      if (rate >= 1.0) lit(true) else prefix < lit(rateThreshold(rate))
    val keep = rates.foldLeft(keepFor(defaultRate)) {
      case (acc, (stratum, rate)) =>
        when(col(strataCol) === stratum, keepFor(rate)).otherwise(acc)
    }
    df.filter(keep)
  }

  /** Priority corpus mixing: union several sources, then keep ONE copy of
    * each distinct content, from the highest-priority source that has it
    * (ties broken by id) — how curated+web corpora merge without double
    * counting. One shuffle on the content digest; payloads ride the
    * shuffle once. */
  def mixWithPriority(sources: Seq[DataFrame], textCol: String,
                      idCol: String): DataFrame = {
    require(sources.nonEmpty, "at least one source required")
    val tagged = sources.zipWithIndex.map { case (df, i) =>
      df.select(col(idCol), col(textCol)).withColumn("src", lit(i))
    }.reduce(_.unionByName(_))
    val w = Window.partitionBy(md5(col(textCol)))
      .orderBy(col("src"), col(idCol))
    tagged.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Benchmark decontamination: flag corpus documents sharing ≥
    * `minOverlap` distinct word n-grams with ANY benchmark document —
    * the standard guard against test-set leakage into training data.
    *
    * Scale design: benchmarks are tiny next to a training corpus, so the
    * distinct benchmark gram set builds once and BROADCASTS; the corpus
    * side is a single scan → shingle projection → broadcast semi-join →
    * per-doc count. No corpus self-join, no corpus shuffle besides the
    * final per-doc aggregate. `hashGrams = true` (the 100 TB path) joins
    * on 8-byte xxhash64 gram keys instead of gram strings; the string
    * variant exists so the DuckDB oracle can mirror the query exactly. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, textCol: String,
                    idCol: String, n: Int = 3, minOverlap: Int = 1,
                    hashGrams: Boolean = true): DataFrame = {
    def postings(df: DataFrame) = {
      val p = df.select(col(idCol),
        explode(graft.functions.wordNgrams(col(textCol), n)).as("gram"))
      if (hashGrams) p.select(col(idCol), xxhash64(col("gram")).as("gram"))
      else p
    }
    // persist: the corpus shingle projection feeds both the per-doc sizes
    // and the overlap join — without it the dominant scan+shingle pass
    // runs twice (harness releases the cache per query, see Dedup doc)
    val corpusGrams = postings(corpus).persist()
    val benchGrams = postings(benchmark).select("gram").distinct()
    val sizes = corpusGrams.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"))
    val overlap = corpusGrams.join(broadcast(benchGrams), "gram")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    sizes.join(overlap, Seq(idCol))
      .filter(col("n_overlap") >= minOverlap)
      .withColumn("overlap_frac",
        round(col("n_overlap").cast("double") / col("n_grams"), 6))
  }

  /** Bloom-filter decontamination — the zero-shuffle prefilter variant of
    * [[decontaminate]]. The benchmark's gram set is folded into ONE bloom
    * filter binary (driver-materialized scalar, shipped as a literal); the
    * corpus side then probes it as a plain projection-side predicate — no
    * broadcast table, no join, no corpus shuffle at all for the ~99% of
    * grams the bloom rejects. Survivors (true overlaps + bloom false
    * positives) go through the exact broadcast join, so the OUTPUT is
    * bit-identical to the exact variant: the bloom only prunes work, never
    * changes results. This is Spark's own runtime-filter machinery
    * (BloomFilterAggregate / BloomFilterMightContain) driven explicitly;
    * the same expressions are SQL-registered as `graft_bloom_agg` /
    * `graft_might_contain` for `spark.sql` users. */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         textCol: String, idCol: String, n: Int = 3,
                         minOverlap: Int = 1,
                         expectedBenchGrams: Long = 4L * 1000 * 1000):
      DataFrame = {
    def postings(df: DataFrame) = df.select(col(idCol),
        explode(graft.functions.wordNgrams(col(textCol), n)).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
    // persist: corpus postings feed the per-doc sizes AND the probe side.
    // Cache contract matches graft.ops.Dedup: the caller/harness releases
    // caches once the result is consumed (Bench/Verify clearCache per
    // query) — the returned frame is lazy, so the operator itself cannot.
    val corpusGrams = postings(corpus).persist()
    val benchGrams = postings(benchmark).select("gram_h").distinct()
    // The ONE bloom binary materializes on the driver (a scalar, sized by
    // expectedBenchGrams — undersizing saturates the filter and turns the
    // probe into a pass-through) and ships as a literal: exactly what a
    // scalar subquery does internally, without mutating the session with
    // temp views or parsing identifier strings into SQL.
    val bloomBytes = benchGrams
      .agg(graft.functions.bloomAgg(col("gram_h"), expectedBenchGrams)
        .as("bf"))
      .head.getAs[Array[Byte]]("bf")
    val prefiltered = corpusGrams.filter(
      graft.functions.mightContain(lit(bloomBytes), col("gram_h")))
    val sizes = corpusGrams.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"))
    val overlap = prefiltered.join(broadcast(benchGrams), "gram_h")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_overlap"))
    sizes.join(overlap, Seq(idCol))
      .filter(col("n_overlap") >= minOverlap)
      .withColumn("overlap_frac",
        round(col("n_overlap").cast("double") / col("n_grams"), 6))
  }

  // ---------------------------------------------------------------- q50
  /** PII scrub over the documents corpus. */
  def q50PiiScrub(spark: SparkSession, dir: String): DataFrame =
    scrubPii(t(spark, dir, "documents").select(col("doc_id"), col("text")),
        "text")
      .select("doc_id", "clean_text", "n_url", "n_email", "n_phone")
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q51
  /** Repetition statistics per document. */
  def q51Repetition(spark: SparkSession, dir: String): DataFrame =
    repetitionStats(t(spark, dir, "documents")
        .select(col("doc_id"), col("text")), "text")
      .select("doc_id", "n_toks", "ttr", "dup_bigram_ratio")
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q52
  /** Content-hash split assignment per document. */
  def q52HashSplit(spark: SparkSession, dir: String): DataFrame =
    hashSplit(t(spark, dir, "documents")
        .select(col("doc_id"), col("lang"), col("text")), "text")
      .select("doc_id", "lang", "split")
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q53
  /** Sequence packing at a 2048-token budget in doc_id order. */
  def q53PackSequences(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"),
        Text.tokenCountBpe(col("text")).cast("long").as("n_tokens"))
    packSequences(toks, "doc_id", "n_tokens", budget = 2048)
      .select("doc_id", "n_tokens", "cum_tokens", "shard")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q54
  /** Decontamination of the corpus against a pseudo-benchmark (every
    * 101st document), flagging ≥3 shared distinct trigrams. String grams
    * here so the oracle mirrors the join exactly; production uses the
    * hashed variant (same counts, 8-byte join keys). */
  def q54Decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    decontaminate(
        docs.filter(col("doc_id") % 101 =!= 0),
        docs.filter(col("doc_id") % 101 === 0),
        "text", "doc_id", n = 3, minOverlap = 3, hashGrams = false)
      .select("doc_id", "n_grams", "n_overlap", "overlap_frac")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q55
  /** Dedup cluster resolution: exact n-gram-Jaccard near-dup pairs
    * (jaccard ≥ 0.05, same contract as q33) → connected components →
    * (doc_id, cluster_root) with the smallest id as the canonical keeper. */
  def q55DedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = Dedup.ngramJaccardPairs(
      t(spark, dir, "documents"), "text", "doc_id", n = 3, minJaccard = 0.05)
    Dedup.connectedComponents(pairs)
      .select(col("id").as("doc_id"), col("cluster_root"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q156
  /** Dedup-cluster survivorship by QUALITY: within every near-dup
    * cluster keep the longest member (ties → smallest id) instead of
    * [[Dedup.connectedComponents]]'s min-id root — the policy real
    * pipelines want, since the canonical copy should be the best one,
    * not the first-crawled one. Same cluster machinery as q55; the
    * survivor election is ONE per-cluster struct-min aggregate
    * (lexicographic (−length, id) — map-side combinable, no window),
    * then a cluster-keyed join back. */
  def q156ClusterSurvivor(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.05)
    val cl = Dedup.connectedComponents(pairs)
    val sized = cl.join(
      docs.select(col("doc_id").as("id"), col("n_chars")), "id")
    val surv = sized.groupBy(col("cluster_root"))
      .agg(min(struct((-col("n_chars")).as("neg"),
        col("id").as("sid"))).as("s"))
      .select(col("cluster_root"), col("s.sid").as("survivor_id"))
    sized.join(surv, "cluster_root")
      .select(col("id").as("doc_id"), col("cluster_root"),
        col("survivor_id"), (col("id") === col("survivor_id")).as("keep"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q159
  /** Cross-source duplication leakage: near-dup PAIRS aggregated by
    * (source, source) — which domains copy each other. Read next to
    * q144's vocabulary overlap: that says sources LOOK alike, this says
    * they literally share documents, the signal that decides whether a
    * dedup pass must run across source boundaries (expensive) or within
    * them (cheap). Pair detection is q33's exact inverted-index Jaccard
    * join; the rollup joins each pair to the two docs' sources (id-keyed
    * joins, pair-count-sized) and normalizes the pair with
    * least/greatest so the matrix is upper-triangular. */
  def q159SourceLeakage(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.05)
    pairs
      .join(src.withColumnRenamed("doc_id", "id_a")
        .withColumnRenamed("source", "src_a"), "id_a")
      .join(src.withColumnRenamed("doc_id", "id_b")
        .withColumnRenamed("source", "src_b"), "id_b")
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .groupBy(col("source_lo"), col("source_hi"))
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("source_lo", "source_hi")
  }

  // --------------------------------------------------------------- q160
  /** Leakage-safe train/val/test split: the split key is the near-dup
    * CLUSTER, not the document — so a document and its near-duplicates
    * can never straddle train and test (the eval-contamination failure
    * mode of per-doc hashing, q52). Cluster membership is q55's
    * components; unclustered docs are their own cluster. The assignment
    * reuses q52's md5-prefix rule ('e' → val, 'f' → test, else train —
    * deterministic, ~14/1/1) keyed on the cluster root.
    *
    * Scale shape: the split itself adds ONE id-keyed left join and a
    * map-side hash to the cluster pass — the cluster computation is the
    * whole cost, and a pipeline that already deduped has those
    * components on hand. */
  def q160ClusterSplit(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.05)
    val clusters = Dedup.connectedComponents(pairs)
    val keyed = docs.select(col("doc_id"))
      .join(clusters, col("doc_id") === col("id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_root"), col("doc_id")).as("cluster_root"))
    val h = substring(md5(concat(lit("cluster:"), col("cluster_root"))),
      1, 1)
    keyed.withColumn("split",
        when(h === "e", "val").when(h === "f", "test").otherwise("train"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q161
  /** Pipeline yield funnel: per source, how many documents survive each
    * curation stage — raw → C4 quality rules → token-set dedup →
    * per-domain cap — the accounting table a data team reads to see
    * WHERE a source's mass disappears (quality-filtered? duplicated?
    * capped?). Stages compose the exact operators they audit (q143,
    * q152, q147) on their real semantics: the cap draws from the
    * quality+dedup SURVIVORS, as the production pipeline would.
    *
    * Scale shape: each stage is its own already-scale-shaped pass; the
    * funnel adds only id-keyed joins of (doc_id, flag) frames and one
    * per-source conditional aggregate. */
  def q161PipelineYield(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val quality = c4QualityFilter(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep").as("q_keep"))
    val dedup = tokenSetDedup(docs, "doc_id", "text")
      .select(col("doc_id"), col("keep").as("d_keep"))
    val flags = docs.select(col("doc_id"), col("source"))
      .join(quality, "doc_id").join(dedup, "doc_id")
    val survivors = docs
      .join(flags.filter(col("q_keep") && col("d_keep"))
        .select(col("doc_id")), "doc_id")
    val capped = capPerDomain(survivors, "source", "doc_id", "text", 10)
      .select(col("doc_id"), lit(true).as("c_keep"))
    flags.join(capped, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_total"),
        count(when(col("q_keep"), 1)).as("n_quality"),
        count(when(col("q_keep") && col("d_keep"), 1)).as("n_dedup"),
        count(when(col("c_keep"), 1)).as("n_final"))
      .orderBy("source")
  }

  // --------------------------------------------------------------- q164
  /** Weighted sample WITHOUT replacement, fixed size k — the
    * Efraimidis–Spirakis one-pass scheme (Inf. Proc. Letters 97(5),
    * 2006, public algorithm): each row draws priority u^(1/w) from a
    * uniform u and weight w, and the k highest priorities ARE a weighted
    * sample without replacement. Complements q108 (Bernoulli by weight:
    * random SIZE) and q56 (per-stratum rates): this pins the exact
    * sample size under weights in one distributed pass.
    *
    * Determinism + scale: u derives from a 52-bit md5 slice of the
    * content (+id salt) — the q52/q147 digest idiom, so the "random"
    * draw is reproducible in any engine; comparisons use ln(u)/w
    * (monotone in u^(1/w), no overflow); top-k fuses to
    * TakeOrderedAndProject (per-partition heaps — never a global sort);
    * priorities round to 9 dp only for OUTPUT, after selection. */
  def weightedSample(docs: DataFrame, idCol: String, textCol: String,
                     weightCol: String, k: Int): DataFrame = {
    val h = md5(concat(col(textCol), lit(":"), col(idCol)))
    val u = (conv(substring(h, 1, 13), 16, 10).cast("long") + 1)
      .cast("double") / lit(4503599627370496.0) // 2^52
    val key = log(u) / col(weightCol).cast("double")
    docs.select(col(idCol), col(weightCol).as("weight"),
        key.as("priority"))
      .orderBy(col("priority").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("weight"), round(col("priority"), 9)
        .as("priority"))
  }

  /** q164 entry: 100 docs weighted by length. */
  def q164WeightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSample(t(spark, dir, "documents"), "doc_id", "text",
        "n_chars", 100)
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q56
  /** Language rebalancing: keep 25% of English, all of everything else,
    * selected deterministically by content hash. */
  def q56StratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(
        t(spark, dir, "documents").select(col("doc_id"), col("lang"),
          col("text")),
        "text", "lang", rates = Map("en" -> 0.25))
      .select("doc_id", "lang")
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q57
  /** Priority mix: the curated English subset (priority 0) over the full
    * corpus (priority 1); distinct contents keep their highest-priority
    * copy. */
  def q57CorpusMix(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    mixWithPriority(
        Seq(docs.filter(col("lang") === "en"), docs), "text", "doc_id")
      .select(col("doc_id"), col("src"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q206
  /** Token-budget waterfilling across corpus groups — the mixing-weight
    * SOLVER the q57/q147 family assumes someone already ran: given a
    * total token budget B, allocate tokens to maximize balance across
    * groups subject to per-group availability. The optimum is the
    * classic waterfill: a level λ with every group allocated
    * min(available, λ) and Σ allocations = B — small groups keep
    * everything ("saturated"), dominant groups are levelled down. This
    * is exactly how a multilingual corpus caps its English share under
    * a budget.
    *
    * All-integer arithmetic, closed form (no iterative solve): groups
    * sorted by availability ascending; the boundary is the first rank j
    * where prefix(j−1) + available(j)·(n−j+1) ≥ B; groups below it keep
    * everything, the rest split the remaining budget evenly with the
    * ⌊R/m⌋ remainder going one token each to the smallest groups.
    * Σ allocated = min(B, Σ available) exactly.
    *
    * Scale shape: one map-side-combined token-count aggregate over the
    * corpus (the only data-sized pass), then windows over the POST-AGG
    * frame — one row per group, dimension-sized by contract (languages,
    * sources, domains after q147 capping). Budget is a num/den fraction
    * of total supply so the same call is scale-free. */
  def waterfillBudget(docs: DataFrame, groupCol: String, tokens: Column,
                      budgetNum: Long, budgetDen: Long): DataFrame = {
    val caps = docs.groupBy(col(groupCol))
      .agg(sum(tokens).cast("long").as("available"))
    val ord = Window.orderBy(col("available").asc, col(groupCol).asc)
    val all = Window.partitionBy()
    caps
      .withColumn("rn", row_number().over(ord).cast("long"))
      .withColumn("n_groups", count(lit(1)).over(all))
      .withColumn("cum_before", coalesce(
        sum(col("available")).over(
          ord.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("total", sum(col("available")).over(all))
      .withColumn("budget",
        expr(s"(total * ${budgetNum}L) DIV ${budgetDen}L"))
      .withColumn("cand",
        col("cum_before") +
          col("available") * (col("n_groups") - col("rn") + 1) >=
          col("budget"))
      .withColumn("boundary_rn",
        min(when(col("cand"), col("rn"))).over(all))
      .withColumn("cum_b",
        max(when(col("rn") === col("boundary_rn"), col("cum_before")))
          .over(all))
      .withColumn("m_b", col("n_groups") - col("boundary_rn") + 1)
      .withColumn("base", expr("(budget - cum_b) DIV m_b"))
      .withColumn("bonus",
        when(col("rn") - col("boundary_rn") <
          (col("budget") - col("cum_b")) % col("m_b"), 1L).otherwise(0L))
      .withColumn("allocated",
        when(col("boundary_rn").isNull || col("rn") < col("boundary_rn"),
          col("available"))
          .otherwise(col("base") + col("bonus")))
      // "kept everything" — incl. a boundary group whose levelled share
      // happens to equal its availability (budget = total supply edge)
      .select(col(groupCol), col("available"), col("allocated"),
        (col("allocated") === col("available")).as("saturated"))
  }

  /** q206 entry: waterfill a ⌊4/5·total⌋ token budget across languages —
    * the four minor languages saturate (kept whole), English is levelled
    * down to fund them. */
  def q206TokenWaterfill(spark: SparkSession, dir: String): DataFrame =
    waterfillBudget(t(spark, dir, "documents"), "lang",
        size(graft.functions.wordTokens(col("text"))).cast("long"),
        budgetNum = 4L, budgetDen = 5L)
      .orderBy("lang")

  // --------------------------------------------------------------- q212
  /** Temperature-scaled sampling weights across corpus groups — the
    * multilingual mixing rule (Arivazhagan et al. 2019 §5; XLM-R,
    * Conneau et al. ACL 2020): sample group g with probability
    * ∝ n_g^α, α < 1 flattening the natural distribution so
    * low-resource groups are up-sampled without the budget cliff of a
    * hard cap (q147) or full levelling (q206's waterfill). α is FIXED
    * at 1/2: `sqrt` is correctly rounded under IEEE 754 (unlike `pow`),
    * so the weights are bit-identical cross-engine by construction —
    * the same reasoning that pins q131's k1/b to binary-exact values.
    *
    * Determinism recipe: each √n_g rounds to DECIMAL(28,12) before the
    * order-free exact sum (q204's entropy-term precedent); every
    * division then sees identical operands on both engines. Output per
    * group: raw tokens, normalized weight, the ⌊B·w⌋ token allocation
    * under a budget B, and the up/down-sampling factor relative to the
    * natural share (factor > 1 = up-sampled).
    *
    * Scale shape: identical to q206 — ONE map-side-combined token
    * aggregate is the only corpus-sized pass; everything after runs on
    * the dimension-sized group frame. */
  def temperatureMix(docs: DataFrame, groupCol: String, tokens: Column,
                     budget: Long): DataFrame = {
    val all = Window.partitionBy()
    docs.groupBy(col(groupCol))
      .agg(sum(tokens).cast("long").as("n_tokens"))
      .withColumn("w", sqrt(col("n_tokens").cast("double")))
      .withColumn("wsum",
        sum(col("w").cast("decimal(28,12)")).over(all).cast("double"))
      .withColumn("total", sum(col("n_tokens")).over(all))
      .select(col(groupCol), col("n_tokens"),
        round(col("w") / col("wsum"), 6).as("weight"),
        floor(lit(budget) * col("w") / col("wsum")).cast("long")
          .as("alloc_tokens"),
        round(col("w") / col("wsum") * col("total").cast("double") /
          col("n_tokens").cast("double"), 6).as("sampling_factor"))
      .orderBy(groupCol)
  }

  /** q212 entry: α=1/2 temperature mix over languages at a 1M-token
    * budget — minor languages up-sampled (factor > 1), the dominant one
    * down-sampled, no group zeroed. */
  def q212TemperatureMix(spark: SparkSession, dir: String): DataFrame =
    temperatureMix(t(spark, dir, "documents"), "lang",
      size(graft.functions.wordTokens(col("text"))).cast("long"),
      budget = 1000000L)

  // --------------------------------------------------------------- q220
  /** Append the deterministic shard key: h = md5(seed ':' id), shard =
    * (first `hexDigits` hex chars of h) mod nShards. Re-keying the seed
    * ("epoch-0", "epoch-1", …) yields an independent assignment with
    * zero state — the reproducible-shuffle recipe every dataloader
    * replays. hexDigits bounds the shard space: 2 covers 256 shards (and
    * keeps the oracle's nibble arithmetic builtin-free), 8 covers 2³². */
  private def withShard(docs: DataFrame, idCol: String, seed: String,
                        nShards: Int, hexDigits: Int): DataFrame = {
    require(nShards > 0 && hexDigits >= 1 && hexDigits <= 15,
      s"withShard: need nShards>0 and 1<=hexDigits<=15, got " +
        s"nShards=$nShards hexDigits=$hexDigits")
    require(BigInt(16).pow(hexDigits) >= BigInt(nShards) * 4,
      s"withShard: $hexDigits hex digits cannot spread $nShards shards " +
        "evenly (need >=4x headroom so the mod bias stays negligible)")
    docs
      .withColumn("h",
        md5(concat_ws(":", lit(seed), col(idCol).cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("h"), 1, hexDigits), 16, 10).cast("long"),
          lit(nShards.toLong)))
  }

  /** Deterministic epoch shuffle: the (shard, position) training order a
    * dataloader replays for one epoch of a fixed corpus snapshot.
    * Position is the rank of the doc's md5 within its shard (id
    * tiebreak against hash collisions), so the full order is a pure
    * function of (corpus, seed) — rerunning the job, or running it on a
    * different cluster, yields byte-identical training order, which is
    * what makes loss curves comparable across infra changes.
    *
    * Scale shape: one hash projection + ONE shuffle on shard; the
    * per-shard rank sort is bounded by the shard size, so production
    * sizes nShards ≈ ⌈corpus bytes / 256 MB⌉ (every rank sort fits a
    * task) and widens hexDigits accordingly. Never a GLOBAL sort:
    * samplers walk shards round-robin, so no cross-shard total order is
    * ever materialized — the property that keeps this 100 TB-safe. */
  def epochShuffle(docs: DataFrame, idCol: String, seed: String,
                   nShards: Int, hexDigits: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("h"), col(idCol))
    withShard(docs.select(col(idCol)), idCol, seed, nShards, hexDigits)
      .withColumn("pos", row_number().over(w).cast("long"))
      .select(col(idCol), col("shard"), col("pos"))
  }

  /** q220 entry: epoch-0 order of the documents corpus over 64 shards,
    * 2-hex-digit shard hash (oracle replays the nibble arithmetic). */
  def q220EpochShuffle(spark: SparkSession, dir: String): DataFrame =
    epochShuffle(t(spark, dir, "documents"), "doc_id", "epoch-0",
        nShards = 64, hexDigits = 2)
      .orderBy("shard", "pos")

  // --------------------------------------------------------------- q224
  /** Dataloader shard manifest for the q220 epoch order: per shard, the
    * document count, token count, the global token OFFSET at which the
    * shard starts (cumulative tokens of all lower shards — the index a
    * training job seeks by without scanning predecessors), and the
    * token-balance factor vs the mean shard (balance ≫ 1 ⇒ straggler
    * shards; md5 sharding keeps it near 1 by construction).
    *
    * Scale shape: the only corpus-sized pass is one fused-tokenize
    * projection into the shard aggregate (map-side combined, no q220
    * rank sort — the manifest needs sizes, not positions); the
    * cumulative offset and balance run on the nShards-row dimension
    * frame. */
  def shardManifest(docs: DataFrame, idCol: String, textCol: String,
                    seed: String, nShards: Int,
                    hexDigits: Int = 8): DataFrame = {
    val per = withShard(
        docs.select(col(idCol),
          size(graft.functions.wordTokens(col(textCol))).cast("long")
            .as("n_tok")),
        idCol, seed, nShards, hexDigits)
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"))
    val prev = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy()
    per
      .withColumn("token_offset",
        coalesce(sum(col("n_tokens")).over(prev), lit(0L)))
      .withColumn("total", sum(col("n_tokens")).over(all))
      .select(col("shard"), col("n_docs"), col("n_tokens"),
        col("token_offset"),
        round(col("n_tokens").cast("double") * lit(nShards.toDouble) /
          col("total").cast("double"), 6).as("balance"))
      .orderBy("shard")
  }

  /** q224 entry: the manifest of q220's epoch-0 order (same seed/shard
    * parameters, so offsets line up with q220's positions). */
  def q224ShardManifest(spark: SparkSession, dir: String): DataFrame =
    shardManifest(t(spark, dir, "documents"), "doc_id", "text", "epoch-0",
      nShards = 64, hexDigits = 2)

  // --------------------------------------------------------------- q222
  /** Heaps-law vocabulary growth audit per source: cumulative-vocabulary
    * checkpoints V(N) and the fitted log-log slope β (V ≈ K·N^β, Heaps
    * 1978) — the curve that says whether more data from a source still
    * buys new vocabulary or has gone repetitive (β → 0), i.e. the
    * data-selection signal behind "does another snapshot of this crawl
    * still help the tokenizer/LM".
    *
    * Checkpoints are the interior deciles of the source's doc-id
    * distribution as EXACT type-7 interpolated percentiles rounded 6dp
    * (q119's boundary recipe — per-source aggregate state is 9 doubles
    * after map-side partials, never a rank window), k=10 boundary = max
    * id. A doc is inside checkpoint k iff id ≤ boundary_k; a token's
    * first appearance is ONE min-aggregate per (source, token); both
    * cumulative counts are ≤-joins against the BROADCAST 10-row-per-
    * source boundary frame. β per source is least squares over the 10
    * (ln N_k, ln V_k) points — each ln term and product cast to
    * DECIMAL(28,12) before the order-free exact sums (q212's recipe),
    * double arithmetic only on the identical-by-construction sums,
    * round 6 last. */
  def heapsLaw(docs: DataFrame, textCol: String, srcCol: String,
               idCol: String): DataFrame = {
    val qs = (1 to 9).map(_ / 10.0).mkString("array(", ",", ")")
    // localCheckpoint (q133's precedent): the 10-rows-per-source boundary
    // frame feeds BOTH <=-joins; without it each join re-runs the corpus
    // percentile pass
    val bounds = docs.groupBy(col(srcCol))
      .agg(expr(s"transform(percentile(cast($idCol as double), $qs), " +
        "b -> round(b, 6))").as("bs"),
        max(col(idCol)).cast("double").as("bmax"))
      .select(col(srcCol),
        posexplode(concat(col("bs"), array(col("bmax")))))
      .select(col(srcCol), (col("pos") + 1).cast("long").as("k"),
        col("col").as("boundary"))
      .localCheckpoint(true)
    val docTok = docs.select(col(srcCol), col(idCol),
      graft.functions.wordTokens(col(textCol)).as("tk"))
    val docsCum = docTok
      .select(col(srcCol), col(idCol), size(col("tk")).cast("long")
        .as("n_tok"))
      .join(broadcast(bounds), Seq(srcCol))
      .filter(col(idCol) <= col("boundary"))
      .groupBy(col(srcCol), col("k"))
      .agg(count(lit(1)).as("docs_cum"), sum(col("n_tok")).as("tokens_cum"))
    val vocabCum = docTok
      .select(col(srcCol), col(idCol), explode(col("tk")).as("tok"))
      .groupBy(col(srcCol), col("tok"))
      .agg(min(col(idCol)).as("first_id"))
      .join(broadcast(bounds), Seq(srcCol))
      .filter(col("first_id") <= col("boundary"))
      .groupBy(col(srcCol), col("k"))
      .agg(count(lit(1)).as("vocab_cum"))
    // the fit runs as window aggregates over the 10-points-per-source
    // frame (bounded by the checkpoint count, never corpus-sized) — a
    // groupBy+rejoin would re-evaluate the whole pts subtree twice
    val byS = Window.partitionBy(col(srcCol))
    docsCum.join(vocabCum, Seq(srcCol, "k"))
      .withColumn("x", log(col("tokens_cum").cast("double")))
      .withColumn("y", log(col("vocab_cum").cast("double")))
      .withColumn("n", count(lit(1)).over(byS).cast("double"))
      .withColumn("sx",
        sum(col("x").cast("decimal(28,12)")).over(byS).cast("double"))
      .withColumn("sy",
        sum(col("y").cast("decimal(28,12)")).over(byS).cast("double"))
      .withColumn("sxy",
        sum((col("x") * col("y")).cast("decimal(28,12)")).over(byS)
          .cast("double"))
      .withColumn("sxx",
        sum((col("x") * col("x")).cast("decimal(28,12)")).over(byS)
          .cast("double"))
      .select(col(srcCol).as("source"), col("k"), col("docs_cum"),
        col("tokens_cum"), col("vocab_cum"),
        round((col("n") * col("sxy") - col("sx") * col("sy")) /
          (col("n") * col("sxx") - col("sx") * col("sx")), 6)
          .as("heaps_beta"))
      .orderBy("source", "k")
  }

  /** q222 entry: per-source Heaps curve at decile checkpoints over the
    * documents corpus. */
  def q222HeapsLaw(spark: SparkSession, dir: String): DataFrame =
    heapsLaw(t(spark, dir, "documents"), "text", "source", "doc_id")

  // --------------------------------------------------------------- q223
  /** Tokenizer character-coverage audit per language (SentencePiece's
    * --character_coverage knob): how many distinct characters a
    * vocabulary must include to cover 99.9% of character occurrences,
    * and what the top 32 characters already cover — the numbers that
    * size a char/byte fallback alphabet before a tokenizer fit (q202's
    * BPE) and flag scripts the corpus barely contains.
    *
    * The rank window runs on the (lang, char) FREQUENCY frame —
    * alphabet-sized, bounded by the script, never corpus-sized; the
    * only corpus pass is the char-explode aggregate (map-side
    * combined). The coverage threshold compares 1000·cum ≥ 999·total in
    * exact longs — no float boundary. Characters are UTF-16 code units
    * engine-side and codepoints oracle-side; identical outside the
    * astral planes (none in any script this measures). */
  def charCoverage(docs: DataFrame, textCol: String, langCol: String)
      : DataFrame = {
    val freq = docs
      .select(col(langCol).as("lang"),
        explode(split(col(textCol), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .groupBy(col("lang"), col("ch"))
      .agg(count(lit(1)).as("c"))
    val byLang = Window.partitionBy(col("lang"))
    val w = byLang.orderBy(col("c").desc, col("ch"))
    freq
      .withColumn("r", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("c")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("c")).over(byLang))
      .groupBy(col("lang"))
      .agg(max(col("total")).as("total_chars"),
        max(col("r")).as("distinct_chars"),
        min(when(col("cum") * 1000L >= col("total") * 999L, col("r")))
          .as("chars_cover_999"),
        round(coalesce(max(when(col("r") === 32L, col("cum"))),
            max(col("total"))).cast("double") /
          max(col("total")).cast("double"), 6).as("coverage_top32"))
      .orderBy("lang")
  }

  /** q223 entry: per-language character coverage of the documents
    * corpus. */
  def q223CharCoverage(spark: SparkSession, dir: String): DataFrame =
    charCoverage(t(spark, dir, "documents"), "text", "lang")

  // --------------------------------------------------------------- q225
  /** Packing audit: the split-vs-pad tradeoff at candidate context
    * lengths. GPT-style stream packing (concat in order, cut every L
    * tokens — q53's layout) wastes zero padding but SPLITS documents at
    * sequence boundaries; one-doc-per-sequence padding never splits but
    * wastes L−(n mod L) per document. For each candidate L this emits
    * both costs — the numbers that pick a training run's context length
    * and decide whether cross-document attention masking is needed.
    *
    * All-integer off ONE cumulative layout pass: a document occupying
    * token interval [cum−n, cum) splits ⌊(cum−1) div L⌋ −
    * ⌊(cum−n) div L⌋ times; no-pack padding waste is L·⌈n/L⌉ − n. Every
    * candidate L profiles in the SAME scan via a stacked explode (q190's
    * all-candidates-one-pass shape). The layout window carries q53's
    * scale contract: a single global running sum is one
    * range-partitioned window — pass `groupCol` there to pack (and
    * audit) independently per group at 100 TB. */
  def packingAudit(toks: DataFrame, idCol: String, tokCol: String,
                   lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty && lengths.forall(_ > 0),
      s"packingAudit: positive candidate lengths required, got $lengths")
    val w = Window.orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks.filter(col(tokCol) > 0)
      .withColumn("cum", sum(col(tokCol)).over(w))
      .select(col(tokCol).cast("long").as("n"), col("cum"),
        explode(array(lengths.map(l => lit(l.toLong)): _*)).as("len"))
      .groupBy(col("len"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        sum(when(expr("(cum - 1) div len") =!= expr("(cum - n) div len"),
          lit(1L)).otherwise(lit(0L))).as("split_docs"),
        sum(expr("(cum - 1) div len") - expr("(cum - n) div len"))
          .as("boundary_crossings"),
        sum(expr("len * ((n + len - 1) div len) - n")).as("pad_waste"))
      .select(col("len"), col("n_docs"), col("total_tokens"),
        expr("(total_tokens + len - 1) div len").as("n_seq_packed"),
        col("split_docs"),
        round(col("split_docs").cast("double") /
          col("n_docs").cast("double"), 6).as("frac_docs_split"),
        col("boundary_crossings"), col("pad_waste"),
        round(col("pad_waste").cast("double") /
          (col("pad_waste") + col("total_tokens")).cast("double"), 6)
          .as("pad_waste_frac"))
      .orderBy("len")
  }

  /** q225 entry: audit of q53's BPE-ish token layout at context lengths
    * 512 / 1024 / 2048. */
  def q225PackingAudit(spark: SparkSession, dir: String): DataFrame =
    packingAudit(
      t(spark, dir, "documents").select(col("doc_id"),
        Text.tokenCountBpe(col("text")).cast("long").as("n_tokens")),
      "doc_id", "n_tokens", Seq(512, 1024, 2048))

  // --------------------------------------------------------------- q226
  /** Per-benchmark-item contamination report — q54 flipped to the eval
    * side: for every benchmark document, HOW MANY corpus documents leak
    * into it (share ≥ minOverlap distinct n-gram shingles), the worst
    * overlap, and the top offender (ties to the smaller corpus id via
    * q86's min-struct argmax, no window). q54 answers "which training
    * docs must go"; this answers "which eval items are compromised and
    * by what" — the report an eval owner signs off on.
    *
    * Scale shape: the benchmark side is small by definition and its
    * gram set BROADCASTS into the corpus gram scan; candidate volume is
    * corpus-gram matches × benchmark df, never corpus². n = 5 keeps
    * boilerplate grams out of the index (longer shingles are rarer —
    * the GPT-3 13-gram-decontamination rationale at this corpus's
    * document length). Clean items stay in the report with zero
    * offenders (left join from the benchmark id frame). */
  def contaminationReport(corpus: DataFrame, bench: DataFrame,
                          textCol: String, idCol: String, n: Int = 5,
                          minOverlap: Int = 2): DataFrame = {
    val cg = Dedup.shingles(corpus, textCol, n)
      .select(col(idCol).as("corpus_id"), explode(col("shingles")).as("gram"))
    val bg = Dedup.shingles(bench, textCol, n)
      .select(col(idCol).as("bench_id"), explode(col("shingles")).as("gram"))
    val offenders = cg.join(broadcast(bg), "gram")
      .groupBy(col("bench_id"), col("corpus_id"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minOverlap)
      .groupBy(col("bench_id"))
      .agg(count(lit(1)).as("n_offenders"),
        max(col("shared")).as("max_shared"),
        min(struct((-col("shared")).as("ns"),
          col("corpus_id").as("cid"))).as("m"))
      .select(col("bench_id"), col("n_offenders"), col("max_shared"),
        col("m.cid").as("top_offender"))
    bench.select(col(idCol).as("bench_id"))
      .join(offenders, Seq("bench_id"), "left")
      .select(col("bench_id"),
        coalesce(col("n_offenders"), lit(0L)).as("n_offenders"),
        col("max_shared"), col("top_offender"))
      .orderBy("bench_id")
  }

  /** q226 entry: a FIXED-SIZE pseudo-benchmark — every 101st document
    * below id 5050 (≤ 50 items at any scale, q216's fixed-probe
    * contract) — so the broadcast gram set honors the function's
    * small-by-definition benchmark assumption instead of growing with
    * the corpus; everything else is the corpus side. */
  def q226ContaminationReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    val isBench = col("doc_id") % 101 === 0 && col("doc_id") < 5050L
    contaminationReport(docs.filter(!isBench), docs.filter(isBench),
      "text", "doc_id")
  }

  // ---------------------------------------------------------------- q63
  /** Bloom-prefiltered decontamination against a pseudo-benchmark (every
    * 97th document), bigrams, ≥5 shared. Output is exactly the exact-join
    * result (the bloom is a pruning device), so the oracle is the plain
    * relational formulation. */
  def q63BloomDecontaminate(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents").select(col("doc_id"), col("text"))
    decontaminateBloom(
        docs.filter(col("doc_id") % 97 =!= 0),
        docs.filter(col("doc_id") % 97 === 0),
        "text", "doc_id", n = 2, minOverlap = 5,
        // capacity sized for this corpus's bench split: the bloom binary
        // ships with every stage, so a production-sized (4M-item, ~4MB)
        // filter over a ~15k-gram benchmark is pure task-serialization tax
        expectedBenchGrams = 1L << 17)
      .select("doc_id", "n_grams", "n_overlap", "overlap_frac")
      .orderBy("doc_id")
  }

  /** Context-window chunking: split each document into overlapping
    * `size`-token windows every `stride` tokens — the document → model-
    * context preparation step of training and retrieval pipelines (overlap
    * keeps boundary context in at least one chunk). One fused scan per
    * document ([[graft.functions.WordChunks]]) then a generate — output
    * scales as len/stride rows per doc with no shuffle at all. */
  def chunkDocuments(df: DataFrame, textCol: String, idCol: String,
                     size: Int, stride: Int): DataFrame =
    df.select(col(idCol),
        posexplode(graft.functions.wordChunks(col(textCol), size, stride))
          .as(Seq("chunk_idx", "chunk_text")))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        col("chunk_text"))

  // ---------------------------------------------------------------- q139
  /** Tokenize-to-ids encoding — the literal last step of a training-data
    * pipeline: fit a top-K vocabulary over the corpus (total occurrence
    * count, ties by token — the q116/q126 fit recipe), then encode every
    * document as its id sequence, OOV → 0. Downstream this frame feeds
    * q53's sequence packing; together they take raw text to packed
    * training shards.
    *
    * Scale shape: the fit is one token-count aggregate with a fused
    * top-K head and a K-row collect (the standard KB fitted-model
    * pattern); the encode pass bakes the vocabulary into the plan as a
    * fitted-model expression ([[graft.functions.VocabEncode]] — one O(1)
    * hash probe per token; the literal-map `element_at` form this
    * replaced pays an O(K) ArrayBasedMapData scan per token, every miss
    * the full K, measured 1.6× the whole query at the sf1 tier) — one
    * corpus scan, zero joins, zero shuffles beyond the output sort,
    * embarrassingly parallel at any corpus size. */
  def encodeIds(docs: DataFrame, textCol: String, idCol: String,
                vocabSize: Int = 256): DataFrame = {
    val fitted = docs
      .select(explode(graft.functions.wordTokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(vocabSize)
      .collect().map(_.getString(0))
    val vocab = fitted.zipWithIndex
      .map { case (t, i) => t -> (i + 1L) }.toMap
    val toks = col("toks")
    docs
      .select(col(idCol), graft.functions.wordTokens(col(textCol)).as("toks"))
      .filter(size(toks) > 0)
      .select(col(idCol), size(toks).cast("long").as("n_tokens"),
        graft.functions.vocabEncode(toks, vocab).as("ids"))
      .orderBy(idCol)
  }

  /** q139 entry: 256-token vocabulary over the documents corpus. The id
    * sequence is emitted space-joined as a STRING — downstream
    * comparison tooling can sort/hash a scalar where a LIST column
    * cannot be lexsorted; the array form stays available via
    * [[encodeIds]]. */
  def q139EncodeIds(spark: SparkSession, dir: String): DataFrame =
    encodeIds(t(spark, dir, "documents"), "text", "doc_id")
      .withColumn("ids",
        array_join(transform(col("ids"), _.cast("string")), " "))

  // ---------------------------------------------------------------- q74
  /** 64-token chunks with a 32-token stride over the corpus. */
  def q74ChunkDocuments(spark: SparkSession, dir: String): DataFrame =
    chunkDocuments(t(spark, dir, "documents"), "text", "doc_id",
        size = 64, stride = 32)
      .orderBy("doc_id", "chunk_idx")

  // --------------------------------------------------------------- q143
  /** C4-style rule-based quality filter (Raffel et al., "Exploring the
    * Limits of Transfer Learning…", JMLR 2020 §2.2 — public cleaning
    * recipe, rules adapted to this corpus's single-line texts) with
    * PER-RULE accounting: every document gets one boolean per rule plus
    * the combined keep flag, so a pipeline can report exactly which rule
    * costs how much data — the filter-audit table every corpus-cleaning
    * run ships with.
    *
    * Rules (all thresholds compared in EXACT INTEGER arithmetic — the
    * ratio comparisons are cross-multiplied, so no float rounding can
    * disagree between engines):
    *   - too_short:  fewer than 30 word tokens;
    *   - word_len:   mean token length outside [3, 10] chars
    *                 (sum_len < 3·n or sum_len > 10·n);
    *   - repetition: most frequent token exceeds ⅛ of the document
    *                 (8·max_cnt > n);
    *   - stop_ratio: stopword share below 1% (100·stop_cnt < n) — the
    *                 "not natural prose" heuristic.
    *
    * Scale shape: ONE tokenize pass; per-(doc, token) counts combine
    * map-side, the doc-level rollup reduces token rows to one row per
    * document. Nothing document-sized shuffles twice and no window is
    * involved — embarrassingly parallel at any corpus size. */
  def c4QualityFilter(docs: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val stop = Seq("a", "the", "of", "and", "to", "in", "is", "it")
    val perTok = docs
      .select(col(idCol), explode(graft.functions.wordTokens(col(textCol)))
        .as("tok"))
      .groupBy(col(idCol), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val perDoc = perTok.groupBy(col(idCol))
      .agg(sum(col("cnt")).as("n_tokens"),
        sum(length(col("tok")) * col("cnt")).as("sum_len"),
        max(col("cnt")).as("max_cnt"),
        sum(when(col("tok").isin(stop: _*), col("cnt"))
          .otherwise(lit(0L))).as("stop_cnt"))
    perDoc.select(col(idCol), col("n_tokens"),
        (col("n_tokens") < 30).as("fail_short"),
        (col("sum_len") < col("n_tokens") * 3 ||
          col("sum_len") > col("n_tokens") * 10).as("fail_word_len"),
        (col("max_cnt") * 8 > col("n_tokens")).as("fail_repetition"),
        (col("stop_cnt") * 100 < col("n_tokens")).as("fail_stop_ratio"))
      .withColumn("keep",
        !col("fail_short") && !col("fail_word_len") &&
          !col("fail_repetition") && !col("fail_stop_ratio"))
  }

  /** q143 entry: the per-document filter-audit table over `documents`. */
  def q143C4Filter(spark: SparkSession, dir: String): DataFrame =
    c4QualityFilter(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  // --------------------------------------------------------------- q147
  /** Per-domain document cap — the "no domain may dominate the corpus"
    * guard every web-scale pipeline applies before mixing (boilerplate
    * farms and crawler traps produce millions of pages per host). Keeps
    * at most `cap` documents per group, chosen by smallest salted digest
    * (i.e. a deterministic uniform sample of each domain — the standard
    * policy, since "best by quality" is a separate ranked pass).
    *
    * Scale shape: the naive form is row_number() over a per-domain
    * window — a full sort of every domain's rows. Here the per-domain
    * selection threshold comes from [[graft.functions.KthSmallestStr]],
    * a bounded aggregate whose state is ≤cap digests per group no matter
    * how many pages the domain has: ONE map-side-combined aggregate pass
    * over digests, a broadcast of (domain → cutoff), and a map-side
    * `digest <= cutoff` filter. Nothing sorts, nothing document-sized
    * shuffles; a 10M-page domain costs the same tiny threshold state as
    * a 10-page one. The digest salts the text with the doc id, so
    * byte-identical pages (pre-dedup input) still draw distinct tickets
    * and the cap stays exact. */
  def capPerDomain(docs: DataFrame, groupCol: String, idCol: String,
                   textCol: String, cap: Int): DataFrame = {
    // "g" sorts after every lowercase-hex md5 digest → keep-all sentinel
    val kth = udaf(new graft.functions.KthSmallestStr(cap, "g"))
    val keyed = docs.select(col(groupCol), col(idCol),
      md5(concat(col(textCol), lit(":"), col(idCol))).as("ticket"))
    val cut = keyed.groupBy(col(groupCol)).agg(kth(col("ticket")).as("cut"))
    keyed.join(broadcast(cut), groupCol)
      .filter(col("ticket") <= col("cut"))
      .select(col(groupCol), col(idCol))
  }

  /** q147 entry: cap `documents` at 10 per source. */
  def q147SourceCap(spark: SparkSession, dir: String): DataFrame =
    capPerDomain(t(spark, dir, "documents"), "source", "doc_id", "text", 10)
      .orderBy("source", "doc_id")

  // --------------------------------------------------------------- q152
  /** Vocabulary-fingerprint dedup: documents collapse to the md5 of their
    * SORTED DISTINCT token set, so word order and token multiplicity are
    * invisible — the cheap exact-arithmetic cousin of MinHash that
    * catches shuffled/padded duplicates (template pages with reordered
    * boilerplate, docs differing only in word repetition) which raw
    * exact dedup (q22's byte-hash) misses entirely. A real pipeline runs
    * this between exact and fuzzy passes: it is exact set equality, so
    * unlike LSH there are no false positives to verify.
    *
    * Scale shape: identical to q22 — the tokenize+fingerprint fuses into
    * the scan (one pass over text), then only (doc_id, 32-byte digest)
    * pairs shuffle for the cluster aggregate and the rejoin; document
    * text never crosses the wire. Cluster stats combine map-side. */
  def tokenSetDedup(docs: DataFrame, idCol: String,
                    textCol: String): DataFrame = {
    val fp = docs.select(col(idCol),
      md5(array_join(array_sort(
        graft.functions.wordNgrams(col(textCol), 1)), " ")).as("fp"))
    val clusters = fp.groupBy(col("fp"))
      .agg(count(lit(1)).as("cluster_size"),
        min(col(idCol)).as("canonical_id"))
    fp.join(clusters, "fp")
      .select(col(idCol), col("cluster_size"),
        (col(idCol) === col("canonical_id")).as("keep"))
  }

  /** q152 entry: token-set fingerprint dedup over `documents`. */
  def q152TokensetDedup(spark: SparkSession, dir: String): DataFrame =
    tokenSetDedup(t(spark, dir, "documents"), "doc_id", "text")
      .orderBy("doc_id")

  // ------------------------------------------------------------ registry
  // --------------------------------------------------------------- q170
  /** Embargoed temporal split — the time-axis member of the split family
    * (content-hash q52, cluster-safe q160): train is everything strictly
    * before `cutoff`, test is everything from `cutoff + embargoDays` on,
    * and the embargo gap between them is DROPPED, so no test example
    * is temporally adjacent to a train example (the purged-split rule
    * that kills look-ahead leakage through lagged/rolling features whose
    * windows straddle the boundary). Output is the per-user audit: how
    * many of each user's events land in each zone, and whether the user
    * straddles the boundary at all (time splits intentionally allow
    * this — the audit makes the overlap measurable instead of silent).
    *
    * Scale shape: ONE conditional aggregate over the fact scan (the
    * three zone counters are sums of when()-flags — no triple scan, no
    * join); the boundary literals fold into the scan's pushed filters
    * when a caller splits rather than audits. */
  def embargoSplitAudit(events: DataFrame, cutoff: String,
                        embargoDays: Int): DataFrame = {
    val cut = lit(cutoff).cast("timestamp")
    val testStart = cut + expr(s"INTERVAL $embargoDays DAYS")
    events.groupBy(col("user_id"))
      .agg(
        sum(when(col("ts") < cut, 1L).otherwise(0L)).as("n_train"),
        sum(when(col("ts") >= cut && col("ts") < testStart, 1L)
          .otherwise(0L)).as("n_embargo"),
        sum(when(col("ts") >= testStart, 1L).otherwise(0L)).as("n_test"))
      .withColumn("straddles",
        col("n_train") > 0 && col("n_test") > 0)
  }

  /** q170 entry: cutoff 2024-01-20, 2-day embargo, per-user audit. */
  def q170EmbargoSplit(spark: SparkSession, dir: String): DataFrame =
    embargoSplitAudit(t(spark, dir, "events"), "2024-01-20 00:00:00", 2)
      .orderBy("user_id")

  // --------------------------------------------------------------- q189
  /** FK-coherent dev slice: sample the ROOT entity (customers) by a
    * deterministic hash threshold, then take every child row that
    * belongs to a sampled root — orders by customer, line items by
    * sampled order. The standard "cut me a 1/16 dev copy" operation;
    * independent per-table sampling would shred referential integrity
    * (an order whose customer is missing), this keeps every FK chain
    * intact by construction. Reported per table: total rows, kept rows,
    * achieved ratio.
    *
    * Scale shape: the root filter is a pure scan-side predicate (the
    * md5-prefix threshold — q56's stratified-sample recipe); children
    * keep via LEFT SEMI equi-joins down the FK chain, each shuffling
    * only its join keys. Counts are one aggregate per table; nothing
    * materializes the slice here (writers reuse the same predicates).
    *
    * Determinism: the 8-hex-digit prefix compare is engine-portable
    * string ordering; counts are exact; the achieved ratio is one
    * double divide per table. */
  def coherentSlice(customer: DataFrame, orders: DataFrame,
                    lineitem: DataFrame, rate: Double): DataFrame = {
    val kc = customer
      .filter(substring(md5(concat(lit("cs:"),
        col("c_custkey").cast("string"))), 1, 8) <
        lit(rateThreshold(rate)))
      .select(col("c_custkey"))
    val ko = orders.join(kc, col("o_custkey") === col("c_custkey"),
      "left_semi")
    val kl = lineitem.join(ko.select(col("o_orderkey")),
      col("l_orderkey") === col("o_orderkey"), "left_semi")
    def row(name: String, total: DataFrame, kept: DataFrame) =
      total.agg(count(lit(1)).as("n_total"))
        .crossJoin(broadcast(kept.agg(count(lit(1)).as("n_kept"))))
        .select(lit(name).as("tbl"), col("n_total"), col("n_kept"),
          round(col("n_kept").cast("double") / col("n_total"), 6)
            .as("ratio"))
    row("customer", customer, kc)
      .unionAll(row("lineitem", lineitem, kl))
      .unionAll(row("orders", orders, ko))
      .orderBy("tbl")
  }

  /** q189 entry: 1/16 slice rooted at customers. */
  def q189CoherentSlice(spark: SparkSession, dir: String): DataFrame =
    coherentSlice(t(spark, dir, "customer"), t(spark, dir, "orders"),
      t(spark, dir, "lineitem"), 1.0 / 16.0)

  // --------------------------------------------------------------- q202
  /** Fitted byte-pair-encoding model: the ordered merge list plus the
    * symbol vocabulary (alphabet + merged symbols → ids; id 0 reserved
    * for unknown). */
  case class BpeModel(merges: Seq[(String, String)],
                      vocab: Map[String, Long]) {
    lazy val idToSymbol: Map[Long, String] = vocab.map(_.swap)
  }

  /** Train a REAL byte-pair-encoding tokenizer (Sennrich, Haddow &
    * Birch, ACL 2016 — the public subword recipe): start from the
    * corpus character alphabet, repeatedly merge the most frequent
    * adjacent symbol pair, stop after `numMerges` merges or when no
    * pair repeats.
    *
    * Scale shape — the standard trainer split: the DISTRIBUTED work is
    * one token-count aggregate (map-side combined; the same pass q139's
    * word-vocab fit runs) plus one distinct-character aggregate over
    * the distinct-word frame for the alphabet; the merge LOOP runs
    * driver-side over the top-`maxWords` word-frequency dictionary —
    * exactly how every production BPE trainer works (merges depend on
    * weighted pair counts over the word dictionary, not the corpus, so
    * a bounded dictionary is the published algorithm, not a shortcut).
    * The fitted model is KBs and bakes into the encode plan as a
    * literal ([[graft.functions.BpeEncode]]), making the encode pass a
    * pure projection: one corpus scan, zero joins, zero shuffle.
    *
    * Determinism: ties in pair frequency break lexicographically; the
    * dictionary cut breaks count ties by word; vocabulary ids are the
    * sorted alphabet followed by merge-order symbols. */
  def bpeFit(docs: DataFrame, textCol: String, numMerges: Int = 200,
             maxWords: Int = 50000): BpeModel = {
    val eow = graft.functions.BpeEncode.EndOfWord
    val wordCounts = docs
      .select(explode(graft.functions.wordTokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
      .persist()
    // alphabet over ALL distinct words (not just the dictionary cut):
    // coverage is what makes the encode lossless corpus-wide
    val alphabet = wordCounts
      .select(explode(split(col("w"), "")).as("ch"))
      .filter(length(col("ch")) > 0)
      .distinct().collect().map(_.getString(0)).sorted
    val dict = wordCounts
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    wordCounts.unpersist()
    // driver-side Sennrich merge loop over the word-frequency dictionary
    val words: Array[(Array[String], Long)] = dict.map { case (w, c) =>
      (w.map(_.toString).toArray :+ eow, c)
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var current = words
    var go = true
    while (go && merges.length < numMerges) {
      val pairCounts =
        scala.collection.mutable.HashMap.empty[(String, String), Long]
      current.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          pairCounts(p) = pairCounts.getOrElse(p, 0L) + c
          i += 1
        }
      }
      if (pairCounts.isEmpty) go = false
      else {
        val (best, n) = pairCounts.minBy { case ((a, b), c) => (-c, a, b) }
        if (n < 2) go = false
        else {
          merges += best
          val merged = best._1 + best._2
          current = current.map { case (syms, c) =>
            val out = new scala.collection.mutable.ArrayBuffer[String](
              syms.length)
            var i = 0
            while (i < syms.length) {
              if (i < syms.length - 1 && syms(i) == best._1 &&
                  syms(i + 1) == best._2) {
                out += merged; i += 2
              } else { out += syms(i); i += 1 }
            }
            (out.toArray, c)
          }
        }
      }
    }
    val symbols = (alphabet :+ eow) ++ merges.map(p => p._1 + p._2)
    BpeModel(merges.toSeq,
      symbols.distinct.zipWithIndex.map { case (s, i) => s -> (i + 1L) }
        .toMap)
  }

  /** q202 entry: fit 200 merges on the documents corpus, encode every
    * document, and emit the oracle-checkable claims — the exact word
    * count, a bounds boolean (each word yields between 1 and
    * |chars|+1 subword symbols), and a LOSSLESS-ROUND-TRIP boolean
    * (decoding the subword ids reproduces the token stream exactly;
    * unknown ids decode to a replacement character so a lossy encode
    * can never silently pass). The oracle pins n_words value-exact and
    * expects both booleans TRUE. */
  def q202BpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val model = bpeFit(docs, "text")
    val tk = graft.functions.wordTokens(col("text"))
    docs
      .select(col("doc_id"), tk.as("tk"),
        graft.functions.bpeEncode(tk, model.merges, model.vocab).as("ids"))
      .select(col("doc_id"),
        size(col("tk")).cast("long").as("n_words"),
        (size(col("ids")) >= size(col("tk")) &&
          size(col("ids")) <= size(col("tk")) +
            aggregate(col("tk"), lit(0),
              (acc, w) => acc + length(w))).as("bpe_in_bounds"),
        (graft.functions.bpeDecode(col("ids"), model.idToSymbol) ===
          array_join(col("tk"), " ")).as("roundtrip_ok"))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q204
  /** Corpus data card — the one-call summary a training-data release
    * ships (datasheet/data-card practice): document and token volumes,
    * exact duplicate rate, language coverage and distribution entropy,
    * and the short-document share, as one labeled metric frame.
    *
    * Scale shape: TWO passes total — one corpus-scan aggregate where
    * token counting rides the fused [[graft.functions.WordTokens]]
    * inside a plain sum (no explode: the per-doc token count is a
    * projection), plus one bounded language group frame for the
    * entropy. Exact integer counts; ratios are one double divide at
    * 6 dp; entropy is Σ −p·ln p with the divide-then-ln evaluation
    * order mirrored in the oracle (the q171 transcendental recipe). */
  def q204CorpusReport(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val tk = graft.functions.wordTokens(col("text"))
    val agg = docs.select(
        size(tk).cast("long").as("n_tok"),
        length(col("text")).cast("long").as("n_ch"),
        md5(col("text")).as("h"), col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        sum(col("n_ch")).as("n_chars"),
        countDistinct(col("h")).as("n_distinct_texts"),
        countDistinct(col("lang")).as("n_langs"),
        sum(when(col("n_tok") < 30, 1L).otherwise(0L)).as("n_short"))
    // each term −p·ln p rounds to DECIMAL(28,12) before the sum (the
    // q171 recipe): the decimal sum is exact, so accumulation order —
    // nondeterministic in both engines — cannot drift the last bits
    val entropy = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("nl"))
      .agg(sum(lit(1.0) * col("nl")).as("n"),
        collect_list(col("nl").cast("double")).as("ns"))
      .select(aggregate(col("ns"),
        lit(0).cast("decimal(28,12)"),
        (acc, nl) => (acc +
          (-(nl / col("n")) * log(nl / col("n"))).cast("decimal(28,12)"))
          .cast("decimal(28,12)"))
        .cast("double").as("lang_entropy"))
    val metrics = agg.crossJoin(entropy).select(explode(array(
      struct(lit("n_docs").as("metric"),
        col("n_docs").cast("double").as("value")),
      struct(lit("n_tokens").as("metric"),
        col("n_tokens").cast("double").as("value")),
      struct(lit("n_chars").as("metric"),
        col("n_chars").cast("double").as("value")),
      struct(lit("n_langs").as("metric"),
        col("n_langs").cast("double").as("value")),
      struct(lit("exact_dup_rate").as("metric"),
        round(lit(1.0) - col("n_distinct_texts").cast("double") /
          col("n_docs"), 6).as("value")),
      struct(lit("mean_tokens_per_doc").as("metric"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6)
          .as("value")),
      struct(lit("short_doc_share").as("metric"),
        round(col("n_short").cast("double") / col("n_docs"), 6)
          .as("value")),
      struct(lit("lang_entropy").as("metric"),
        round(col("lang_entropy"), 6).as("value")))).as("m"))
      .select(col("m.metric").as("metric"), col("m.value").as("value"))
      .orderBy("metric")
    metrics
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q204_corpus_report" -> q204CorpusReport _,
    "q202_bpe_encode" -> q202BpeEncode _,
    "q189_coherent_slice" -> q189CoherentSlice _,
    "q170_embargo_split" -> q170EmbargoSplit _,
    "q143_c4_quality_filter" -> q143C4Filter _,
    "q147_source_cap" -> q147SourceCap _,
    "q152_tokenset_dedup" -> q152TokensetDedup _,
    "q156_cluster_survivor" -> q156ClusterSurvivor _,
    "q159_source_leakage" -> q159SourceLeakage _,
    "q160_cluster_split" -> q160ClusterSplit _,
    "q161_pipeline_yield" -> q161PipelineYield _,
    "q164_weighted_sample" -> q164WeightedSample _,
    "q63_bloom_decontaminate" -> q63BloomDecontaminate _,
    "q74_chunk_documents" -> q74ChunkDocuments _,
    "q139_encode_ids" -> q139EncodeIds _,
    "q50_pii_scrub" -> q50PiiScrub _,
    "q51_repetition" -> q51Repetition _,
    "q52_hash_split" -> q52HashSplit _,
    "q53_pack_sequences" -> q53PackSequences _,
    "q54_decontaminate" -> q54Decontaminate _,
    "q55_dedup_clusters" -> q55DedupClusters _,
    "q56_stratified_sample" -> q56StratifiedSample _,
    "q57_corpus_mix" -> q57CorpusMix _,
    "q206_token_waterfill" -> q206TokenWaterfill _,
    "q212_temperature_mix" -> q212TemperatureMix _,
    "q220_epoch_shuffle" -> q220EpochShuffle _,
    "q222_heaps_law" -> q222HeapsLaw _,
    "q223_char_coverage" -> q223CharCoverage _,
    "q224_shard_manifest" -> q224ShardManifest _,
    "q225_packing_audit" -> q225PackingAudit _,
    "q226_contamination_report" -> q226ContaminationReport _)

  val oracle: Map[String, String] = Map(
    // q225: the layout cumsum and every div/ceil term are exact integers
    // (DuckDB // == Spark div on the nonnegative operands here); only
    // the two fraction columns divide, after round 6.
    "q225_packing_audit" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         CAST(LEN(regexp_extract_all(text,
        |           '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n
        |  FROM documents),
        |laid AS (
        |  SELECT n, SUM(n) OVER (ORDER BY doc_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM toks WHERE n > 0),
        |x AS (
        |  SELECT CAST(len AS BIGINT) AS len, n, cum
        |  FROM laid, (VALUES (512), (1024), (2048)) ls(len)),
        |agg AS (
        |  SELECT len, COUNT(*) AS n_docs,
        |         CAST(SUM(n) AS BIGINT) AS total_tokens,
        |         CAST(SUM(CASE WHEN (cum - 1) // len <> (cum - n) // len
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS split_docs,
        |         CAST(SUM((cum - 1) // len - (cum - n) // len) AS BIGINT)
        |           AS boundary_crossings,
        |         CAST(SUM(len * ((n + len - 1) // len) - n) AS BIGINT)
        |           AS pad_waste
        |  FROM x GROUP BY 1)
        |SELECT len, n_docs, total_tokens,
        |       (total_tokens + len - 1) // len AS n_seq_packed,
        |       split_docs,
        |       round(CAST(split_docs AS DOUBLE) / n_docs, 6)
        |         AS frac_docs_split,
        |       boundary_crossings, pad_waste,
        |       round(CAST(pad_waste AS DOUBLE) /
        |             CAST(pad_waste + total_tokens AS DOUBLE), 6)
        |         AS pad_waste_frac
        |FROM agg ORDER BY len""".stripMargin,
    // q226: 5-gram shingles via the shared tokenizer recipe; the
    // min-struct argmax replays as array_agg ORDER BY (shared DESC, id).
    "q226_contamination_report" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(
        |             list_transform(range(1, greatest(len(tk) - 4, 1) + 1),
        |                  i -> array_to_string(tk[i:i+4], ' ')),
        |             g -> len(g) > 0)) AS gram
        |    FROM toks)),
        |pairs AS (
        |  SELECT b.doc_id AS bench_id, c.doc_id AS corpus_id,
        |         COUNT(*) AS shared
        |  FROM grams c JOIN grams b USING (gram)
        |  WHERE NOT (c.doc_id % 101 = 0 AND c.doc_id < 5050)
        |    AND b.doc_id % 101 = 0 AND b.doc_id < 5050
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |off AS (
        |  SELECT bench_id, COUNT(*) AS n_offenders,
        |         MAX(shared) AS max_shared,
        |         (array_agg(corpus_id ORDER BY shared DESC, corpus_id))[1]
        |           AS top_offender
        |  FROM pairs GROUP BY 1)
        |SELECT d.doc_id AS bench_id,
        |       CAST(COALESCE(o.n_offenders, 0) AS BIGINT) AS n_offenders,
        |       o.max_shared, o.top_offender
        |FROM documents d LEFT JOIN off o ON d.doc_id = o.bench_id
        |WHERE d.doc_id % 101 = 0 AND d.doc_id < 5050
        |ORDER BY bench_id""".stripMargin,
    // q220: md5 hex strings are identical cross-engine, the 2-hex-digit
    // shard value is replayed as nibble arithmetic (strpos into the hex
    // alphabet), and (h, doc_id) is a total order — hash-exact.
    "q220_epoch_shuffle" ->
      """WITH h AS (
        |  SELECT doc_id,
        |         md5('epoch-0:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, h,
        |         ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |          + strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
        |         % 64 AS shard
        |  FROM h)
        |SELECT doc_id, CAST(shard AS BIGINT) AS shard,
        |       CAST(row_number() OVER (PARTITION BY shard
        |                               ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM s ORDER BY shard, pos""".stripMargin,
    // q224: same shard arithmetic as q220; token counts via the shared
    // tokenizer recipe; offset/balance replayed over the 64-row frame
    // (integer sums, one double divide, round 6).
    "q224_shard_manifest" ->
      """WITH d AS (
        |  SELECT doc_id,
        |         CAST(len(list_filter(
        |           string_split_regex(lower(text), '\W+'),
        |           t -> len(t) > 0)) AS BIGINT) AS n_tok,
        |         md5('epoch-0:' || CAST(doc_id AS VARCHAR)) AS h
        |  FROM documents),
        |s AS (
        |  SELECT n_tok,
        |         ((strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
        |          + strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
        |         % 64 AS shard
        |  FROM d),
        |per AS (
        |  SELECT CAST(shard AS BIGINT) AS shard, COUNT(*) AS n_docs,
        |         CAST(SUM(n_tok) AS BIGINT) AS n_tokens
        |  FROM s GROUP BY 1)
        |SELECT shard, n_docs, n_tokens,
        |       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY shard
        |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |            0) AS BIGINT) AS token_offset,
        |       round(CAST(n_tokens AS DOUBLE) * 64 /
        |             CAST(SUM(n_tokens) OVER () AS DOUBLE), 6) AS balance
        |FROM per ORDER BY shard""".stripMargin,
    // q222: boundaries replayed via quantile_cont (type-7, q119's
    // precedent) rounded 6dp; cumulative counts are the same <=-joins;
    // the fit's ln terms and products go through DECIMAL(28,12) exact
    // sums so the final double arithmetic sees identical operands.
    "q222_heaps_law" ->
      """WITH bd AS (
        |  SELECT source,
        |         list_transform(
        |           quantile_cont(CAST(doc_id AS DOUBLE),
        |             [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]),
        |           b -> round(b, 6))
        |         || [CAST(MAX(doc_id) AS DOUBLE)] AS bs
        |  FROM documents GROUP BY 1),
        |ck AS (
        |  SELECT source, CAST(k AS BIGINT) AS k, bs[CAST(k AS INT)] AS boundary
        |  FROM bd, range(1, 11) r(k)),
        |dt AS (
        |  SELECT source, doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |dc AS (
        |  SELECT d.source, c.k, COUNT(*) AS docs_cum,
        |         CAST(SUM(len(d.tk)) AS BIGINT) AS tokens_cum
        |  FROM dt d JOIN ck c ON d.source = c.source
        |                     AND d.doc_id <= c.boundary
        |  GROUP BY 1, 2),
        |tm AS (
        |  SELECT source, tok, MIN(doc_id) AS first_id
        |  FROM (SELECT source, doc_id, unnest(tk) AS tok FROM dt)
        |  GROUP BY 1, 2),
        |vc AS (
        |  SELECT t.source, c.k, COUNT(*) AS vocab_cum
        |  FROM tm t JOIN ck c ON t.source = c.source
        |                     AND t.first_id <= c.boundary
        |  GROUP BY 1, 2),
        |pts AS (
        |  SELECT d.source, d.k, d.docs_cum, d.tokens_cum, v.vocab_cum,
        |         ln(CAST(d.tokens_cum AS DOUBLE)) AS x,
        |         ln(CAST(v.vocab_cum AS DOUBLE)) AS y
        |  FROM dc d JOIN vc v ON d.source = v.source AND d.k = v.k),
        |fit AS (
        |  SELECT source,
        |         CAST(COUNT(*) AS DOUBLE) AS n,
        |         CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
        |         CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
        |         CAST(SUM(CAST(x * y AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
        |         CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) AS sxx
        |  FROM pts GROUP BY 1)
        |SELECT p.source, p.k, p.docs_cum, p.tokens_cum, p.vocab_cum,
        |       round((f.n * f.sxy - f.sx * f.sy) /
        |             (f.n * f.sxx - f.sx * f.sx), 6) AS heaps_beta
        |FROM pts p JOIN fit f USING (source)
        |ORDER BY source, k""".stripMargin,
    // q223: char frequencies via string_split(text,'') (q85's recipe);
    // the 99.9% threshold is exact-integer (1000*cum >= 999*total).
    "q223_char_coverage" ->
      """WITH cs AS (
        |  SELECT lang, unnest(string_split(text, '')) AS ch
        |  FROM documents),
        |f AS (
        |  SELECT lang, ch, COUNT(*) AS c FROM cs
        |  WHERE len(ch) > 0 GROUP BY 1, 2),
        |r AS (
        |  SELECT lang, c,
        |         CAST(row_number() OVER (PARTITION BY lang
        |                ORDER BY c DESC, ch) AS BIGINT) AS r,
        |         CAST(SUM(c) OVER (PARTITION BY lang ORDER BY c DESC, ch
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS BIGINT) AS cum,
        |         CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS total
        |  FROM f)
        |SELECT lang, MAX(total) AS total_chars, MAX(r) AS distinct_chars,
        |       MIN(CASE WHEN cum * 1000 >= total * 999 THEN r END)
        |         AS chars_cover_999,
        |       round(CAST(COALESCE(MAX(CASE WHEN r = 32 THEN cum END),
        |                           MAX(total)) AS DOUBLE)
        |             / CAST(MAX(total) AS DOUBLE), 6) AS coverage_top32
        |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    // q212: sqrt is IEEE-correctly-rounded (hence bit-equal), the √n
    // terms round to DECIMAL(28,12) before the exact sum, and every
    // divide sees identical operands — the whole frame is hash-exact
    "q212_temperature_mix" ->
      """WITH caps AS (
        |  SELECT lang, CAST(SUM(len(list_filter(
        |           string_split_regex(lower(text), '\W+'),
        |           t -> len(t) > 0))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY 1),
        |w AS (
        |  SELECT lang, n_tokens,
        |         sqrt(CAST(n_tokens AS DOUBLE)) AS w,
        |         CAST(SUM(CAST(sqrt(CAST(n_tokens AS DOUBLE))
        |                AS DECIMAL(28,12))) OVER () AS DOUBLE) AS wsum,
        |         CAST(SUM(n_tokens) OVER () AS BIGINT) AS total
        |  FROM caps)
        |SELECT lang, n_tokens,
        |       round(w / wsum, 6) AS weight,
        |       CAST(floor(1000000 * w / wsum) AS BIGINT) AS alloc_tokens,
        |       round(w / wsum * CAST(total AS DOUBLE) /
        |             CAST(n_tokens AS DOUBLE), 6) AS sampling_factor
        |FROM w ORDER BY lang""".stripMargin,
    // q206: all-integer closed-form waterfill — the oracle replays the
    // same boundary/remainder arithmetic over the post-agg frame, so
    // the compare is hash-exact (DuckDB // and % match Spark DIV and %
    // on the nonnegative operands used here)
    "q206_token_waterfill" ->
      """WITH caps AS (
        |  SELECT lang, CAST(SUM(len(list_filter(
        |           string_split_regex(lower(text), '\W+'),
        |           t -> len(t) > 0))) AS BIGINT) AS available
        |  FROM documents GROUP BY 1),
        |st AS (
        |  SELECT lang, available,
        |         CAST(ROW_NUMBER() OVER (ORDER BY available, lang)
        |              AS BIGINT) AS rn,
        |         COUNT(*) OVER () AS n_groups,
        |         CAST(COALESCE(SUM(available) OVER (
        |           ORDER BY available, lang
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |           0) AS BIGINT) AS cum_before,
        |         CAST((SUM(available) OVER ()) * 4 // 5 AS BIGINT)
        |           AS budget
        |  FROM caps),
        |b1 AS (
        |  SELECT *, MIN(CASE WHEN cum_before +
        |                          available * (n_groups - rn + 1) >= budget
        |                     THEN rn END) OVER () AS boundary_rn
        |  FROM st),
        |b2 AS (
        |  SELECT *, MAX(CASE WHEN rn = boundary_rn THEN cum_before END)
        |              OVER () AS cum_b
        |  FROM b1),
        |b3 AS (
        |  SELECT lang, available,
        |         CAST(CASE WHEN boundary_rn IS NULL OR rn < boundary_rn
        |              THEN available
        |              ELSE (budget - cum_b) // (n_groups - boundary_rn + 1)
        |                   + CASE WHEN rn - boundary_rn <
        |                       (budget - cum_b) %
        |                         (n_groups - boundary_rn + 1)
        |                     THEN 1 ELSE 0 END
        |         END AS BIGINT) AS allocated
        |  FROM b2)
        |SELECT lang, available, allocated,
        |       allocated = available AS saturated
        |FROM b3 ORDER BY lang""".stripMargin,
    // q204: exact counts; ratios one double divide at 6 dp; entropy
    // terms round to DECIMAL(28,12) before the exact sum (q171 recipe)
    // so accumulation order can't drift either engine
    "q204_corpus_report" ->
      """WITH base AS (
        |  SELECT len(list_filter(string_split_regex(lower(text), '\W+'),
        |             t -> len(t) > 0)) AS n_tok,
        |         length(text) AS n_ch, md5(text) AS h, lang
        |  FROM documents),
        |agg AS (
        |  SELECT COUNT(*) AS n_docs, SUM(n_tok) AS n_tokens,
        |         SUM(n_ch) AS n_chars,
        |         COUNT(DISTINCT h) AS n_distinct_texts,
        |         COUNT(DISTINCT lang) AS n_langs,
        |         SUM(CASE WHEN n_tok < 30 THEN 1 ELSE 0 END) AS n_short
        |  FROM base),
        |lc AS (SELECT lang, COUNT(*) AS nl FROM base GROUP BY 1),
        |ent AS (
        |  SELECT CAST(SUM(CAST(
        |           -(CAST(nl AS DOUBLE) / n) * ln(CAST(nl AS DOUBLE) / n)
        |           AS DECIMAL(28,12))) AS DOUBLE) AS lang_entropy
        |  FROM lc, (SELECT SUM(1.0 * nl) AS n FROM lc))
        |SELECT metric, value FROM (
        |  SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value
        |  FROM agg
        |  UNION ALL SELECT 'n_tokens', CAST(n_tokens AS DOUBLE) FROM agg
        |  UNION ALL SELECT 'n_chars', CAST(n_chars AS DOUBLE) FROM agg
        |  UNION ALL SELECT 'n_langs', CAST(n_langs AS DOUBLE) FROM agg
        |  UNION ALL SELECT 'exact_dup_rate',
        |    round(1.0 - CAST(n_distinct_texts AS DOUBLE) / n_docs, 6)
        |  FROM agg
        |  UNION ALL SELECT 'mean_tokens_per_doc',
        |    round(CAST(n_tokens AS DOUBLE) / n_docs, 6) FROM agg
        |  UNION ALL SELECT 'short_doc_share',
        |    round(CAST(n_short AS DOUBLE) / n_docs, 6) FROM agg
        |  UNION ALL SELECT 'lang_entropy', round(lang_entropy, 6)
        |  FROM ent)
        |ORDER BY metric""".stripMargin,
    // q202: the BPE model itself is a fitted artifact, but its CONTRACT
    // is oracle-checkable — exact word counts, per-word subword bounds,
    // and the lossless round-trip the algorithm guarantees by
    // construction (merges only ever concatenate adjacent symbols)
    "q202_bpe_encode" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents)
        |SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_words,
        |       TRUE AS bpe_in_bounds, TRUE AS roundtrip_ok
        |FROM toks ORDER BY doc_id""".stripMargin,
    // q189: the md5-prefix root sample and both FK chains replicated
    // verbatim; '10000000' is rateThreshold(1/16). Integer counts, one
    // double divide per row.
    "q189_coherent_slice" ->
      """WITH kc AS (
        |  SELECT c_custkey FROM customer
        |  WHERE substr(md5(concat('cs:', CAST(c_custkey AS VARCHAR))),
        |              1, 8) < '10000000'),
        |ko AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM kc)),
        |u AS (
        |  SELECT 'customer' AS tbl,
        |         (SELECT COUNT(*) FROM customer) AS n_total,
        |         (SELECT COUNT(*) FROM kc) AS n_kept
        |  UNION ALL
        |  SELECT 'orders',
        |         (SELECT COUNT(*) FROM orders),
        |         (SELECT COUNT(*) FROM ko)
        |  UNION ALL
        |  SELECT 'lineitem',
        |         (SELECT COUNT(*) FROM lineitem),
        |         (SELECT COUNT(*) FROM lineitem
        |          WHERE l_orderkey IN (SELECT o_orderkey FROM ko)))
        |SELECT tbl, n_total, n_kept,
        |       round(CAST(n_kept AS DOUBLE) / n_total, 6) AS ratio
        |FROM u ORDER BY tbl""".stripMargin,
    // q170: pure timestamp comparisons against literal boundaries —
    // integer counters, no float math anywhere.
    "q170_embargo_split" ->
      """SELECT user_id,
        |  CAST(SUM(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
        |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-20 00:00:00'
        |            AND ts < TIMESTAMP '2024-01-22 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_embargo,
        |  CAST(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-22 00:00:00'
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
        |  (SUM(CASE WHEN ts < TIMESTAMP '2024-01-20 00:00:00'
        |       THEN 1 ELSE 0 END) > 0
        |   AND SUM(CASE WHEN ts >= TIMESTAMP '2024-01-22 00:00:00'
        |       THEN 1 ELSE 0 END) > 0) AS straddles
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // q147: the oracle is the NAIVE window form the engine's bounded
    // aggregate replaces — the cap policy must be invisible to the user.
    "q147_source_cap" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |         md5(text || ':' || doc_id) AS ticket
        |  FROM documents),
        |r AS (
        |  SELECT source, doc_id,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY ticket) AS rn
        |  FROM h)
        |SELECT source, doc_id FROM r WHERE rn <= 10
        |ORDER BY source, doc_id""".stripMargin,
    "q152_tokenset_dedup" ->
      """WITH fp AS (
        |  SELECT doc_id,
        |         md5(array_to_string(list_sort(list_distinct(
        |           list_filter(string_split_regex(lower(text), '\W+'),
        |                       t -> len(t) > 0))), ' ')) AS fp
        |  FROM documents),
        |cl AS (SELECT fp, COUNT(*) AS cluster_size,
        |              MIN(doc_id) AS canonical_id
        |       FROM fp GROUP BY fp)
        |SELECT f.doc_id, cl.cluster_size,
        |       f.doc_id = cl.canonical_id AS keep
        |FROM fp f JOIN cl USING (fp)
        |ORDER BY f.doc_id""".stripMargin,
    "q143_c4_quality_filter" ->
      """WITH tok AS (
        |  SELECT doc_id, t.tok
        |  FROM documents,
        |       unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                          x -> len(x) > 0)) AS t(tok)),
        |pt AS (
        |  SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        |pd AS (
        |  SELECT doc_id, SUM(cnt) AS n_tokens,
        |         SUM(len(tok) * cnt) AS sum_len,
        |         MAX(cnt) AS max_cnt,
        |         SUM(CASE WHEN tok IN ('a','the','of','and','to','in',
        |                               'is','it') THEN cnt ELSE 0 END)
        |           AS stop_cnt
        |  FROM pt GROUP BY doc_id)
        |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
        |       n_tokens < 30 AS fail_short,
        |       (sum_len < n_tokens * 3 OR sum_len > n_tokens * 10)
        |         AS fail_word_len,
        |       max_cnt * 8 > n_tokens AS fail_repetition,
        |       stop_cnt * 100 < n_tokens AS fail_stop_ratio,
        |       NOT (n_tokens < 30)
        |       AND NOT (sum_len < n_tokens * 3 OR sum_len > n_tokens * 10)
        |       AND NOT (max_cnt * 8 > n_tokens)
        |       AND NOT (stop_cnt * 100 < n_tokens) AS keep
        |FROM pd ORDER BY doc_id""".stripMargin,
    // q139: same fit recipe (total count, ties by token, row_number id);
    // the encode side re-derives ids by position join + ordered
    // string_agg where the engine uses a fitted-model expression +
    // array_join — same space-joined sequences, scalar (hashable) form.
    "q139_encode_ids" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |alltok AS (SELECT unnest(tk) AS tok FROM toks),
        |vocab AS (
        |  SELECT tok, row_number() OVER (ORDER BY cnt DESC, tok) AS id
        |  FROM (SELECT tok, COUNT(*) AS cnt FROM alltok GROUP BY tok
        |        ORDER BY cnt DESC, tok LIMIT 256)),
        |pos AS (
        |  SELECT doc_id, unnest(tk) AS tok,
        |         generate_subscripts(tk, 1) AS pos
        |  FROM toks WHERE len(tk) > 0)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |       string_agg(CAST(COALESCE(v.id, 0) AS VARCHAR), ' '
        |                  ORDER BY pos) AS ids
        |FROM pos LEFT JOIN vocab v USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q74: range(1, len+1, 32) generates the 1-based chunk starts;
    // tk[s:s+63] is DuckDB's inclusive 64-element slice (truncating at the
    // tail exactly like the fused expression).
    "q74_chunk_documents" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |c AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(tk) + 1, 32),
        |           s -> {'idx': CAST((s - 1) // 32 AS BIGINT),
        |                 'txt': array_to_string(tk[s:s+63], ' ')})) AS u
        |  FROM toks WHERE len(tk) > 0)
        |SELECT doc_id, u.idx AS chunk_idx, u.txt AS chunk_text
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // q63: bigram grams (tk[i:i+1] is DuckDB's inclusive 2-element slice),
    // DISTINCT per doc to mirror WordNgrams(distinct); engine joins on
    // xxhash64(gram), oracle on the gram text — identical counts (64-bit
    // collisions are immaterial at any realistic gram universe).
    "q63_bloom_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(
        |             list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
        |                  i -> array_to_string(tk[i:i+1], ' ')),
        |             g -> len(g) > 0)) AS gram
        |    FROM toks)),
        |corpus AS (SELECT * FROM grams WHERE doc_id % 97 <> 0),
        |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 0),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY 1),
        |overlap AS (
        |  SELECT c.doc_id, COUNT(*) AS n_overlap
        |  FROM corpus c JOIN bench b USING (gram) GROUP BY 1)
        |SELECT s.doc_id, s.n_grams, o.n_overlap,
        |       round(CAST(o.n_overlap AS DOUBLE) / s.n_grams, 6)
        |         AS overlap_frac
        |FROM sizes s JOIN overlap o ON s.doc_id = o.doc_id
        |WHERE o.n_overlap >= 5
        |ORDER BY s.doc_id""".stripMargin,
    "q50_pii_scrub" ->
      """WITH s AS (
        |  SELECT doc_id, text,
        |    len(regexp_extract_all(text, 'https?://[^\s]+')) AS n_url,
        |    regexp_replace(text, 'https?://[^\s]+', '<URL>', 'g') AS t1
        |  FROM documents),
        |s2 AS (
        |  SELECT doc_id, n_url,
        |    len(regexp_extract_all(t1,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
        |    regexp_replace(t1,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g') AS t2
        |  FROM s)
        |SELECT doc_id,
        |  regexp_replace(t2, '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}',
        |    '<PHONE>', 'g') AS clean_text,
        |  n_url, n_email,
        |  len(regexp_extract_all(t2,
        |    '\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}')) AS n_phone
        |FROM s2 ORDER BY doc_id""".stripMargin,
    "q51_repetition" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(lower(text), '\W+'),
        |                t -> len(t) > 0) AS tk
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, tk,
        |    list_filter(
        |      list_transform(range(1, greatest(len(tk) - 1, 1) + 1),
        |        i -> array_to_string(tk[i:i+1], ' ')),
        |      x -> len(x) > 0) AS bg
        |  FROM s)
        |SELECT doc_id,
        |  CAST(len(tk) AS BIGINT) AS n_toks,
        |  round(CAST(len(list_distinct(tk)) AS DOUBLE)
        |      / CAST(greatest(len(tk), 1) AS DOUBLE), 6) AS ttr,
        |  round(1.0 - CAST(len(list_distinct(bg)) AS DOUBLE)
        |      / CAST(greatest(len(bg), 1) AS DOUBLE), 6) AS dup_bigram_ratio
        |FROM g ORDER BY doc_id""".stripMargin,
    "q52_hash_split" ->
      """SELECT doc_id, lang,
        |  CASE WHEN substr(md5(text), 1, 1) = 'e' THEN 'val'
        |       WHEN substr(md5(text), 1, 1) = 'f' THEN 'test'
        |       ELSE 'train' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q56_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CASE WHEN lang = 'en'
        |           THEN substr(md5(text), 1, 8) < '40000000'
        |           ELSE true END
        |ORDER BY doc_id""".stripMargin,
    "q57_corpus_mix" ->
      """WITH u AS (
        |  SELECT doc_id, text, 0 AS src FROM documents WHERE lang = 'en'
        |  UNION ALL
        |  SELECT doc_id, text, 1 AS src FROM documents),
        |r AS (
        |  SELECT doc_id, src,
        |         row_number() OVER (PARTITION BY md5(text)
        |                            ORDER BY src, doc_id) AS rn
        |  FROM u)
        |SELECT doc_id, src FROM r WHERE rn = 1 ORDER BY doc_id""".stripMargin,
    // q55 mirrors q33's pair derivation (same kept-gram universe), then
    // resolves clusters with a recursive reachability CTE: MIN(r) over all
    // roots reaching a node = the smallest id in its component.
    // q164: the 52-bit digest slice decoded with a position fold
    // (strpos arithmetic == the engine's conv(hex, 16, 10), integer-exact);
    // ln(u)/w ordering matches bit-for-bit away from measure-zero ties.
    "q164_weighted_sample" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |         md5(text || ':' || doc_id) AS hx
        |  FROM documents),
        |u AS (
        |  SELECT doc_id, n_chars,
        |         CAST((CAST(strpos('0123456789abcdef', substr(hx, 1, 1)) - 1 AS BIGINT) * 281474976710656)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 2, 1)) - 1 AS BIGINT) * 17592186044416)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 3, 1)) - 1 AS BIGINT) * 1099511627776)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 4, 1)) - 1 AS BIGINT) * 68719476736)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 5, 1)) - 1 AS BIGINT) * 4294967296)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 6, 1)) - 1 AS BIGINT) * 268435456)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 7, 1)) - 1 AS BIGINT) * 16777216)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 8, 1)) - 1 AS BIGINT) * 1048576)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 9, 1)) - 1 AS BIGINT) * 65536)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 10, 1)) - 1 AS BIGINT) * 4096)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 11, 1)) - 1 AS BIGINT) * 256)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 12, 1)) - 1 AS BIGINT) * 16)
        |           + (CAST(strpos('0123456789abcdef', substr(hx, 13, 1)) - 1 AS BIGINT) * 1)
        |           + 1 AS DOUBLE) / 4503599627370496.0 AS u
        |  FROM h),
        |p AS (
        |  SELECT doc_id, n_chars AS weight,
        |         ln(u) / CAST(n_chars AS DOUBLE) AS priority
        |  FROM u),
        |sel AS (
        |  SELECT * FROM p ORDER BY priority DESC, doc_id LIMIT 100)
        |SELECT doc_id, weight, round(priority, 9) AS priority
        |FROM sel ORDER BY doc_id""".stripMargin,
    // q160: q55's closure LEFT-joined to every document (singletons are
    // their own cluster), then q52's md5-prefix split on the root.
    "q160_cluster_split" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(
        |             list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |                  i -> array_to_string(tk[i:i+2], ' ')),
        |             g -> len(g) > 0)) AS gram
        |    FROM toks)),
        |kept AS (
        |  SELECT doc_id, gram FROM (
        |    SELECT doc_id, gram,
        |           COUNT(*) OVER (PARTITION BY gram) AS gram_df
        |    FROM grams)
        |  WHERE gram_df <= 1000),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM kept GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM kept a JOIN kept b USING (gram)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT p.id_a, p.id_b
        |  FROM p
        |  JOIN sizes sa ON p.id_a = sa.doc_id
        |  JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)
        |          / (sa.n_grams + sb.n_grams - p.common) >= 0.05),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL
        |  SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        |cl AS (SELECT id, MIN(r) AS cluster_root FROM reach GROUP BY id)
        |SELECT d.doc_id,
        |       COALESCE(cl.cluster_root, d.doc_id) AS cluster_root,
        |       CASE substr(md5('cluster:'
        |                       || COALESCE(cl.cluster_root, d.doc_id)),
        |                   1, 1)
        |         WHEN 'e' THEN 'val' WHEN 'f' THEN 'test'
        |         ELSE 'train' END AS split
        |FROM documents d LEFT JOIN cl ON cl.id = d.doc_id
        |ORDER BY d.doc_id""".stripMargin,
    // q161: the three stage predicates inlined (q143 integer rules,
    // q152 fingerprint, q147 capped draw over the survivors).
    "q161_pipeline_yield" ->
      """WITH tok AS (
        |  SELECT doc_id, t.tok
        |  FROM documents,
        |       unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                          x -> len(x) > 0)) AS t(tok)),
        |tc AS (SELECT doc_id, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        |pd AS (
        |  SELECT doc_id, SUM(cnt) AS n_tokens,
        |         SUM(len(tok) * cnt) AS sum_len, MAX(cnt) AS max_cnt,
        |         SUM(CASE WHEN tok IN ('a','the','of','and','to','in',
        |                               'is','it') THEN cnt ELSE 0 END)
        |           AS stop_cnt
        |  FROM tc GROUP BY 1),
        |q AS (
        |  SELECT doc_id,
        |         NOT (n_tokens < 30 OR sum_len < n_tokens * 3
        |              OR sum_len > n_tokens * 10
        |              OR max_cnt * 8 > n_tokens
        |              OR stop_cnt * 100 < n_tokens) AS q_keep
        |  FROM pd),
        |fp AS (
        |  SELECT doc_id,
        |         md5(array_to_string(list_sort(list_distinct(
        |           list_filter(string_split_regex(lower(text), '\W+'),
        |                       t -> len(t) > 0))), ' ')) AS fp
        |  FROM documents),
        |dk AS (
        |  SELECT doc_id,
        |         doc_id = MIN(doc_id) OVER (PARTITION BY fp) AS d_keep
        |  FROM fp),
        |flags AS (
        |  SELECT d.doc_id, d.source, d.text, q.q_keep, dk.d_keep
        |  FROM documents d JOIN q USING (doc_id) JOIN dk USING (doc_id)),
        |surv AS (SELECT * FROM flags WHERE q_keep AND d_keep),
        |ranked AS (
        |  SELECT doc_id,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY md5(text || ':' || doc_id)) AS rn
        |  FROM surv)
        |SELECT f.source, COUNT(*) AS n_total,
        |       COUNT(*) FILTER (f.q_keep) AS n_quality,
        |       COUNT(*) FILTER (f.q_keep AND f.d_keep) AS n_dedup,
        |       COUNT(*) FILTER (r.rn <= 10) AS n_final
        |FROM flags f LEFT JOIN ranked r USING (doc_id)
        |GROUP BY f.source ORDER BY f.source""".stripMargin,
    // q159: q33/q55's exact pair formulation rolled up by source pair.
    "q159_source_leakage" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(
        |             list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |                  i -> array_to_string(tk[i:i+2], ' ')),
        |             g -> len(g) > 0)) AS gram
        |    FROM toks)),
        |kept AS (
        |  SELECT doc_id, gram FROM (
        |    SELECT doc_id, gram,
        |           COUNT(*) OVER (PARTITION BY gram) AS gram_df
        |    FROM grams)
        |  WHERE gram_df <= 1000),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM kept GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM kept a JOIN kept b USING (gram)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT p.id_a, p.id_b
        |  FROM p
        |  JOIN sizes sa ON p.id_a = sa.doc_id
        |  JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)
        |          / (sa.n_grams + sb.n_grams - p.common) >= 0.05)
        |SELECT least(da.source, db.source) AS source_lo,
        |       greatest(da.source, db.source) AS source_hi,
        |       COUNT(*) AS n_pairs
        |FROM pairs
        |JOIN documents da ON da.doc_id = pairs.id_a
        |JOIN documents db ON db.doc_id = pairs.id_b
        |GROUP BY 1, 2 ORDER BY source_lo, source_hi""".stripMargin,
    // q156: q55's closure + a per-cluster (−n_chars, id) struct-min
    // survivor election (struct MIN is lexicographic in both engines).
    "q156_cluster_survivor" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(
        |             list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |                  i -> array_to_string(tk[i:i+2], ' ')),
        |             g -> len(g) > 0)) AS gram
        |    FROM toks)),
        |kept AS (
        |  SELECT doc_id, gram FROM (
        |    SELECT doc_id, gram,
        |           COUNT(*) OVER (PARTITION BY gram) AS gram_df
        |    FROM grams)
        |  WHERE gram_df <= 1000),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM kept GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM kept a JOIN kept b USING (gram)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT p.id_a, p.id_b
        |  FROM p
        |  JOIN sizes sa ON p.id_a = sa.doc_id
        |  JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)
        |          / (sa.n_grams + sb.n_grams - p.common) >= 0.05),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL
        |  SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id),
        |cl AS (
        |  SELECT id, MIN(r) AS cluster_root FROM reach GROUP BY id),
        |sized AS (
        |  SELECT cl.id, cl.cluster_root, d.n_chars
        |  FROM cl JOIN documents d ON d.doc_id = cl.id),
        |surv AS (
        |  SELECT cluster_root,
        |         MIN({'neg': -n_chars, 'sid': id}).sid AS survivor_id
        |  FROM sized GROUP BY cluster_root)
        |SELECT s.id AS doc_id, s.cluster_root, surv.survivor_id,
        |       s.id = surv.survivor_id AS keep
        |FROM sized s JOIN surv USING (cluster_root)
        |ORDER BY doc_id""".stripMargin,
    "q55_dedup_clusters" ->
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(
        |             list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |                  i -> array_to_string(tk[i:i+2], ' ')),
        |             g -> len(g) > 0)) AS gram
        |    FROM toks)),
        |kept AS (
        |  SELECT doc_id, gram FROM (
        |    SELECT doc_id, gram,
        |           COUNT(*) OVER (PARTITION BY gram) AS gram_df
        |    FROM grams)
        |  WHERE gram_df <= 1000),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM kept GROUP BY 1),
        |p AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
        |  FROM kept a JOIN kept b USING (gram)
        |  WHERE a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |pairs AS (
        |  SELECT p.id_a, p.id_b
        |  FROM p
        |  JOIN sizes sa ON p.id_a = sa.doc_id
        |  JOIN sizes sb ON p.id_b = sb.doc_id
        |  WHERE CAST(p.common AS DOUBLE)
        |          / (sa.n_grams + sb.n_grams - p.common) >= 0.05),
        |edges AS (
        |  SELECT id_a AS a, id_b AS b FROM pairs
        |  UNION ALL
        |  SELECT id_b, id_a FROM pairs),
        |nodes AS (SELECT DISTINCT a AS id FROM edges),
        |reach(id, r) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.id)
        |SELECT id AS doc_id, MIN(r) AS cluster_root
        |FROM reach GROUP BY id ORDER BY doc_id""".stripMargin,
    "q54_decontaminate" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(text), '\W+'),
        |                     t -> len(t) > 0) AS tk
        |  FROM documents),
        |grams AS (
        |  SELECT DISTINCT doc_id, gram FROM (
        |    SELECT doc_id,
        |           unnest(list_filter(
        |             list_transform(range(1, greatest(len(tk) - 2, 1) + 1),
        |                  i -> array_to_string(tk[i:i+2], ' ')),
        |             g -> len(g) > 0)) AS gram
        |    FROM toks)),
        |corpus AS (SELECT * FROM grams WHERE doc_id % 101 <> 0),
        |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 101 = 0),
        |sizes AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY 1),
        |overlap AS (
        |  SELECT c.doc_id, COUNT(*) AS n_overlap
        |  FROM corpus c JOIN bench b USING (gram) GROUP BY 1)
        |SELECT s.doc_id, s.n_grams, o.n_overlap,
        |       round(CAST(o.n_overlap AS DOUBLE) / s.n_grams, 6)
        |         AS overlap_frac
        |FROM sizes s JOIN overlap o ON s.doc_id = o.doc_id
        |WHERE o.n_overlap >= 3
        |ORDER BY s.doc_id""".stripMargin,
    "q53_pack_sequences" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |    CAST(len(regexp_extract_all(text,
        |      '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |packed AS (
        |  SELECT doc_id, n_tokens,
        |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |      AS cum_tokens
        |  FROM toks)
        |SELECT doc_id, n_tokens, cum_tokens,
        |       CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS shard
        |FROM packed ORDER BY doc_id""".stripMargin)
}
