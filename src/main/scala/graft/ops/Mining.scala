package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.TableCatalog

/** Corpus/event mining tier: sketch-estimated frequencies, corpus
  * familiarity scoring, Markov transitions, robust (MAD) outliers,
  * winsorization, GDPR-style tombstone cascades, mergeable partial-
  * aggregate rollups, perceptual-hash media dedup, weighted sampling,
  * and exact-under-capacity approximate top-k.
  *
  * Scale notes live on each operator; the common thread is that every
  * "approximate" structure here (CMS, frequent-items sketch, perceptual
  * hash) is MERGEABLE — partial states combine map-side, so only
  * KB-sized summaries cross the shuffle, never per-row state. That is
  * the property that lets the same query run at 100 TB: the data-sized
  * side of every plan stays embarrassingly parallel, and the merged
  * side is bounded by sketch size, not corpus size.
  */
object Mining {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    TableCatalog.load(spark, dir, name)

  // --------------------------------------------------------------- q100
  /** Count-Min-sketch frequency estimates for the exact top-20 heavy
    * hitters. The sketch is ONE mergeable binary (eps=1e-4 → 20k×7
    * counters, ~1.1 MB) aggregated in a single pass — at 100 TB the
    * per-partition partials merge map-side and only the sketch crosses
    * the wire, the collect ships one row, and probes run as codegen
    * against the deserialized sketch ([[graft.functions.CmsEstimate]]).
    * CMS never under-counts, so `cms_est >= exact_cnt` always. The exact
    * counts double as the in-query ground truth (the pattern a production
    * pipeline uses to VALIDATE its sketch config before trusting it
    * unmetered), and the estimate is emitted as the q93/q70-style
    * envelope boolean — `cms_ok` = exact ≤ est ≤ exact + ⌈eps·N⌉, the
    * sketch's published guarantee — so the whole row is oracle-checkable
    * (the raw estimate itself is sketch-internal; the spec still probes
    * it directly). */
  def q100CmsHeavyHitters(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val first = li
      .agg(expr("count_min_sketch(l_partkey, 0.0001d, 0.99d, 42)").as("sk"),
        count(lit(1)).as("n"))
      .head()
    val sk = first.getAs[Array[Byte]](0)
    val envelope = math.ceil(1e-4 * first.getAs[Long](1)).toLong
    li.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("exact_cnt"))
      .orderBy(col("exact_cnt").desc, col("l_partkey"))
      .limit(20)
      .withColumn("cms_ok",
        cmsEstimate(sk, col("l_partkey")).between(
          col("exact_cnt"), col("exact_cnt") + lit(envelope)))
  }

  // --------------------------------------------------------------- q101
  /** Corpus-familiarity score: for each document, the average document
    * frequency of its distinct word bigrams — a cheap, fully-exact
    * "how much does this doc look like the rest of the corpus" signal
    * (low = novel/noisy, high = boilerplate), the integer-arithmetic
    * cousin of LM-perplexity filtering.
    *
    * Scale shape: bigrams come from the fused [[graft.functions.WordNgrams]]
    * expression (one pass, per-doc distinct), document frequency is one
    * gram-keyed count (map-side combine), and the rejoin ships (gram, df)
    * pairs — never document text. */
  def q101BigramFamiliarity(spark: SparkSession, dir: String): DataFrame = {
    val grams = t(spark, dir, "documents")
      .select(col("doc_id"), explode(wordNgrams(col("text"), 2)).as("gram"))
    val dfreq = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    grams.join(dfreq, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("df")).as("df_sum"))
      .withColumn("familiarity",
        round(col("df_sum").cast("double") / col("n_bigrams"), 6))
      .orderBy(col("doc_id"))
  }

  // --------------------------------------------------------------- q102
  /** First-order Markov transition matrix over per-user event streams:
    * count (previous event_type → event_type) steps, with each pair's
    * global share. One lag window co-partitioned by user (the same
    * shuffle any per-user sequence op pays), then a 25-row aggregate —
    * the post-agg share division never touches the fact table. */
  def q102EventTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
    val counts = pairs.groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share",
        round(col("n").cast("double") / col("total").cast("double"), 6))
      .select("from_type", "to_type", "n", "share")
      .orderBy("from_type", "to_type")
  }

  // --------------------------------------------------------------- q103
  /** Robust outliers via median absolute deviation: flag documents whose
    * length sits more than 2 MADs from their language's median. Two
    * exact-median aggregates (medians/MADs are per-language scalars that
    * broadcast back); MAD is preferred over q67's z-score when the metric
    * itself is heavy-tailed — one 10 GB document shifts a mean and
    * stddev, but not a median. */
  def q103MadOutliers(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val med = docs.groupBy(col("lang"))
      .agg(expr("median(n_chars)").as("med"))
    val j = docs.join(broadcast(med), "lang")
    val mad = j.groupBy(col("lang"))
      .agg(expr("median(abs(n_chars - med))").as("mad"))
    j.join(broadcast(mad), "lang")
      .filter(abs(col("n_chars") - col("med")) > lit(2) * col("mad"))
      .select("doc_id", "lang", "n_chars", "med", "mad")
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q104
  /** Winsorization accounting: per returnflag, clamp extended price to its
    * exact [p05, p95] percentile band and report the clip counts, band
    * bounds, the in-band exact-decimal sum, and the winsorized total
    * (in-band sum + clipped rows at their clamp value). The percentile
    * pass ships group values once; the second pass is a broadcast-joined
    * scan — no row ever carries more than two scalar bounds. */
  def q104Winsorize(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    // one percentile STATE for both bounds (array form) — the exact
    // percentile ships every distinct group value once, not twice
    val pct = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.05D, 0.95D))").as("p"))
      .select(col("l_returnflag"), col("p")(0).as("p05"),
        col("p")(1).as("p95"))
    li.join(broadcast(pct), "l_returnflag")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col("l_extendedprice") < col("p05"), 1L).otherwise(0L))
          .as("n_low"),
        sum(when(col("l_extendedprice") > col("p95"), 1L).otherwise(0L))
          .as("n_high"),
        max(col("p05")).as("p05"),
        max(col("p95")).as("p95"),
        sum(when(
          col("l_extendedprice").between(col("p05"), col("p95")),
          col("l_extendedprice").cast("decimal(18,4)")))
          .cast("double").as("within_sum"))
      .withColumn("winsor_total",
        round(col("within_sum") + col("n_low") * col("p05") +
          col("n_high") * col("p95"), 2))
      .orderBy("l_returnflag")
  }

  // --------------------------------------------------------------- q105
  /** GDPR-style tombstone cascade: given a deletion cohort (customers of
    * one nation), report per-table before/deleted/after counts as the
    * cascade reaches customer → orders → lineitem. The tombstone key set
    * broadcasts (deletion batches are small next to facts), so every
    * fact table resolves its deletions in a broadcast join with zero
    * fact-side shuffle — the plan a compliance sweep needs at 100 TB. */
  def q105TombstoneCascade(spark: SparkSession, dir: String): DataFrame = {
    val tomb = t(spark, dir, "customer")
      .join(broadcast(t(spark, dir, "nation")
        .filter(col("n_name") === "NATION_7")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"))
    val customer = t(spark, dir, "customer")
    val orders = t(spark, dir, "orders")
    val lineitem = t(spark, dir, "lineitem")

    val custRow = customer
      .join(broadcast(tomb.withColumn("del", lit(1L))), Seq("c_custkey"),
        "left")
      .agg(count(lit(1)).as("rows_before"),
        coalesce(sum(col("del")), lit(0L)).as("rows_deleted"))
      .select(lit("customer").as("table_name"), col("rows_before"),
        col("rows_deleted"))
    val ordRow = orders
      .join(broadcast(tomb.withColumn("del", lit(1L))),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("rows_before"),
        coalesce(sum(col("del")), lit(0L)).as("rows_deleted"))
      .select(lit("orders").as("table_name"), col("rows_before"),
        col("rows_deleted"))
    val delOrders = orders
      .join(broadcast(tomb), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .select(col("o_orderkey")).withColumn("del", lit(1L))
    val liRow = lineitem
      .join(broadcast(delOrders), col("l_orderkey") === col("o_orderkey"),
        "left")
      .agg(count(lit(1)).as("rows_before"),
        coalesce(sum(col("del")), lit(0L)).as("rows_deleted"))
      .select(lit("lineitem").as("table_name"), col("rows_before"),
        col("rows_deleted"))

    custRow.unionByName(ordRow).unionByName(liRow)
      .withColumn("rows_after", col("rows_before") - col("rows_deleted"))
      .orderBy("table_name")
  }

  // --------------------------------------------------------------- q106
  /** Mergeable partial-aggregate rollup: daily (day, flag) partials —
    * count + EXACT DECIMAL quantity sum — rolled up to weeks by summing
    * partials only. This is the incremental-pipeline contract: at 100 TB
    * the daily pass runs once per day's partition, and any coarser
    * report (week/month/all-time) is a re-aggregation of tiny partial
    * rows with no fact re-scan. Keeping the partial sum in decimal until
    * the final cast makes the merge EXACT, so the rollup is value-
    * identical to a direct weekly aggregation (which is what the oracle
    * computes). */
  def q106PartialAggRollup(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "lineitem")
      .groupBy(to_date(col("l_shipdate")).as("day"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).as("qty_dec"))
    daily
      .groupBy(date_trunc("week", col("day")).cast("date").as("week"),
        col("l_returnflag"))
      .agg(sum(col("n")).as("n"),
        sum(col("qty_dec")).cast("double").as("sum_qty"))
      .orderBy("week", "l_returnflag")
  }

  // --------------------------------------------------------------- q107
  /** Perceptual-hash media dedup (stub decoder —
    * [[Multimodal.decodeSignatures]]; near-dups found by the banded
    * Hamming self-join [[Dedup.hammingBandPairs]] — candidates share a
    * 16-bit band, never an O(n²) cross join), registered as the
    * planted-pair recall envelope; the per-asset report form is
    * [[q107PhashReport]]. */
  def q107PhashNeardup(spark: SparkSession, dir: String): DataFrame = {
    // planted-pair envelope (q40's pattern): 20 byte-identical copies —
    // the canonical perceptual-hash dup, a re-ingested identical asset —
    // hash to the same 64-bit signature, collide in every band and
    // verify at Hamming 0; detection is deterministic (floor 0.9), so
    // the envelope pins the decode→band→verify plumbing. The per-asset
    // report is what the bench times ([[q107PhashReport]]).
    val docs = t(spark, dir, "documents")
    val media = Multimodal.asMediaTable(
      Dedup.plantTextDups(docs, "doc_id", "text", extraToken = None),
      "doc_id", "text", "image/stub")
    val sigs = Multimodal.decodeSignatures(media).toDF()
    Dedup.plantedPairEnvelope(
      Dedup.hammingBandPairs(sigs, "asset_id", "phash", maxHamming = 3)
        .select(col("id_a"), col("id_b")),
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("planted_id")),
      offset = 1000000L, floor = 0.9)
  }

  /** q107's BENCH form: the production per-asset near-dup report. */
  def q107PhashReport(spark: SparkSession, dir: String): DataFrame = {
    val media = Multimodal.asMediaTable(
      t(spark, dir, "documents"), "doc_id", "text", "image/stub")
    val sigs = Multimodal.decodeSignatures(media).toDF()
    val pairs = Dedup.hammingBandPairs(sigs, "asset_id", "phash",
      maxHamming = 3)
    val perAsset = pairs.select(col("id_a").as("asset_id"))
      .unionAll(pairs.select(col("id_b").as("asset_id")))
      .groupBy(col("asset_id")).agg(count(lit(1)).as("n_neardup"))
    sigs.select(col("asset_id"), col("n_bytes"), col("phash"))
      .join(perAsset, Seq("asset_id"), "left")
      .withColumn("n_neardup", coalesce(col("n_neardup"), lit(0L)))
      .orderBy("asset_id")
  }

  // --------------------------------------------------------------- q108
  /** Weight-proportional Bernoulli sampling: each document keeps with
    * probability min(n_chars,499)/500 — longer documents are likelier
    * survivors — decided by comparing an md5-derived hex key against a
    * per-row integer threshold. Pure projection+filter: deterministic
    * across runs, partitionings and engines, no RNG state, no shuffle;
    * the same content always draws the same ticket (re-ingestion cannot
    * double-sample). */
  def q108WeightedSample(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(substring(md5(col("text")), 1, 8) <
        lpad(lower(hex(expr("(least(n_chars, 499) * 4294967296) div 500"))),
          8, "0"))
      .select("doc_id", "lang", "n_chars")
      .orderBy("doc_id")

  // --------------------------------------------------------------- q109
  /** Approximate top-k via the frequent-items sketch (`approx_top_k`),
    * configured so capacity (8192 tracked items) exceeds the supplier
    * cardinality — under capacity the sketch does no eviction, so counts
    * are EXACT and the result is value-identical to the exact group-by
    * (which is the oracle). The 100 TB contract: sketch state is
    * O(capacity) per partition and mergeable, so the full-corpus pass
    * ships KBs per partition; when cardinality exceeds capacity the same
    * query degrades to ±eps counts instead of OOMing — the opposite
    * failure mode of an exact group-by top-k. Deterministic re-rank
    * (count desc, item) happens outside the sketch. */
  def q109ApproxTopk(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .select(expr("approx_top_k(l_suppkey, 4096, 8192)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("l_suppkey"), col("e.count").as("cnt"))
      .orderBy(col("cnt").desc, col("l_suppkey"))
      .limit(10)

  // --------------------------------------------------------------- q116
  /** Tokenizer-vocabulary coverage: per document, the fraction of token
    * OCCURRENCES outside the corpus top-20 vocabulary — the OOV-rate gate
    * every tokenizer/corpus pairing is screened with before training.
    * Vocabulary selection is a deterministic top-k (count desc, token);
    * at scale it fuses to TakeOrderedAndProject and the tiny vocab
    * broadcasts back, so the fact-side pass is scan + broadcast probe. */
  def q116VocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val toks = t(spark, dir, "documents")
      .select(col("doc_id"), explode(wordTokens(col("text"))).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("tok")).limit(20)
      .select(col("tok")).withColumn("in_vocab", lit(1))
    toks.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        coalesce(sum(when(col("in_vocab").isNull, 1L).otherwise(0L)),
          lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        round(col("n_oov").cast("double") / col("n_tokens"), 6))
      .orderBy("doc_id")
  }

  // --------------------------------------------------------------- q117
  /** PCA projection of the embedding corpus onto its top-2 principal
    * components. Three-stage 100 TB shape: (1) ONE moment pass via the
    * mergeable [[graft.functions.EmbeddingMoments]] Aggregator — O(d²)
    * state per partition, map-side combined, row data never shuffles;
    * (2) the d×d eigen problem solves on the DRIVER (power iteration with
    * deflation — d is 64, this is microseconds and needs no cluster);
    * (3) the corpus projects through the eigenvectors as LITERAL arrays —
    * a pure fused projection, zero shuffle, exactly the
    * literal-codebook pattern of [[Similarity]]'s IVF assignment.
    * Floating merge order perturbs last ulps → outputs round to 6
    * decimals; rows-only check, invariants pinned by spec. */
  def q117PcaEmbeddings(spark: SparkSession, dir: String): DataFrame = {
    // envelope registration: raw pc coordinates are eigenvector-sign and
    // float-summation-order dependent, so the oracle-checkable claims
    // are (a) rows + labels pinned value-exact, (b) the projection onto
    // the FIRST component carries at least the second's variance (power
    // iteration orders eigenpairs), (c) Bessel's inequality per row —
    // the two projections never exceed the centered vector's own energy
    // (orthonormal directions; 1e-6 slack covers the 6dp rounding). The
    // raw coordinates stay the API and the benched form
    // ([[q117PcaProjection]]).
    val raw = q117PcaProjection(spark, dir)
    val dim = 64
    val emb = t(spark, dir, "embeddings")
    val spark2 = emb.sparkSession
    import spark2.implicits._
    val state = emb.select(col("embedding").cast("array<double>"))
      .as[Array[Double]]
      .select(new EmbeddingMoments(dim).toColumn)
      .head()
    val mean = state.sums.map(_ / state.n)
    val centered = zip_with(col("embedding").cast("array<double>"),
      org.apache.spark.sql.functions.typedlit(mean.toSeq), (x, m) => x - m)
    val energy = emb.select(col("vec_id"),
      dot(centered, centered).as("energy"))
    val w = Window.partitionBy()
    raw.join(energy, "vec_id")
      .withColumn("var_order_ok",
        variance(col("pc1")).over(w) >= variance(col("pc2")).over(w))
      .select(col("vec_id"), col("label"), col("var_order_ok"),
        // slack scales with the coordinates: pc1/pc2 are rounded to 6dp,
        // so pc1²+pc2² carries ~2(|pc1|+|pc2|)·5e-7 of rounding error —
        // a fixed 1e-6 would flip the boolean once |pc| > ~1
        (col("pc1") * col("pc1") + col("pc2") * col("pc2") <=
          col("energy") + lit(1e-6) +
          lit(2e-6) * (abs(col("pc1")) + abs(col("pc2")))).as("bessel_ok"))
      .orderBy("vec_id")
  }

  /** q117's BENCH form: the raw 2-component projection. */
  def q117PcaProjection(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions.typedlit
    val dim = 64
    val emb = t(spark, dir, "embeddings")
    val spark2 = emb.sparkSession
    import spark2.implicits._
    val state = emb.select(col("embedding").cast("array<double>"))
      .as[Array[Double]]
      .select(new EmbeddingMoments(dim).toColumn)
      .head()
    val cov = EmbeddingMoments.covariance(state, dim)
    val mean = state.sums.map(_ / state.n)
    val eig = EmbeddingMoments.topEigenvectors(cov, k = 2)
    val centered = zip_with(col("embedding").cast("array<double>"),
      typedlit(mean.toSeq), (x, m) => x - m)
    emb.select(col("vec_id"), col("label"),
        round(dot(centered, typedlit(eig(0)._2.toSeq)), 6).as("pc1"),
        round(dot(centered, typedlit(eig(1)._2.toSeq)), 6).as("pc2"))
      .orderBy("vec_id")
  }

  // --------------------------------------------------------------- q121
  /** Theta-sketch audience set algebra: per event-type pair, the distinct-
    * user counts of each side plus their intersection, union and Jaccard,
    * computed entirely over KB-sized theta sketches — the sketch family
    * whose defining power over HLL is INTERSECTION/DIFFERENCE, i.e.
    * audience-overlap questions without re-scanning facts. One fact pass
    * builds a mergeable sketch per type; all pairwise set algebra runs on
    * the 5-row sketch frame. lgNomEntries=16 (65k retained hashes) keeps
    * the sketches in exact mode at every test SF, so estimates are exact
    * distinct counts and the DuckDB oracle can verify them value-for-value
    * (at production cardinalities the same query degrades gracefully to
    * ±1.6% estimates instead of a quadratic distinct join). */
  def q121ThetaAudienceOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sk = t(spark, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr("theta_sketch_agg(user_id, 16)").as("sk"))
    val a = sk.select(col("event_type").as("type_a"), col("sk").as("sk_a"))
    val b = sk.select(col("event_type").as("type_b"), col("sk").as("sk_b"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        expr("theta_sketch_estimate(sk_a)").cast("long").as("n_a"),
        expr("theta_sketch_estimate(sk_b)").cast("long").as("n_b"),
        expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
          .cast("long").as("n_intersection"),
        expr("theta_sketch_estimate(theta_union(sk_a, sk_b))")
          .cast("long").as("n_union"))
      .withColumn("jaccard",
        round(col("n_intersection").cast("double") /
          col("n_union").cast("double"), 6))
      .orderBy("type_a", "type_b")
  }

  // --------------------------------------------------------------- q122
  /** KLL-sketch quantile bands with a merge rollup: per-returnflag price
    * quantiles from one KLL sketch per group, plus an 'ALL' row whose
    * quantiles come from MERGING the group sketches — no second fact
    * scan. This is the streaming/partitioned-quantile contract at 100 TB:
    * per-partition sketches are O(k log n) and mergeable, so any rollup
    * level is sketch algebra, while exact percentile (q59) ships every
    * distinct value per group. KLL compaction is randomized → estimates
    * carry rank error (±~1.7% at default k) and vary run-to-run within
    * it, so the RAW estimates cannot be oracle-pinned; the entry emits
    * the q93/q70 envelope form instead — per band, a boolean that the
    * KLL estimate landed between audit percentiles at q ± 0.05 (≈3× the
    * sketch's 99%-confidence rank error; crossing it is a vanishing-
    * tail event) — which the oracle expects TRUE, for the per-group
    * rows AND the merged-rollup 'ALL' row. */
  def q122KllQuantileBands(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val perFlag = li
      .groupBy(col("l_returnflag"))
      .agg(expr("kll_sketch_agg_double(l_extendedprice)").as("sk"))
    val rows = perFlag.select(col("l_returnflag"),
      expr("kll_sketch_get_quantile_double(sk, array(0.25D, 0.5D, 0.75D))")
        .as("q"))
    // kll_sketch_merge_double is a pairwise scalar — fold the (3-element)
    // group-sketch list in-plan; no fact re-scan, no driver collect
    val all = perFlag
      .agg(collect_list(col("sk")).as("sks"))
      .select(lit("ALL").as("l_returnflag"),
        expr("kll_sketch_get_quantile_double(" +
          "aggregate(slice(sks, 2, size(sks) - 1), sks[0], " +
          "(acc, x) -> kll_sketch_merge_double(acc, x)), " +
          "array(0.25D, 0.5D, 0.75D))").as("q"))
    val bands = rows.unionByName(all)
      .select(col("l_returnflag"), col("q")(0).as("p25"),
        col("q")(1).as("p50"), col("q")(2).as("p75"))
    // q±0.05 audit bounds per group and for the whole table. The bounds
    // come from the DETERMINISTIC high-accuracy GK sketch (rank error
    // 1/10000 — two orders below the 0.05 margin it guards), not exact
    // `percentile`: the exact form ships every value per group through
    // the aggregate and measured 2.5× the whole query. The audit margin
    // absorbs both error terms with room to spare.
    val bExpr = "approx_percentile(cast(l_extendedprice as double), " +
      "array(0.20, 0.30, 0.45, 0.55, 0.70, 0.80), 10000)"
    val bounds = li.groupBy(col("l_returnflag")).agg(expr(bExpr).as("b"))
      .unionByName(li.agg(expr(bExpr).as("b"))
        .select(lit("ALL").as("l_returnflag"), col("b")))
    bands.join(bounds, "l_returnflag")
      .select(col("l_returnflag"),
        col("p25").between(col("b")(0), col("b")(1)).as("p25_ok"),
        col("p50").between(col("b")(2), col("b")(3)).as("p50_ok"),
        col("p75").between(col("b")(4), col("b")(5)).as("p75_ok"))
      .orderBy("l_returnflag")
  }

  // --------------------------------------------------------------- q125
  /** Rolling 7-day distinct users from mergeable per-day theta sketches.
    * The naive formulation — `COUNT(DISTINCT user) OVER (RANGE 6 DAYS
    * PRECEDING)` — re-processes every fact row once per window it falls
    * in (7× fact volume through a distinct-capable window state); at
    * 100 TB that is the canonical rolling-distinct trap. Here the fact
    * table is touched ONCE to build a KB-sized theta sketch per day
    * (map-side partials, one exchange of |days| rows); the rolling union
    * then runs entirely on the tiny day-sketch frame — a |days|×7
    * self-join of KB payloads, `theta_union_agg` per window. Any other
    * window length is the same sketch algebra with no fact re-scan.
    * lgNomEntries=16 keeps the sketches in exact mode at every test SF
    * (max 7-day distinct at sf1 is ~15k < 65k retained hashes), so the
    * DuckDB oracle verifies both counts value-for-value; at production
    * cardinality the identical plan degrades gracefully to ±1.6%
    * estimates. The first six days report their clipped (shorter)
    * window, mirrored in the oracle. */
  def q125RollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val daySk = t(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(expr("theta_sketch_agg(user_id, 16)").as("sk"))
    val a = daySk.select(col("day"),
      expr("theta_sketch_estimate(sk)").cast("long").as("n_day"))
    val b = daySk.select(col("day").as("day_b"), col("sk"))
    a.join(b, col("day_b").between(date_sub(col("day"), 6), col("day")))
      .groupBy(col("day"), col("n_day"))
      .agg(expr("theta_sketch_estimate(theta_union_agg(sk, 16))")
        .cast("long").as("n_7d"))
      .orderBy("day")
  }

  // --------------------------------------------------------------- q126
  /** Token co-occurrence PMI over a bounded vocabulary — the association
    * score behind collocation mining and topic drift checks on a training
    * corpus. Unbounded pairwise co-occurrence is |vocab|² state (hopeless
    * at web scale, where vocab is tens of millions); capping to the top-K
    * document-frequency vocabulary bounds per-document pair expansion at
    * K(K-1)/2 regardless of corpus size. Two passes, the standard
    * fit/score split: pass 1 fits the vocabulary (one token-df aggregate,
    * top-K collected — the same KB-sized fitted-model collect as the IVF
    * codebook, `Similarity.scala`); pass 2 re-scans documents with the
    * vocab as a LITERAL array + df map (broadcast in the truest sense:
    * baked into the codegen'd plan, zero join, zero shuffle on the probe
    * side), expands per-document sorted vocab-token pairs with
    * index-aware HOFs, and pays ONE shuffle — the pair-count aggregate,
    * ≤ K²/2 groups. PMI = ln(P(a,b)/(P(a)P(b))) at 6 dp (cross-engine-
    * safe per the q85 ln+round precedent); n_ab ≥ 5 floors the support. */
  def q126PmiCooccur(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    val vocabK = 40
    // fit: top-K tokens by document frequency (ties broken by token)
    val fitted = docs
      .select(explode(array_distinct(wordTokens(col("text")))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok")).limit(vocabK)
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val nDocs = docs.count()
    val vocabArr = typedlit(fitted.map(_._1).sorted.toSeq)
    val dfMap = typedlit(fitted.toMap)
    // score: per-doc vocab-token pairs via index HOFs — no vocab join.
    // tks is projected to an ATTRIBUTE first: referencing the tokenize+
    // intersect EXPRESSION from inside each lambda would re-evaluate it
    // per reference (no CSE across HOF boundaries — measured 3.7× slower)
    val tks = col("tks")
    val pairs = transform(tks, (x, i) => transform(
      slice(tks, i + lit(2), greatest(size(tks) - i - lit(1), lit(0))),
      y => struct(x.as("tok_a"), y.as("tok_b"))))
    docs
      .select(sort_array(array_intersect(
        array_distinct(wordTokens(col("text"))), vocabArr)).as("tks"))
      .select(explode(flatten(pairs)).as("p"))
      .groupBy(col("p.tok_a").as("tok_a"), col("p.tok_b").as("tok_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 5)
      .select(col("tok_a"), col("tok_b"), col("n_ab"),
        round(log(col("n_ab").cast("double") * nDocs /
          (element_at(dfMap, col("tok_a")).cast("double") *
            element_at(dfMap, col("tok_b")))), 6).as("pmi"))
      .orderBy("tok_a", "tok_b")
  }

  // --------------------------------------------------------------- q134
  /** Per-source KL divergence from the corpus unigram distribution —
    * the domain-similarity score a corpus-mixing pipeline uses to weight
    * (or flag) sources before training: KL(source ‖ corpus) = Σ_w
    * p_s(w)·ln(p_s(w)/p_c(w)), low = representative, high = outlier
    * domain. Every source word is by construction in the corpus
    * distribution (the corpus is the union of sources), so the
    * divergence is finite with no smoothing and the formula is exact.
    *
    * Scale shape: ONE tokenize pass builds the (source, token) count
    * frame (map-side combine on the explode); source totals, token
    * totals, and the corpus total are all RE-AGGREGATED from that frame
    * — the document table is scanned exactly once and nothing
    * document-sized crosses a shuffle twice. The token-total rejoin is
    * vocab-keyed; source totals (|sources| rows) and the 1-row corpus
    * total broadcast. Per-term contributions sum as DECIMAL(28,12)
    * (order-free) with the double tree mirrored in the oracle, so the
    * divergence is hash-exact. */
  def sourceKl(docs: DataFrame, srcCol: String, textCol: String): DataFrame = {
    // localCheckpoint materializes the (source, token) count frame —
    // |sources|·|vocab| rows, orders of magnitude below the corpus — so
    // the three derived totals and the final join all reuse ONE
    // tokenize pass (plan-asserted; without it each total re-tokenizes)
    val st = docs
      .select(col(srcCol).as("source"),
        explode(wordTokens(col(textCol))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val srcTot = st.groupBy(col("source")).agg(sum(col("cnt")).as("s_tot"))
    val tokTot = st.groupBy(col("tok")).agg(sum(col("cnt")).as("t_tot"))
    val corpTot = srcTot.agg(sum(col("s_tot")).as("c_tot"))
    val ps = col("cnt").cast("double") / col("s_tot").cast("double")
    val pc = col("t_tot").cast("double") / col("c_tot").cast("double")
    st.join(tokTot, "tok")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(corpTot))
      .groupBy(col("source"), col("s_tot"))
      .agg(count(lit(1)).as("vocab"),
        round(sum((ps * log(ps / pc)).cast("decimal(28,12)"))
          .cast("double"), 6).as("kl_div"))
      .select(col("source"), col("s_tot").as("n_tokens"),
        col("vocab"), col("kl_div"))
      .orderBy("source")
  }

  /** q134 entry: per-source divergence over the documents table. */
  def q134SourceKl(spark: SparkSession, dir: String): DataFrame =
    sourceKl(t(spark, dir, "documents"), "source", "text")

  // --------------------------------------------------------------- q144
  /** Pairwise source vocabulary overlap: Jaccard similarity between every
    * pair of sources' word-unigram vocabularies — the "which domains are
    * lexically close" matrix a corpus-mixing pipeline reads next to
    * [[sourceKl]]'s per-source divergence (KL says how far a source sits
    * from the MIX; this says which sources sit near EACH OTHER, i.e.
    * which are redundant to up-weight together).
    *
    * Scale shape: ONE tokenize pass reduces the corpus to the distinct
    * (source, token) frame — bounded by |sources|·|vocab|, orders of
    * magnitude below the corpus. The pair join is token-keyed on that
    * frame (each token contributes its source list, so the join output
    * is Σ_tok pairs(tok) ≤ |vocab|·|sources|²/2 — dimension-sized, never
    * corpus-sized); per-source vocabulary sizes re-aggregate from the
    * same frame and broadcast back. Counts are integers; the Jaccard
    * divides them in double (identical IEEE op both engines) and rounds
    * to 6 dp at output. */
  def sourceOverlap(docs: DataFrame, srcCol: String,
                    textCol: String): DataFrame = {
    val st = docs
      .select(col(srcCol).as("source"),
        explode(wordTokens(col(textCol))).as("tok"))
      .distinct()
      .localCheckpoint()
    val vocab = st.groupBy(col("source")).agg(count(lit(1)).as("v"))
    val common = st.as("a").join(st.as("b"),
        col("a.tok") === col("b.tok") &&
          col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"),
        col("b.source").as("source_b"))
      .agg(count(lit(1)).as("common"))
    common
      .join(broadcast(vocab.select(col("source").as("source_a"),
        col("v").as("v_a"))), "source_a")
      .join(broadcast(vocab.select(col("source").as("source_b"),
        col("v").as("v_b"))), "source_b")
      .select(col("source_a"), col("source_b"), col("common"),
        round(col("common").cast("double") /
          (col("v_a") + col("v_b") - col("common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy("source_a", "source_b")
  }

  /** q144 entry: the 20×20 source lexical-overlap matrix (upper
    * triangle). */
  def q144SourceOverlap(spark: SparkSession, dir: String): DataFrame =
    sourceOverlap(t(spark, dir, "documents"), "source", "text")

  // --------------------------------------------------------------- q145
  /** Per-dimension embedding standardization (z-score): every component
    * rescaled to zero mean / unit variance over the corpus — the feature-
    * prep step before k-means or PCA when dimensions carry different
    * scales. Output is the long form (vec_id, pos, z): totally ordered
    * and scalar-typed, so the driver's sort-based compare can hash it.
    *
    * Scale shape: ONE posexplode pass; the per-dimension moment frame is
    * |dim| rows (each a map-side-combined aggregate) and broadcasts back
    * into a second scan — normalization itself is embarrassingly
    * parallel, nothing vector-sized shuffles.
    *
    * Cross-engine determinism: component sums and squared-component sums
    * run as DECIMAL(28,12) of bit-identical doubles (float widening and
    * the x·x product are exact IEEE ops), so the moments are order-free;
    * mean/variance/σ then evaluate in a mirrored double tree (sqrt is
    * correctly rounded per IEEE in both engines) and z rounds to 6 dp at
    * output. Zero-variance dimensions map to z = 0 in both engines. */
  def standardizeEmbeddings(emb: DataFrame, idCol: String,
                            embCol: String): DataFrame = {
    val comps = emb.select(col(idCol),
      posexplode(col(embCol).cast("array<double>")).as(Seq("pos", "x")))
    val moments = comps.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,12)")).as("s"),
        sum((col("x") * col("x")).cast("decimal(28,12)")).as("sq"))
      .select(col("pos"),
        (col("s").cast("double") / col("n").cast("double")).as("m"),
        sqrt((col("sq").cast("double") / col("n").cast("double")) -
          (col("s").cast("double") / col("n").cast("double")) *
            (col("s").cast("double") / col("n").cast("double"))).as("sd"))
    comps.join(broadcast(moments), "pos")
      .select(col(idCol), col("pos").cast("long").as("pos"),
        round(when(col("sd") === 0.0, lit(0.0))
          .otherwise((col("x") - col("m")) / col("sd")), 6).as("z"))
      .orderBy(idCol, "pos")
  }

  /** q145 entry: standardized embedding components, long form. */
  def q145EmbeddingStandardize(spark: SparkSession, dir: String): DataFrame =
    standardizeEmbeddings(t(spark, dir, "embeddings"), "vec_id", "embedding")

  // --------------------------------------------------------------- q155
  /** Per-vector anomaly score: diagonal-covariance Mahalanobis distance²
    * — Σ_dims z², the standard "does this embedding sit inside the
    * corpus distribution" gate that catches encoder failures, empty
    * inputs, and domain outliers before ANN indexing or SemDeDup trusts
    * the vectors. Under an in-distribution assumption the score is
    * ~χ²(dims), so the flag threshold is `flagSigma²·dims` (mean z² per
    * dim above flagSigma²).
    *
    * Scale shape: [[standardizeEmbeddings]]'s exact-moment pass — one
    * posexplode with decimal-summed per-dim moments, a 64-row stats
    * broadcast — followed by a vec-keyed fold of decimal-rounded z²
    * terms (order-free Σ). Nothing embedding-sized shuffles twice. */
  def embeddingOutliers(emb: DataFrame, idCol: String, embCol: String,
                        flagSigma2: Double = 2.0): DataFrame = {
    val comps = emb.select(col(idCol),
      posexplode(col(embCol).cast("array<double>")).as(Seq("pos", "x")))
    val moments = comps.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(28,12)")).as("s"),
        sum((col("x") * col("x")).cast("decimal(28,12)")).as("sq"))
      .select(col("pos"),
        (col("s").cast("double") / col("n").cast("double")).as("m"),
        sqrt((col("sq").cast("double") / col("n").cast("double")) -
          (col("s").cast("double") / col("n").cast("double")) *
            (col("s").cast("double") / col("n").cast("double"))).as("sd"))
    val z = when(col("sd") === 0.0, lit(0.0))
      .otherwise((col("x") - col("m")) / col("sd"))
    comps.join(broadcast(moments), "pos")
      .select(col(idCol), (z * z).cast("decimal(28,12)").as("z2"),
        col("pos"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("dims"),
        round(sum(col("z2")).cast("double"), 6).as("maha2"))
      .withColumn("is_outlier",
        col("maha2") > col("dims").cast("double") * flagSigma2)
  }

  /** q155 entry: embedding distribution outliers over `embeddings`. */
  def q155EmbeddingOutliers(spark: SparkSession, dir: String): DataFrame =
    embeddingOutliers(t(spark, dir, "embeddings"), "vec_id", "embedding")
      .orderBy("vec_id")

  // --------------------------------------------------------------- q141
  /** DSIR-style importance weight (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS 2023 — public
    * method): score every document by how target-like its hashed-unigram
    * distribution is, the per-token log-likelihood ratio
    * (1/n)·Σ_w [ln p_target(h(w)) − ln p_corpus(h(w))] under
    * add-one-smoothed bag-of-hashed-unigram models. High weight = looks
    * like the target slice; a selection pipeline resamples the raw
    * corpus proportionally to exp(weight·n) or thresholds the weight.
    *
    * Scale shape: hashing words into a FIXED `buckets`-bucket feature
    * space bounds the model frame regardless of corpus vocabulary — the
    * point of hashed features. ONE tokenize pass with a conditional
    * aggregate builds (bucket, c_corpus, c_target); the grand totals
    * re-aggregate from that checkpointed frame; the ≤`buckets`-row LLR
    * model broadcasts into the scoring scan. Nothing document-sized
    * shuffles: scoring is a broadcast probe + doc-keyed aggregate.
    *
    * Cross-engine determinism: bucket = first 4 hex digits of md5(token)
    * (the q52 md5-prefix precedent) mod `buckets` — integer-exact in any
    * engine; counts/totals are integers; the two ln terms are computed
    * on identical doubles, per-token LLRs sum as DECIMAL(28,12)
    * (order-free), and the per-token mean rounds to 6 dp at output per
    * the q126/q134 ln precedent. */
  def dsirWeights(docs: DataFrame, isTarget: Column, textCol: String,
                  buckets: Int = 4096): DataFrame = {
    val tok = docs
      .select(col("doc_id"), isTarget.as("is_t"),
        explode(wordTokens(col(textCol))).as("tok"))
      .withColumn("bucket",
        conv(substring(md5(col("tok")), 1, 4), 16, 10).cast("long")
          % buckets)
    // ≤`buckets` rows after one tokenize pass; checkpointed so the grand
    // totals and the LLR projection reuse it instead of re-tokenizing
    val counts = tok.groupBy(col("bucket"))
      .agg(count(lit(1)).as("c_all"),
        count(when(col("is_t"), 1)).as("c_t"))
      .localCheckpoint()
    val tot = counts.agg(sum(col("c_all")).as("n_all"),
      sum(col("c_t")).as("n_t"))
    val llr = counts.crossJoin(broadcast(tot))
      .select(col("bucket"),
        (log((col("c_t") + lit(1)).cast("double") /
            (col("n_t") + lit(buckets)).cast("double")) -
          log((col("c_all") + lit(1)).cast("double") /
            (col("n_all") + lit(buckets)).cast("double"))).as("llr"))
    tok.join(broadcast(llr), "bucket")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("llr").cast("decimal(28,12)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("weight"))
      .orderBy("doc_id")
  }

  /** q141 entry: weight every document toward the English slice — the
    * "select docs that look like the curated target" scorer. */
  def q141DsirWeights(spark: SparkSession, dir: String): DataFrame =
    dsirWeights(t(spark, dir, "documents"), col("lang") === "en", "text")

  // --------------------------------------------------------------- q130
  /** Weighted PageRank by power iteration, fully distributed: ranks stay
    * a DataFrame end-to-end, each iteration is one broadcast join of the
    * KB rank frame into the (huge, partitioned) edge table plus a
    * dst-keyed aggregate — the shape that holds when the graph has 10⁹
    * nodes and the rank frame itself no longer fits anywhere. Dangling
    * mass (nodes without out-edges) is redistributed per the standard
    * formulation, computed in-plan via an anti-join + 1-row cross join.
    * `localCheckpoint` after each iteration caps the lineage at one
    * round (10 chained iterations would otherwise compound into one
    * giant re-derived DAG).
    *
    * Cross-engine determinism: every Σ(p·r) and the dangling Σr are
    * summed as DECIMAL(28,12) — exact, order-free — then cast back; all
    * remaining arithmetic is a fixed expression tree the oracle mirrors
    * shape-for-shape ((1−d)/n, d·(s+dang/n)), so both engines do the
    * same IEEE ops in the same order. Ranks round to 6 dp only at
    * output. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, damping: Double = 0.85,
               iters: Int = 10, driverMaxEdges: Long = 100000): DataFrame = {
    val outTot = edges.groupBy(col(srcCol).as("src"))
      .agg(sum(col(weightCol)).as("out"))
    val p = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(weightCol).as("w"))
      .join(outTot, "src")
      .select(col("src"), col("dst"),
        (col("w").cast("double") / col("out").cast("double")).as("p"))
      .persist()
    val nodes = p.select(col("src").as("node"))
      .union(p.select(col("dst"))).distinct().persist()
    val srcs = p.select(col("src")).distinct()
    val n = nodes.count()
    if (p.count() <= driverMaxEdges) pageRankLocal(p, nodes, n, damping,
      iters)
    else pageRankDistributed(p, nodes, srcs, n, damping, iters)
  }

  /** Fast path for dimension-sized graphs (event types, categories —
    * the q80-deciles contract): the probability matrix collects once
    * (bounded by `driverMaxEdges`) and the power iteration runs on the
    * driver — zero per-iteration job scheduling, which dominates the
    * distributed loop's wall clock when the rank frame is KB-sized.
    * Arithmetic mirrors the distributed path operation-for-operation
    * (BigDecimal.valueOf = Spark's double→decimal cast, exact scale-12
    * sums, the same IEEE update tree), so the two paths are spec-pinned
    * bit-equal. */
  private def pageRankLocal(p: DataFrame, nodes: DataFrame, n: Long,
                            damping: Double, iters: Int): DataFrame = {
    import java.math.{BigDecimal => JBD, RoundingMode}
    def dec12(d: Double): JBD = JBD.valueOf(d).setScale(12,
      RoundingMode.HALF_UP)
    val nodeRows = nodes.collect()
    val edgeArr = p.collect().map(r => (r.get(0), r.get(1), r.getDouble(2)))
    val srcSet = edgeArr.map(_._1).toSet
    var r: Map[Any, Double] =
      nodeRows.map(_.get(0) -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val acc = scala.collection.mutable.Map.empty[Any, JBD]
      edgeArr.foreach { case (s, d, pv) =>
        acc(d) = acc.getOrElse(d, JBD.ZERO).add(dec12(pv * r(s)))
      }
      val dang = nodeRows.iterator.map(_.get(0)).filterNot(srcSet)
        .foldLeft(JBD.ZERO)((a, node) => a.add(dec12(r(node))))
        .doubleValue()
      r = nodeRows.map { row =>
        val node = row.get(0)
        val s = acc.get(node).map(_.doubleValue()).getOrElse(0.0)
        node -> ((1.0 - damping) / n + damping * (s + dang / n))
      }.toMap
    }
    val spark = nodes.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      nodes.schema.head.copy(name = "node"),
      org.apache.spark.sql.types.StructField("r",
        org.apache.spark.sql.types.DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        nodeRows.toSeq.map(row =>
          org.apache.spark.sql.Row(row.get(0), r(row.get(0)))), 1),
      schema)
  }

  /** General path: ranks stay a DataFrame; one broadcast join of the rank
    * frame into the (partitioned, arbitrarily large) edge table plus a
    * dst-keyed aggregate per iteration; localCheckpoint caps lineage at
    * one round. */
  private def pageRankDistributed(p: DataFrame, nodes: DataFrame,
                                  srcs: DataFrame, n: Long, damping: Double,
                                  iters: Int): DataFrame = {
    val dec = "decimal(28,12)"
    var r = nodes.select(col("node"), (lit(1.0) / lit(n)).as("r"))
    for (_ <- 1 to iters) {
      val contrib = p.join(broadcast(r), col("src") === col("node"))
        .groupBy(col("dst"))
        .agg(sum((col("p") * col("r")).cast(dec)).cast("double").as("s"))
      val dang = r.join(broadcast(srcs), col("node") === col("src"),
          "left_anti")
        .agg(coalesce(sum(col("r").cast(dec)), lit(0).cast(dec))
          .cast("double").as("dang"))
      r = nodes
        .join(contrib, col("node") === col("dst"), "left")
        .crossJoin(broadcast(dang))
        .select(col("node"),
          (lit(1.0 - damping) / lit(n) + lit(damping) *
            (coalesce(col("s"), lit(0.0)) + col("dang") / lit(n)))
            .as("r"))
        .localCheckpoint()
    }
    r
  }

  /** PageRank over the event-type transition graph: edges = consecutive
    * same-user event pairs (the q102 derivation — the fact-table-sized,
    * genuinely distributed part of the job), ranks by power iteration
    * over the resulting weighted graph. Stationary importance of each
    * event type under the empirical click model. */
  def q130EventPagerank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val edges = t(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("dst_t"))
      .withColumn("src_t", lag(col("dst_t"), 1).over(w))
      .filter(col("src_t").isNotNull)
      .groupBy(col("src_t"), col("dst_t"))
      .agg(count(lit(1)).as("cnt"))
    pageRank(edges, "src_t", "dst_t", "cnt")
      .select(col("node").as("event_type"), round(col("r"), 6).as("rank"))
      .orderBy("event_type")
  }

  // --------------------------------------------------------------- q173
  /** Count-Min counter frame: the CMS counter table as PLAIN aggregated
    * rows — (hash-row d, bucket j, count). Buckets come from md5 (first
    * 8 hex chars mod `width`, one salt per depth row), so the sketch is
    * engine-portable and the DuckDB oracle reproduces it counter for
    * counter — unlike Spark's `count_min_sketch` binary (q100), which is
    * write-only to other engines. One pass: the depth replication is a
    * projection-side explode (Spark's own multi-distinct Expand shape),
    * then a (d, j) hash aggregate with map-side combine — at most
    * depth·width rows survive regardless of input size. */
  def cmsCounterFrame(df: DataFrame, key: Column, depth: Int,
                      width: Int): DataFrame = {
    val rows = (0 until depth).map { d =>
      struct(lit(d).as("d"),
        (conv(substring(md5(concat_ws(":", lit(d.toString),
          key.cast("string"))), 1, 8), 16, 10)
          .cast("long") % width).as("j"))
    }
    df.select(explode(array(rows: _*)).as("e"))
      .groupBy(col("e.d").as("d"), col("e.j").as("j"))
      .agg(count(lit(1)).as("c"))
  }

  /** Join-size estimation via the CMS inner product (AMS-style): the
    * estimated size of `a ⋈ b` on a key is min over hash rows d of
    * Σ_j cmsA[d][j]·cmsB[d][j] — the classic sketch a planner consults
    * BEFORE committing to a join order, because it needs one cheap pass
    * per side instead of the join itself. Never under-estimates (counters
    * are non-negative; collisions only add), so `ok` = est ≥ exact is an
    * invariant, and the exact size is computed alongside as the in-query
    * ground truth (the validate-your-sketch-config pattern, q100).
    *
    * Scale shape: each side is one sketch pass (≤ depth·width surviving
    * rows); the inner product joins the two SKETCH frames on (d, j).
    * The exact half joins per-key COUNT frames — |keys| rows, not facts.
    * At 100 TB only the sketches cross the wire; the exact half is the
    * test-harness validation, dropped in production use. */
  def joinSizeEstimate(a: DataFrame, aKey: Column, b: DataFrame,
                       bKey: Column, depth: Int = 5,
                       width: Int = 8192): DataFrame = {
    val ca = cmsCounterFrame(a, aKey, depth, width)
      .withColumnRenamed("c", "c1")
    val cb = cmsCounterFrame(b, bKey, depth, width)
      .withColumnRenamed("c", "c2")
    val dots = ca.join(cb, Seq("d", "j"))
      .groupBy(col("d")).agg(sum(col("c1") * col("c2")).as("dot"))
    // a hash row whose buckets never overlap has inner product 0 — it
    // must stay in the min (an inner-join-only min would silently drop
    // the tightest row and report the min of the OTHER rows)
    val depths = a.sparkSession.range(depth)
      .select(col("id").cast("int").as("d"))
    val est = depths.join(dots, Seq("d"), "left")
      .agg(min(coalesce(col("dot"), lit(0L))).as("cms_est"))
    val xa = a.select(aKey.as("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("ka"))
    val xb = b.select(bKey.as("k")).groupBy(col("k"))
      .agg(count(lit(1)).as("kb"))
    val ex = xa.join(xb, "k")
      .agg(coalesce(sum(col("ka") * col("kb")), lit(0L)).as("exact_size"))
    ex.crossJoin(est)
      .select(col("exact_size"), col("cms_est"),
        (col("cms_est") - col("exact_size")).as("over_count"),
        when(col("exact_size") > 0,
          round((col("cms_est") - col("exact_size")).cast("double") /
            col("exact_size"), 6)).as("rel_err"),
        (col("cms_est") >= col("exact_size")).as("ok"))
  }

  /** q173 entry: estimated vs exact size of events ⋈ orders on
    * user/customer key. */
  def q173JoinsizeEstimate(spark: SparkSession, dir: String): DataFrame =
    joinSizeEstimate(t(spark, dir, "events"), col("user_id"),
      t(spark, dir, "orders"), col("o_custkey"))

  // --------------------------------------------------------------- q187
  /** Triangle census of the co-purchase graph: parts are nodes, an edge
    * connects parts co-ordered in ≥ `minSupport` distinct orders, and
    * the report is the global triangle count plus the transitivity ratio
    * 3·triangles/wedges — the one-number answer to "does co-purchase
    * cluster into communities or is it hub-and-spoke?".
    *
    * Scale shape: the classic degree-ordered orientation (MapReduce
    * triangle counting, Suri & Vassilvitskii WWW'11): every undirected
    * edge points from its lower-(degree, id) endpoint to the higher, so
    * a node's out-degree is O(√m) and the wedge self-join generates
    * Σ d_out² = O(m^1.5) candidates WORST-case instead of Σ d² (a hub
    * with degree h spawns h²/2 wedges unoriented but ≤ 2m oriented).
    * Pair fan-out per order is C(lines,2) ≤ 21 — bounded by the order,
    * never a cross product. Three equi-joins total; the closing-edge
    * probe is a LEFT SEMI join.
    *
    * Determinism: pure integer counts; the transitivity divide is the
    * single double op, mirrored in the oracle — which counts triangles
    * by the INDEPENDENT a<b<c triple-join formulation, so the oracle
    * also proves the orientation argument. */
  def triangleCensus(lineitem: DataFrame, minSupport: Int = 2): DataFrame = {
    val inc = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = inc
      .join(inc.withColumnRenamed("pk", "pk2"), "ok")
      .filter(col("pk") < col("pk2"))
      .groupBy(col("pk").as("u"), col("pk2").as("v"))
      .agg(count(lit(1)).as("w"))
      .filter(col("w") >= minSupport)
      .select(col("u"), col("v"))
    val deg = e.select(col("u").as("x"))
      .unionAll(e.select(col("v").as("x")))
      .groupBy(col("x")).agg(count(lit(1)).as("d"))
    val ed = e
      .join(deg.select(col("x").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("x").as("v"), col("d").as("dv")), "v")
    // orient toward the higher-(degree, id) endpoint; carry the head's
    // degree so wedge pairs can be ordered by the SAME relation
    val fwd = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val or = ed.select(
      when(fwd, col("u")).otherwise(col("v")).as("s"),
      when(fwd, col("v")).otherwise(col("u")).as("t"),
      when(fwd, col("dv")).otherwise(col("du")).as("dt"))
    val tri = or.select(col("s"), col("t").as("t1"), col("dt").as("d1"))
      .join(or.select(col("s"), col("t").as("t2"), col("dt").as("d2")),
        "s")
      .filter(col("d1") < col("d2") ||
        (col("d1") === col("d2") && col("t1") < col("t2")))
      .join(or.select(col("s").as("t1"), col("t").as("t2")),
        Seq("t1", "t2"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val nodes = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(d * (d - 1) div 2)").as("n_wedges"))
    val edges = e.agg(count(lit(1)).as("n_edges"))
    nodes.crossJoin(broadcast(edges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("transitivity"))
  }

  def q187TriangleCensus(spark: SparkSession, dir: String): DataFrame =
    triangleCensus(t(spark, dir, "lineitem"))

  // --------------------------------------------------------------- q191
  /** Markov next-event baseline, evaluated honestly: users split
    * train/eval by a deterministic hash, the per-state argmax of the
    * TRAIN transition counts becomes the predictor, and the report is
    * top-1 accuracy per source state on EVAL transitions only — the
    * train/eval discipline every "can we predict the next action"
    * question needs before anyone reaches for a model (this baseline is
    * what the model must beat).
    *
    * Scale shape: one user-keyed exchange builds consecutive pairs (the
    * q102 window); the model lives on the |types|²-row frame (its argmax
    * window is domain-bounded) and BROADCASTS into the eval side; the
    * final rollup groups by |types| keys. No second fact shuffle.
    *
    * Determinism: the 75% split is an md5-prefix compare ('c0000000' =
    * 0.75·16⁸); argmax ties break by smallest successor name; counts
    * exact, one divide per row. */
  def markovHoldout(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("to_type"))
      .withColumn("from_type", lag(col("to_type"), 1).over(w))
      .filter(col("from_type").isNotNull)
      .withColumn("is_train",
        substring(md5(concat(lit("mk:"), col("user_id").cast("string"))),
          1, 8) < lit("c0000000"))
    val model = pairs.filter(col("is_train"))
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
    val best = model
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("from_type"))
        .orderBy(col("n").desc, col("to_type").asc)))
      .filter(col("rn") === 1)
      .select(col("from_type"), col("to_type").as("predicted"))
    pairs.filter(!col("is_train"))
      .join(broadcast(best), Seq("from_type"), "left")
      .groupBy(col("from_type"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("to_type") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .withColumn("accuracy",
        round(col("n_correct").cast("double") / col("n_pairs"), 6))
      .orderBy("from_type")
  }

  def q191MarkovHoldout(spark: SparkSession, dir: String): DataFrame =
    markovHoldout(t(spark, dir, "events"))

  // ------------------------------------------------------------ registry

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q191_markov_holdout" -> q191MarkovHoldout _,
    "q187_triangle_census" -> q187TriangleCensus _,
    "q173_joinsize_estimate" -> q173JoinsizeEstimate _,
    "q100_cms_heavy_hitters" -> q100CmsHeavyHitters _,
    "q101_bigram_familiarity" -> q101BigramFamiliarity _,
    "q102_event_transitions" -> q102EventTransitions _,
    "q103_mad_outliers" -> q103MadOutliers _,
    "q104_winsorize" -> q104Winsorize _,
    "q105_tombstone_cascade" -> q105TombstoneCascade _,
    "q106_partial_agg_rollup" -> q106PartialAggRollup _,
    "q107_phash_neardup" -> q107PhashNeardup _,
    "q108_weighted_sample" -> q108WeightedSample _,
    "q109_approx_topk" -> q109ApproxTopk _,
    "q116_vocab_coverage" -> q116VocabCoverage _,
    "q117_pca_embeddings" -> q117PcaEmbeddings _,
    "q121_theta_audience_overlap" -> q121ThetaAudienceOverlap _,
    "q122_kll_quantile_bands" -> q122KllQuantileBands _,
    "q125_rolling_distinct" -> q125RollingDistinct _,
    "q126_pmi_cooccur" -> q126PmiCooccur _,
    "q134_source_kl" -> q134SourceKl _,
    "q130_event_pagerank" -> q130EventPagerank _,
    "q141_dsir_weights" -> q141DsirWeights _,
    "q144_source_overlap" -> q144SourceOverlap _,
    "q145_embedding_standardize" -> q145EmbeddingStandardize _,
    "q155_embedding_outliers" -> q155EmbeddingOutliers _)

  /** Bench-form overrides (see [[graft.SparkEntry.benchForm]]): q107's
    * registered form is the planted-pair recall envelope; the bench
    * times the production per-asset report. */
  val benchForm: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q107_phash_neardup" -> q107PhashReport _,
    "q117_pca_embeddings" -> q117PcaProjection _)

  /** Oracles for the SQL-expressible subset. */
  val oracle: Map[String, String] = Map(
    // q117: rows + labels pinned value-exact; eigen-order and Bessel
    // claims are the TRUE booleans (raw pc coords are eigenvector-sign
    // dependent and stay bench/spec-side)
    "q117_pca_embeddings" ->
      """SELECT vec_id, label, TRUE AS var_order_ok, TRUE AS bessel_ok
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    // q107: planted-pair recall envelope — byte-identical planted assets
    // detect deterministically (Hamming 0), floor 0.9
    "q107_phash_neardup" ->
      Dedup.plantedEnvelopeOracle("documents", "doc_id"),
    // q100: the top-20 selection and exact counts are fully
    // oracle-computable; the CMS estimate is emitted as its published
    // guarantee (exact ≤ est ≤ exact + ⌈eps·N⌉) which the oracle
    // expects TRUE on every row
    "q100_cms_heavy_hitters" ->
      """SELECT l_partkey, COUNT(*) AS exact_cnt, TRUE AS cms_ok
        |FROM lineitem GROUP BY 1
        |ORDER BY exact_cnt DESC, l_partkey LIMIT 20""".stripMargin,
    // q122: the randomized KLL estimates live inside exact q±0.05
    // percentile bounds, per group and for the merged 'ALL' rollup —
    // the oracle expects every envelope boolean TRUE
    "q122_kll_quantile_bands" ->
      """SELECT l_returnflag, TRUE AS p25_ok, TRUE AS p50_ok,
        |       TRUE AS p75_ok
        |FROM lineitem GROUP BY 1
        |UNION ALL
        |SELECT 'ALL', TRUE, TRUE, TRUE
        |ORDER BY l_returnflag""".stripMargin,
    // q191: split, model, argmax and scoring replicated; ties break by
    // smallest successor in both engines; unseen eval states predict
    // NULL and score zero.
    "q191_markov_holdout" ->
      """WITH p AS (
        |  SELECT user_id, event_type AS to_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts, event_id) AS from_type,
        |         substr(md5(concat('mk:', CAST(user_id AS VARCHAR))),
        |               1, 8) < 'c0000000' AS is_train
        |  FROM events),
        |pp AS (SELECT * FROM p WHERE from_type IS NOT NULL),
        |m AS (
        |  SELECT from_type, to_type, COUNT(*) AS n
        |  FROM pp WHERE is_train GROUP BY 1, 2),
        |b AS (
        |  SELECT from_type, to_type AS predicted FROM (
        |    SELECT from_type, to_type,
        |           row_number() OVER (PARTITION BY from_type
        |             ORDER BY n DESC, to_type ASC) AS rn
        |    FROM m) WHERE rn = 1),
        |e AS (
        |  SELECT pp.from_type, pp.to_type, b.predicted
        |  FROM pp LEFT JOIN b ON pp.from_type = b.from_type
        |  WHERE NOT pp.is_train)
        |SELECT from_type, COUNT(*) AS n_pairs,
        |       CAST(SUM(CASE WHEN to_type = predicted THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_correct,
        |       round(CAST(SUM(CASE WHEN to_type = predicted
        |                     THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6)
        |         AS accuracy
        |FROM e GROUP BY 1 ORDER BY from_type""".stripMargin,
    // q187: the oracle counts triangles by the INDEPENDENT a<b<c
    // triple-join over the undirected edge list — a different algorithm
    // than the engine's degree-ordered orientation, so a hash match
    // also certifies the orientation argument. Integer counts; one
    // double divide.
    "q187_triangle_census" ->
      """WITH inc AS (
        |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
        |  FROM lineitem),
        |e AS (
        |  SELECT a.pk AS u, b.pk AS v
        |  FROM inc a JOIN inc b ON a.ok = b.ok AND a.pk < b.pk
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 2),
        |deg AS (
        |  SELECT x, COUNT(*) AS d FROM (
        |    SELECT u AS x FROM e UNION ALL SELECT v FROM e)
        |  GROUP BY 1),
        |tri AS (
        |  SELECT COUNT(*) AS t
        |  FROM e e1 JOIN e e2 ON e2.u = e1.v
        |       JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v),
        |w AS (
        |  SELECT COUNT(*) AS n_nodes,
        |         CAST(SUM(d * (d - 1) // 2) AS BIGINT) AS n_wedges
        |  FROM deg),
        |ne AS (SELECT COUNT(*) AS n_edges FROM e)
        |SELECT n_nodes, n_edges, n_wedges, t AS n_triangles,
        |       round(3.0 * t / n_wedges, 6) AS transitivity
        |FROM w, ne, tri""".stripMargin,
    // q173: the md5-bucketed sketch is engine-portable, so the ESTIMATE
    // itself is value-pinned (pure integer counters), not just the exact
    // ground truth. DuckDB parses the hex head via the 0x-cast; Spark
    // uses conv(_,16,10) — same 32-bit value.
    "q173_joinsize_estimate" ->
      """WITH ea AS (SELECT user_id AS k FROM events),
        |ob AS (SELECT o_custkey AS k FROM orders),
        |ca AS (
        |  SELECT d,
        |         CAST(CAST(concat('0x', substr(md5(concat(d, ':',
        |           CAST(k AS VARCHAR))), 1, 8)) AS BIGINT) % 8192
        |           AS BIGINT) AS j,
        |         COUNT(*) AS c1
        |  FROM ea, unnest([0, 1, 2, 3, 4]) AS t(d) GROUP BY 1, 2),
        |cb AS (
        |  SELECT d,
        |         CAST(CAST(concat('0x', substr(md5(concat(d, ':',
        |           CAST(k AS VARCHAR))), 1, 8)) AS BIGINT) % 8192
        |           AS BIGINT) AS j,
        |         COUNT(*) AS c2
        |  FROM ob, unnest([0, 1, 2, 3, 4]) AS t(d) GROUP BY 1, 2),
        |dots AS (
        |  SELECT d, SUM(c1 * c2) AS dot
        |  FROM ca JOIN cb USING (d, j) GROUP BY d),
        |est AS (
        |  SELECT CAST(MIN(coalesce(dot, 0)) AS BIGINT) AS cms_est
        |  FROM unnest([0, 1, 2, 3, 4]) AS t(d) LEFT JOIN dots USING (d)),
        |xa AS (SELECT k, COUNT(*) AS ka FROM ea GROUP BY k),
        |xb AS (SELECT k, COUNT(*) AS kb FROM ob GROUP BY k),
        |ex AS (
        |  SELECT CAST(coalesce(SUM(ka * kb), 0) AS BIGINT) AS exact_size
        |  FROM xa JOIN xb USING (k))
        |SELECT exact_size, cms_est,
        |       cms_est - exact_size AS over_count,
        |       CASE WHEN exact_size > 0
        |            THEN round(CAST(cms_est - exact_size AS DOUBLE)
        |                       / exact_size, 6) END AS rel_err,
        |       cms_est >= exact_size AS ok
        |FROM ex, est""".stripMargin,
    // q155: per-dim z² rounds to DECIMAL(28,12) before the vec fold so
    // the Σ is order-free; moments mirror q145 exactly.
    "q155_embedding_outliers" ->
      """WITH comps AS (
        |  SELECT vec_id, u.i - 1 AS pos, CAST(embedding[u.i] AS DOUBLE) AS x
        |  FROM embeddings,
        |       unnest(generate_series(1, len(embedding))) u(i)),
        |m AS (
        |  SELECT pos, COUNT(*) AS n,
        |         SUM(CAST(x AS DECIMAL(28,12))) AS s,
        |         SUM(CAST(x * x AS DECIMAL(28,12))) AS sq
        |  FROM comps GROUP BY pos),
        |mm AS (
        |  SELECT pos,
        |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |         sqrt(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
        |              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS sd
        |  FROM m),
        |z AS (
        |  SELECT vec_id,
        |         CAST((CASE WHEN sd = 0 THEN 0.0
        |                    ELSE (x - mean) / sd END)
        |              * (CASE WHEN sd = 0 THEN 0.0
        |                      ELSE (x - mean) / sd END)
        |              AS DECIMAL(28,12)) AS z2
        |  FROM comps c JOIN mm ON mm.pos = c.pos)
        |SELECT vec_id, COUNT(*) AS dims,
        |       round(CAST(SUM(z2) AS DOUBLE), 6) AS maha2,
        |       round(CAST(SUM(z2) AS DOUBLE), 6)
        |         > CAST(COUNT(*) AS DOUBLE) * CAST(2.0 AS DOUBLE)
        |         AS is_outlier
        |FROM z GROUP BY vec_id ORDER BY vec_id""".stripMargin,
    "q145_embedding_standardize" ->
      """WITH comps AS (
        |  SELECT vec_id, u.i - 1 AS pos, CAST(embedding[u.i] AS DOUBLE) AS x
        |  FROM embeddings,
        |       unnest(generate_series(1, len(embedding))) u(i)),
        |m AS (
        |  SELECT pos, COUNT(*) AS n,
        |         SUM(CAST(x AS DECIMAL(28,12))) AS s,
        |         SUM(CAST(x * x AS DECIMAL(28,12))) AS sq
        |  FROM comps GROUP BY pos),
        |mm AS (
        |  SELECT pos,
        |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
        |         sqrt(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE)
        |              - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
        |                * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))) AS sd
        |  FROM m)
        |SELECT vec_id, CAST(c.pos AS BIGINT) AS pos,
        |       round(CASE WHEN sd = 0 THEN 0.0
        |                  ELSE (x - mean) / sd END, 6) AS z
        |FROM comps c JOIN mm ON mm.pos = c.pos
        |ORDER BY vec_id, pos""".stripMargin,
    "q144_source_overlap" ->
      """WITH st AS (
        |  SELECT DISTINCT source, t.tok
        |  FROM documents,
        |       unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                          x -> len(x) > 0)) AS t(tok)),
        |v AS (SELECT source, COUNT(*) AS v FROM st GROUP BY source),
        |c AS (
        |  SELECT a.source AS source_a, b.source AS source_b,
        |         COUNT(*) AS common
        |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2)
        |SELECT source_a, source_b, common,
        |       round(CAST(common AS DOUBLE)
        |             / CAST(va.v + vb.v - common AS DOUBLE), 6) AS jaccard
        |FROM c JOIN v va ON va.source = c.source_a
        |       JOIN v vb ON vb.source = c.source_b
        |ORDER BY source_a, source_b""".stripMargin,
    "q141_dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, (lang = 'en') AS is_t,
        |         ('0x' || substr(md5(t.tok), 1, 4))::BIGINT % 4096 AS bucket
        |  FROM documents,
        |       unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                          x -> len(x) > 0)) AS t(tok)),
        |counts AS (
        |  SELECT bucket, COUNT(*) AS c_all,
        |         COUNT(*) FILTER (is_t) AS c_t
        |  FROM tok GROUP BY bucket),
        |tot AS (SELECT SUM(c_all) AS n_all, SUM(c_t) AS n_t FROM counts),
        |llr AS (
        |  SELECT bucket,
        |         ln(CAST(c_t + 1 AS DOUBLE) / CAST(n_t + 4096 AS DOUBLE))
        |         - ln(CAST(c_all + 1 AS DOUBLE)
        |              / CAST(n_all + 4096 AS DOUBLE)) AS llr
        |  FROM counts CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |       round(CAST(SUM(CAST(llr AS DECIMAL(28,12))) AS DOUBLE)
        |             / CAST(COUNT(*) AS DOUBLE), 6) AS weight
        |FROM tok JOIN llr USING (bucket)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q101_bigram_familiarity" ->
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
        |    FROM toks) z),
        |d AS (SELECT gram, COUNT(*) AS df FROM grams GROUP BY 1)
        |SELECT doc_id, COUNT(*) AS n_bigrams,
        |       CAST(SUM(df) AS BIGINT) AS df_sum,
        |       round(CAST(SUM(df) AS DOUBLE) / COUNT(*), 6) AS familiarity
        |FROM grams JOIN d USING (gram)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q102_event_transitions" ->
      """WITH p AS (
        |  SELECT lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS from_type,
        |         event_type AS to_type
        |  FROM events),
        |c AS (SELECT from_type, to_type, COUNT(*) AS n FROM p
        |      WHERE from_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |       round(CAST(n AS DOUBLE) /
        |             CAST((SELECT SUM(n) FROM c) AS DOUBLE), 6) AS share
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    "q103_mad_outliers" ->
      """WITH med AS (
        |  SELECT lang, median(n_chars) AS med FROM documents GROUP BY 1),
        |j AS (
        |  SELECT d.doc_id, d.lang, d.n_chars, m.med
        |  FROM documents d JOIN med m USING (lang)),
        |mad AS (
        |  SELECT lang, median(abs(n_chars - med)) AS mad FROM j GROUP BY 1)
        |SELECT doc_id, lang, n_chars, med, mad
        |FROM j JOIN mad USING (lang)
        |WHERE abs(n_chars - med) > 2 * mad
        |ORDER BY doc_id""".stripMargin,
    "q104_winsorize" ->
      """WITH pct AS (
        |  SELECT l_returnflag,
        |         quantile_cont(l_extendedprice, 0.05) AS p05,
        |         quantile_cont(l_extendedprice, 0.95) AS p95
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, COUNT(*) AS n,
        |       CAST(SUM(CASE WHEN l_extendedprice < p05 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_low,
        |       CAST(SUM(CASE WHEN l_extendedprice > p95 THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_high,
        |       MAX(p05) AS p05, MAX(p95) AS p95,
        |       CAST(SUM(CASE WHEN l_extendedprice BETWEEN p05 AND p95
        |                     THEN CAST(l_extendedprice AS DECIMAL(18,4))
        |                END) AS DOUBLE) AS within_sum,
        |       round(CAST(SUM(CASE WHEN l_extendedprice BETWEEN p05 AND p95
        |                           THEN CAST(l_extendedprice AS DECIMAL(18,4))
        |                      END) AS DOUBLE)
        |             + CAST(SUM(CASE WHEN l_extendedprice < p05 THEN 1
        |                             ELSE 0 END) AS BIGINT) * MAX(p05)
        |             + CAST(SUM(CASE WHEN l_extendedprice > p95 THEN 1
        |                             ELSE 0 END) AS BIGINT) * MAX(p95),
        |             2) AS winsor_total
        |FROM lineitem JOIN pct USING (l_returnflag)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q105_tombstone_cascade" ->
      """WITH tomb AS (
        |  SELECT c_custkey FROM customer
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7'),
        |del_orders AS (
        |  SELECT o_orderkey FROM orders
        |  WHERE o_custkey IN (SELECT c_custkey FROM tomb)),
        |rows_ AS (
        |  SELECT 'customer' AS table_name,
        |         (SELECT COUNT(*) FROM customer) AS rows_before,
        |         (SELECT COUNT(*) FROM tomb) AS rows_deleted
        |  UNION ALL
        |  SELECT 'orders',
        |         (SELECT COUNT(*) FROM orders),
        |         (SELECT COUNT(*) FROM del_orders)
        |  UNION ALL
        |  SELECT 'lineitem',
        |         (SELECT COUNT(*) FROM lineitem),
        |         (SELECT COUNT(*) FROM lineitem
        |          WHERE l_orderkey IN (SELECT o_orderkey FROM del_orders)))
        |SELECT table_name, rows_before, rows_deleted,
        |       rows_before - rows_deleted AS rows_after
        |FROM rows_ ORDER BY table_name""".stripMargin,
    "q106_partial_agg_rollup" ->
      """WITH daily AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day, l_returnflag,
        |         COUNT(*) AS n,
        |         SUM(CAST(l_quantity AS DECIMAL(18,4))) AS qty_dec
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT CAST(date_trunc('week', day) AS DATE) AS week, l_returnflag,
        |       CAST(SUM(n) AS BIGINT) AS n,
        |       CAST(SUM(qty_dec) AS DOUBLE) AS sum_qty
        |FROM daily GROUP BY 1, 2 ORDER BY week, l_returnflag""".stripMargin,
    "q108_weighted_sample" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |WHERE substr(md5(text), 1, 8) <
        |      printf('%08x', (least(n_chars, 499) * 4294967296) // 500)
        |ORDER BY doc_id""".stripMargin,
    "q109_approx_topk" ->
      """SELECT l_suppkey, COUNT(*) AS cnt FROM lineitem
        |GROUP BY 1 ORDER BY cnt DESC, l_suppkey LIMIT 10""".stripMargin,
    "q116_vocab_coverage" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                            t -> len(t) > 0)) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok FROM (
        |    SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY 1
        |    ORDER BY cnt DESC, tok LIMIT 20) v)
        |SELECT doc_id, COUNT(*) AS n_tokens,
        |       CAST(SUM(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_oov,
        |       round(CAST(SUM(CASE WHEN vocab.tok IS NULL THEN 1 ELSE 0 END)
        |                  AS DOUBLE) / COUNT(*), 6) AS oov_rate
        |FROM toks LEFT JOIN vocab USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // q121: the sketches run in exact mode at test SFs (lgNomEntries=16 >
    // distinct users), so the oracle is the exact distinct-set algebra.
    "q121_theta_audience_overlap" ->
      """WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        |c AS (SELECT event_type, COUNT(*) AS n FROM u GROUP BY 1),
        |i AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         COUNT(*) AS inter
        |  FROM u a JOIN u b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT ca.event_type AS type_a, cb.event_type AS type_b,
        |       ca.n AS n_a, cb.n AS n_b,
        |       COALESCE(i.inter, 0) AS n_intersection,
        |       ca.n + cb.n - COALESCE(i.inter, 0) AS n_union,
        |       round(CAST(COALESCE(i.inter, 0) AS DOUBLE) /
        |             (ca.n + cb.n - COALESCE(i.inter, 0)), 6) AS jaccard
        |FROM c ca JOIN c cb ON ca.event_type < cb.event_type
        |LEFT JOIN i ON i.type_a = ca.event_type AND i.type_b = cb.event_type
        |ORDER BY type_a, type_b""".stripMargin,
    // q125: theta sketches are exact at test SFs (lgNomEntries=16), so the
    // oracle is the exact rolling distinct count (DATE - int = DATE in
    // DuckDB; Spark side uses date_sub — same clipped leading windows)
    "q125_rolling_distinct" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |cd AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_day
        |       FROM du GROUP BY day)
        |SELECT cd.day, cd.n_day,
        |       CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS n_7d
        |FROM cd JOIN du ON du.day BETWEEN cd.day - 6 AND cd.day
        |GROUP BY cd.day, cd.n_day
        |ORDER BY cd.day""".stripMargin,
    // q126: same fit (top-40 df vocab, ties by token) + score (pair
    // counts over distinct per-doc vocab tokens, n_ab >= 5, 6dp PMI)
    "q126_pmi_cooccur" ->
      """WITH tk AS (
        |  SELECT doc_id, unnest(list_distinct(list_filter(
        |           string_split_regex(lower(text), '\W+'),
        |           t -> len(t) > 0))) AS tok
        |  FROM documents),
        |vocab AS (
        |  SELECT tok, COUNT(*) AS df FROM tk GROUP BY tok
        |  ORDER BY df DESC, tok LIMIT 40),
        |n AS (SELECT COUNT(*) AS n_docs FROM documents),
        |p AS (
        |  SELECT a.tok AS tok_a, any_value(a.df) AS df_a,
        |         b.tok AS tok_b, any_value(b.df) AS df_b,
        |         COUNT(*) AS n_ab
        |  FROM (SELECT tk.doc_id, tk.tok, vocab.df FROM tk
        |        JOIN vocab ON vocab.tok = tk.tok) a
        |  JOIN (SELECT tk.doc_id, tk.tok, vocab.df FROM tk
        |        JOIN vocab ON vocab.tok = tk.tok) b
        |    ON a.doc_id = b.doc_id AND a.tok < b.tok
        |  GROUP BY a.tok, b.tok HAVING COUNT(*) >= 5)
        |SELECT tok_a, tok_b, CAST(n_ab AS BIGINT) AS n_ab,
        |       round(ln(CAST(n_ab AS DOUBLE) * (SELECT n_docs FROM n) /
        |             (CAST(df_a AS DOUBLE) * df_b)), 6) AS pmi
        |FROM p ORDER BY tok_a, tok_b""".stripMargin,
    // q134: same one-scan shape — source/token/corpus totals all derive
    // from the (source, token) count frame; the p_s·ln(p_s/p_c) double
    // tree is mirrored exactly and terms sum as DECIMAL(28,12)
    "q134_source_kl" ->
      """WITH tk AS (
        |  SELECT source,
        |         unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                            t -> len(t) > 0)) AS tok
        |  FROM documents),
        |st AS (SELECT source, tok, COUNT(*) AS cnt FROM tk GROUP BY 1, 2),
        |stot AS (SELECT source, CAST(SUM(cnt) AS BIGINT) AS s_tot
        |         FROM st GROUP BY 1),
        |ttot AS (SELECT tok, CAST(SUM(cnt) AS BIGINT) AS t_tot
        |         FROM st GROUP BY 1),
        |ctot AS (SELECT CAST(SUM(s_tot) AS BIGINT) AS c_tot FROM stot)
        |SELECT source, s_tot AS n_tokens, COUNT(*) AS vocab,
        |       round(CAST(SUM(CAST(
        |         (CAST(cnt AS DOUBLE) / CAST(s_tot AS DOUBLE)) *
        |         ln((CAST(cnt AS DOUBLE) / CAST(s_tot AS DOUBLE)) /
        |            (CAST(t_tot AS DOUBLE) / CAST(c_tot AS DOUBLE)))
        |         AS DECIMAL(28,12))) AS DOUBLE), 6) AS kl_div
        |FROM st JOIN ttot USING (tok) JOIN stot USING (source)
        |CROSS JOIN ctot
        |GROUP BY source, s_tot
        |ORDER BY source""".stripMargin,
    // q130: 10 power iterations unrolled as CTEs, mirroring the engine's
    // arithmetic tree exactly — decimal(28,12) sums are order-free, and
    // (1 - 0.85)/n, 0.85*(s + dang/n) are the same IEEE ops in the same
    // order on both engines (see pageRank's determinism note)
    "q130_event_pagerank" -> {
      // MATERIALIZED is load-bearing: each iteration references the
      // previous rank CTE twice, so inlining would expand the chain
      // 2^10-fold (and re-scan the parquet per copy)
      // CAST(1 AS DOUBLE) is load-bearing: DuckDB evaluates a bare
      // (1 - 0.85) in exact DECIMAL (→ 0.15), while the engine bakes the
      // IEEE double 1.0-0.85 = 0.15000000000000002 — forcing the DOUBLE
      // subtraction reproduces the engine's constant bit-for-bit
      def iterCte(k: Int): String =
        s"""r$k AS MATERIALIZED (
           |  SELECT nodes.node,
           |         (CAST(1 AS DOUBLE) - 0.85) / nn.n + 0.85 *
           |           (COALESCE(c.s, 0.0) + dg.dang / nn.n) AS r
           |  FROM nodes
           |  LEFT JOIN (
           |    SELECT p.dst,
           |           CAST(SUM(CAST(p.p * pr.r AS DECIMAL(28,12)))
           |                AS DOUBLE) AS s
           |    FROM p JOIN r${k - 1} pr ON p.src = pr.node
           |    GROUP BY p.dst) c ON c.dst = nodes.node
           |  CROSS JOIN (
           |    SELECT CAST(COALESCE(SUM(CAST(pr.r AS DECIMAL(28,12))), 0)
           |                AS DOUBLE) AS dang
           |    FROM (SELECT pr.r FROM r${k - 1} pr
           |          LEFT JOIN srcs ON pr.node = srcs.src
           |          WHERE srcs.src IS NULL) pr) dg
           |  CROSS JOIN nn)""".stripMargin
      s"""WITH e AS (
         |  SELECT lag(event_type) OVER (PARTITION BY user_id
         |           ORDER BY ts, event_id) AS src,
         |         event_type AS dst
         |  FROM events),
         |ed AS (SELECT src, dst, COUNT(*) AS cnt FROM e
         |       WHERE src IS NOT NULL GROUP BY 1, 2),
         |ot AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS out
         |       FROM ed GROUP BY 1),
         |p AS MATERIALIZED (
         |      SELECT ed.src, ed.dst,
         |             CAST(ed.cnt AS DOUBLE) / CAST(ot.out AS DOUBLE) AS p
         |      FROM ed JOIN ot ON ed.src = ot.src),
         |nodes AS MATERIALIZED (
         |          SELECT DISTINCT node FROM
         |          (SELECT src AS node FROM p UNION SELECT dst FROM p)),
         |srcs AS MATERIALIZED (SELECT DISTINCT src FROM p),
         |nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM nodes),
         |r0 AS MATERIALIZED (
         |       SELECT node, CAST(1 AS DOUBLE) / nn.n AS r
         |       FROM nodes CROSS JOIN nn),
         |${(1 to 10).map(iterCte).mkString(",\n")}
         |SELECT node AS event_type, round(r, 6) AS rank
         |FROM r10 ORDER BY event_type""".stripMargin
    })
}
