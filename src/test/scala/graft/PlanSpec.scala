package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression tests: pin the physical-plan properties that make
  * the expensive queries scale (broadcast dims, fused top-k, pushed
  * filters, no pathological joins), so a refactor that silently degrades a
  * plan fails CI instead of only showing up at 100 TB. Plans are inspected
  * AFTER execution so AQE's final (re-optimized) choices are what's
  * asserted.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = TestSpark.sfDir

  private def finalPlan(qid: String): String = {
    val df = SparkEntry.queries(qid)(spark, sf)
    df.collect() // finalize the adaptive plan
    val p = df.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    // assert only on AQE's final choices, not the pre-runtime initial plan
    p.split("== Initial Plan ==").head
  }

  test("q03 flagship: dimension joins broadcast") {
    val p = finalPlan("q03_flagship_sql")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"expected >=2 broadcast joins:\n${p.take(3000)}")
  }

  test("q28 top-k fuses to TakeOrderedAndProject") {
    val p = finalPlan("q28_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q08 date-range filter reaches the parquet scan") {
    val p = finalPlan("q08_date_range_filter")
    assert(p.contains("PushedFilters: [") && !p.contains("PushedFilters: []"),
      p.take(3000))
  }

  private def finalBenchPlan(qid: String): String = {
    val df = SparkEntry.benchForm(qid)(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    spark.catalog.clearCache()
    p.split("== Initial Plan ==").head
  }

  test("q40 IVF: cell assignment is projection-only — one window, broadcast probe join") {
    // the PROBE (bench) form — the registered form adds the brute-force
    // recall-envelope side, whose plan is deliberately the exact scan's
    val p = finalBenchPlan("q40_ann_ivf")
    assert("Window \\[".r.findAllIn(p).size == 1,
      s"only the final top-k may window:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"corpus must not shuffle for assignment:\n${p.take(3000)}")
  }

  test("q35 banded LSH: no cartesian or nested-loop join anywhere") {
    val p = finalPlan("q35_embedding_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q44 as-of: pure window formulation, no join operator") {
    val p = finalPlan("q44_asof_prev_purchase")
    assert(!p.contains("Join"), s"as-of must not join:\n${p.take(3000)}")
  }

  test("q54 decontamination joins against a broadcast benchmark gram set") {
    val p = finalPlan("q54_decontaminate")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q63 bloom probe is a scan-side predicate, not a join") {
    val p = finalPlan("q63_bloom_decontaminate")
    assert(p.contains("might_contain"),
      s"bloom probe must appear as a filter predicate:\n${p.take(3000)}")
    // the only joins are the exact verify (broadcast) + the sizes join —
    // the prefilter itself must not introduce a shuffle or nested loop
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q67 outliers: stats rejoin broadcasts, fact table never re-shuffles") {
    val p = finalPlan("q67_zscore_outliers")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.toLowerCase.contains("sortmergejoin"), p.take(3000))
  }

  test("q65 zipf candidate selection fuses to TakeOrderedAndProject") {
    val p = finalPlan("q65_token_zipf")
    assert(p.contains("TakeOrderedAndProject"), p.take(3000))
  }

  test("q72/q73/q76 temporal windows plan without any join") {
    for (qid <- Seq("q72_latest_snapshot", "q73_scd2_intervals",
        "q76_last_touch_attribution")) {
      val p = finalPlan(qid)
      assert(!p.contains("Join"), s"$qid must be join-free:\n${p.take(2000)}")
    }
  }

  test("q22 exact dedup shuffles digests, not documents") {
    val p = finalPlan("q22_dedup_exact")
    assert(p.contains("sha2"), p.take(3000))
    assert(!p.toLowerCase.contains("sortmergejoin"), p.take(3000))
  }

  test("q86 argmax is one aggregate — no window, no join") {
    val p = finalPlan("q86_group_argmax")
    assert(!p.contains("Window") && !p.contains("Join"), p.take(3000))
  }

  test("q85/q89 fused projections: no join, no hash-partition shuffle") {
    for (qid <- Seq("q85_char_entropy", "q89_embedding_stats")) {
      val p = finalPlan(qid)
      assert(!p.contains("Join"), s"$qid must not join:\n${p.take(2000)}")
      assert(!p.contains("Exchange hashpartitioning"),
        s"$qid must not shuffle beyond its output sort:\n${p.take(2000)}")
    }
  }

  test("q96 sweep-line windows per day — never a single-partition window") {
    val p = finalPlan("q96_max_concurrency")
    assert(!p.contains("Exchange SinglePartition"),
      s"day-partitioned sweep must not serialize:\n${p.take(3000)}")
  }

  test("q105 tombstone cascade: every fact-side deletion join broadcasts") {
    val p = finalPlan("q105_tombstone_cascade")
    assert(!p.toLowerCase.contains("sortmergejoin"),
      s"tombstones must broadcast, facts must not shuffle:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q104 winsorize: percentile bounds broadcast back to the scan") {
    val p = finalPlan("q104_winsorize")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.toLowerCase.contains("sortmergejoin"), p.take(3000))
  }

  test("q100 CMS probe fuses into the top-k projection — no extra stage") {
    val p = finalPlan("q100_cms_heavy_hitters")
    // the probe projection (cms_ok) rides TakeOrderedAndProject's output
    // directly — no separate Project/Exchange stage after the top-k
    assert("TakeOrderedAndProject.*cms_ok".r.findFirstIn(p).isDefined,
      s"probe must fuse into the fused top-k operator:\n${p.take(3000)}")
  }

  test("q107 perceptual dedup: banded join only — no cartesian/nested loop") {
    val p = finalPlan("q107_phash_neardup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q123 incremental dedup: gram equi-joins only — no cartesian/nested loop") {
    val p = finalPlan("q123_incremental_dedup")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q119 equi-depth: boundary broadcast + map-side bins — no window sort") {
    val p = finalPlan("q119_equidepth_histogram")
    // the old ntile form sorted a third of the fact table per task; the
    // boundary form must carry NO window operator at all
    assert(!p.contains("Window"),
      s"equi-depth must not window over a 3-value key:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"),
      s"boundaries must broadcast back to the scan:\n${p.take(3000)}")
  }

  test("q120 listagg: one bounded aggregate — no distinct pass, no window") {
    val p = finalPlan("q120_ordered_listagg")
    assert(!p.contains("Window"),
      s"top-3 must come from the bounded TopKMin aggregate:\n${p.take(3000)}")
    // one exchange for the group-by (plus the output sort) — the old
    // form paid an extra distinct exchange before its window
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1,
      s"expected a single grouped exchange:\n${p.take(3000)}")
  }

  test("q112 balance resets: both windows ride ONE user-keyed exchange") {
    val p = finalPlan("q112_balance_resets")
    assert("Window \\[".r.findAllIn(p).size <= 2 &&
      "Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"stacked windows must share the user shuffle:\n${p.take(3000)}")
  }

  test("q124 event paths: one exchange for both lags, fused top-k") {
    val p = finalPlan("q124_event_paths")
    assert("Window \\[".r.findAllIn(p).size == 1,
      s"both lags must fuse into one window operator:\n${p.take(3000)}")
    // user-keyed window shuffle + path-keyed aggregate shuffle only
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      p.take(3000))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 must fuse:\n${p.take(3000)}")
  }

  test("q118 entity resolution: blocking joins only — no cartesian/nested loop") {
    val p = finalPlan("q118_entity_resolution")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"deletion-neighborhood blocking must stay equi-join:\n${p.take(3000)}")
  }

  test("q125 rolling distinct: ONE fact scan — sketch exchange is reused") {
    val p = finalPlan("q125_rolling_distinct")
    assert(p.contains("ReusedExchange"),
      s"day-sketch aggregate must be built once:\n${p.take(3000)}")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"events must be scanned exactly once:\n${p.take(3000)}")
  }

  test("q129 passage containment: prefix-filtered equi-joins only") {
    val p = finalPlan("q129_passage_containment")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"prefix filtering must stay an equi-join:\n${p.take(3000)}")
  }

  test("q128 skew profile: heavy-hitter head fuses to top-k") {
    val p = finalPlan("q128_key_skew_profile")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-10 head must fuse, not full-sort:\n${p.take(3000)}")
  }

  test("q131 BM25: stats broadcast and the top-20 head fuses") {
    val p = finalPlan("q131_bm25_retrieval")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must fuse, not full-sort:\n${p.take(3000)}")
    // the dfT equi-join must broadcast AND no join may fall back to
    // sort-merge (an OR over broadcast kinds would let the 1-row stats
    // cross join mask a dfT regression)
    assert(p.contains("BroadcastHashJoin") &&
      !p.contains("SortMergeJoin"),
      s"df/stats frames must broadcast:\n${p.take(3000)}")
  }

  test("q116 vocab: top-k fuses and the vocab probe broadcasts") {
    val p = finalPlan("q116_vocab_coverage")
    assert(p.contains("TakeOrderedAndProject"),
      s"vocab selection must fuse to top-k:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q133 chi-square: totals derive from the checkpointed cell frame, no fact re-scan") {
    val p = finalPlan("q133_chi_square")
    // the ONE orders scan runs inside the cells localCheckpoint job; the
    // final plan must read only the materialized frame — a parquet scan
    // here means a derived total re-scanned the fact table
    assert(!p.contains("Scan parquet"),
      s"derived totals must not re-scan orders:\n${p.take(3000)}")
    assert(p.contains("ExistingRDD") || p.contains("Scan RDD"),
      s"cell frame must come from the checkpoint:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"),
      s"cell/total joins must broadcast:\n${p.take(3000)}")
  }

  test("q134 source KL: totals re-aggregate the checkpointed count frame, ONE tokenize") {
    val p = finalPlan("q134_source_kl")
    // same shape as q133: the single documents scan + tokenize lives in
    // the (source, token) count frame's localCheckpoint job
    assert(!p.contains("Scan parquet"),
      s"derived totals must not re-tokenize documents:\n${p.take(3000)}")
    assert(p.contains("ExistingRDD") || p.contains("Scan RDD"),
      s"count frame must come from the checkpoint:\n${p.take(3000)}")
    // the 1-row corpus-total cross join is a BroadcastNestedLoopJoin by
    // construction; only an unkeyed data-sized product would be a bug
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q137 Mann-Whitney: one fact scan; the ordered window runs on the value frame") {
    val p = finalPlan("q137_mann_whitney")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"customer must be scanned exactly once:\n${p.take(3000)}")
    // the window must sit ABOVE the per-value aggregate (bounded domain),
    // not over raw rows: exactly one Window, and a partial_count feeding it
    assert("Window \\[".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("q138 two-proportion z: single pass — no join, no window, one scan") {
    val p = finalPlan("q138_two_proportion_z")
    assert("Scan parquet".r.findAllIn(p).size == 1, p.take(3000))
    assert(!p.contains("Window") && !p.contains("Join"), p.take(3000))
  }

  test("q139 encode-ids: literal-map encode — one scan, zero joins") {
    val p = finalPlan("q139_encode_ids")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"encode must be a single corpus scan:\n${p.take(3000)}")
    assert(!p.contains("Join"),
      s"vocabulary must be a plan literal, not a join:\n${p.take(3000)}")
  }

  test("q135 boilerplate: hash-keyed equi-joins only, no third tokenize pass") {
    val p = finalPlan("q135_boilerplate_passages")
    assert("Scan parquet".r.findAllIn(p).size <= 2,
      s"at most the two documented tokenize scans:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q140 keyless range join: bucketed equi-join, never nested-loop") {
    val p = finalPlan("q140_interval_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"interval containment must ride the bucket equi-join:\n${p.take(3000)}")
  }

  test("q144 source overlap: token-keyed equi-joins on the distinct " +
      "frame, vocab sizes broadcast") {
    val p = finalPlan("q144_source_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both vocab-size rejoins must broadcast:\n${p.take(3000)}")
  }

  test("q145 standardization: per-dim moments broadcast back, no " +
      "vector-sized shuffle") {
    val p = finalPlan("q145_embedding_standardize")
    assert(p.contains("BroadcastHashJoin"),
      s"the |dim|-row moment frame must broadcast:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("q141 DSIR: LLR model broadcasts into the scoring scan") {
    val p = finalPlan("q141_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      s"bucket-LLR probe must broadcast:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"),
      s"nothing in q141 may sort-merge — the model side is ≤4096 rows:\n" +
        p.take(3000))
  }

  test("q147 domain cap: broadcast cutoffs, NO window over documents") {
    val p = finalPlan("q147_source_cap")
    assert(p.contains("BroadcastHashJoin"),
      s"per-domain cutoffs must broadcast:\n${p.take(3000)}")
    assert(!p.contains("Window ["),
      s"the cap must never row_number-sort domains:\n${p.take(3000)}")
    assert(!p.contains("SortMergeJoin"), p.take(3000))
  }

  test("q153 nearest-event: single user-keyed exchange, no join") {
    val p = finalPlan("q153_nearest_event")
    assert(!p.contains("Join"),
      s"nearest-in-time must not self-join events:\n${p.take(3000)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"both direction windows must ride ONE exchange:\n${p.take(3000)}")
  }

  test("q150 attribution: journey windows reuse the user exchange") {
    val p = finalPlan("q150_position_attribution")
    // one exchange keys the user windows; the only other exchange is the
    // final 4-row touch_type aggregate — never a (user, jid) re-shuffle
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"(user, jid) windows must refine the user partitioning:\n" +
        p.take(3000))
  }

  test("q158 quantile normalize: per-row remap is a broadcast probe") {
    val p = finalPlan("q158_quantile_normalize")
    assert(p.contains("BroadcastHashJoin"),
      s"the (segment, bin)→target map must broadcast:\n${p.take(3000)}")
  }

  test("q202 BPE encode: the fitted model is a plan literal — encode is " +
      "a pure projection, no join, no aggregation over the corpus") {
    val p = finalPlan("q202_bpe_encode")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      p.take(3000))
    // the only exchange is the output sort; the encode/decode/bounds
    // projections ride the single corpus scan
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      s"expected exactly one documents scan:\n${p.take(3000)}")
    assert(!p.contains("HashAggregate"), p.take(3000))
  }

  test("q167 profile drift: ONE fact scan feeding both profile " +
      "aggregates via the checkpointed slim frame; NO Expand") {
    val p = finalPlan("q167_profile_drift")
    // the old/new alignment joins only the 2*|cols| profile frames —
    // never the fact
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(3000))
    // the Expand-based multi-countDistinct is exactly what this plan
    // avoids: distincts ride the narrow hash stack instead (measured
    // 3.1s -> 0.8s at sf0.1)
    assert(!p.contains("Expand"), p.take(3000))
    // the fact is scanned ONCE, at slim-checkpoint time: the final plan
    // reads the checkpointed RDD, never the parquet again
    assert("orders\\.parquet".r.findAllIn(p).isEmpty,
      s"fact must feed from the one checkpointed projection:\n${p.take(3000)}")
    assert(p.contains("ExistingRDD"), p.take(3000))
  }

  test("q168 seasonal anomalies: weekday baseline broadcasts, no window " +
      "touches fact rows") {
    val p = finalPlan("q168_seasonal_anomalies")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("Window"),
      s"daily frame must use aggregates, not fact-side windows:\n" +
        p.take(3000))
  }

  test("q170 embargo split: one conditional aggregate, no join, no window") {
    val p = finalPlan("q170_embargo_split")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"three zone counters must ride ONE user-keyed exchange:\n" +
        p.take(3000))
  }

  test("q171 bigram xent: model rejoins are hash joins; the only nested " +
      "loop is the 1-row totals broadcast") {
    val p = finalPlan("q171_bigram_xent")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // the N-total scalar rides the same 1-row crossJoin(broadcast) shape
    // as q148 — anything beyond that one is a real candidate explosion
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 1, p.take(3000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"bigram/prev/cur model rejoins must be hash joins:\n${p.take(3000)}")
  }

  test("q173 join-size estimate: sketch frames join broadcast — facts " +
      "never meet in a sort-merge join") {
    val p = finalPlan("q173_joinsize_estimate")
    // both sides collapse to <= depth*width counter rows (and |keys|
    // count rows for the exact half) BEFORE any join; the only
    // nested-loop shapes are the 1-row est x exact combiners
    assert(!p.toLowerCase.contains("sortmergejoin"),
      s"sketch/count frames are tiny — every join must broadcast:\n" +
        p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q174 linear interp: both direction windows ride the bounded day " +
      "frame, after the fact aggregate") {
    val p = finalPlan("q174_linear_interp")
    // the day-spine windows are unpartitioned by contract (|days| rows);
    // what must never happen is a window or sort-merge join over the
    // un-aggregated orders fact
    assert(!p.toLowerCase.contains("sortmergejoin"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q175 skyline: per-size frontier broadcasts back — no self-join, " +
      "no fact-side sort-merge") {
    val p = finalPlan("q175_skyline")
    assert(p.contains("BroadcastHashJoin"),
      s"frontier must broadcast into the fact filter:\n${p.take(3000)}")
    assert(!p.toLowerCase.contains("sortmergejoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
  }

  test("q176 clamped balance: one user exchange + external sort feed the " +
      "sequential fold — no window, no join") {
    val p = finalPlan("q176_clamped_balance")
    assert(!p.contains("Window \\[") && !p.contains("Join"), p.take(3000))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"exactly the explicit user repartition:\n${p.take(3000)}")
    assert(p.contains("Sort [user_id"),
      s"the fold needs the partition-local (user, ts, id) sort:\n" +
        p.take(3000))
  }

  test("q177 time-to-convert: journey windows ride ONE user exchange") {
    val p = finalPlan("q177_time_to_convert")
    // the (user, jid) journey-start window must refine the user
    // partitioning (q150's asserted shape), not re-shuffle events
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"(user, jid) must reuse the user exchange:\n${p.take(3000)}")
  }

  test("q178 DP release: one hash aggregate, noise is a projection — " +
      "no join, no window, no second pass") {
    val p = finalPlan("q178_dp_noisy_counts")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"the group counts shuffle once; noise rides the projection:\n" +
        p.take(3000))
  }

  test("q179 basket lift: dims and marginals broadcast; the pair " +
      "self-join is equi-keyed on the order key, never a cross product") {
    val p = finalPlan("q179_basket_lift")
    assert(!p.contains("CartesianProduct"),
      s"pair expansion must stay per-order:\n${p.take(3000)}")
    // part dim + two marginal frames + the 1-row order total all
    // broadcast (the 1-row total may plan as a nested-loop broadcast)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3,
      s"part + both marginals must broadcast:\n${p.take(3000)}")
  }

  test("q180 bootstrap: slim base spreads BEFORE the replicate explode; " +
      "no window anywhere") {
    val p = finalPlan("q180_bootstrap_ci")
    // the sf0.001 orders parquet is one partition — the guard must
    // insert the round-robin spread or the whole x25 pipeline runs in
    // a single task (measured 16x at sf0.1)
    assert(p.contains("Exchange roundrobinpartitioning") ||
      p.contains("Exchange RoundRobinPartitioning"),
      s"single-partition input must spread before the explode:\n" +
        p.take(3000))
    assert(!p.contains("Window"), p.take(3000))
  }

  test("q181 time-weighted avg: lead window and per-user aggregate ride " +
      "ONE user exchange — no join") {
    val p = finalPlan("q181_time_weighted_avg")
    assert(!p.contains("Join"), p.take(3000))
    assert("Exchange hashpartitioning\\(user_id".r.findAllIn(p).size == 1,
      s"the aggregate must reuse the window's user partitioning:\n" +
        p.take(3000))
  }

  test("q182 RFM: quintile boundaries broadcast back map-side — no " +
      "ntile window over the customer frame") {
    val p = finalPlan("q182_rfm_segments")
    assert(!p.contains("Window"),
      s"scores must come from boundary comparison, not ntile:\n" +
        p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q183 Kaplan-Meier: windows ride the bounded lifetime-day frame " +
      "after two hash aggregates — no sort-merge join, no cartesian") {
    val p = finalPlan("q183_kaplan_meier")
    assert(!p.toLowerCase.contains("sortmergejoin") &&
      !p.contains("CartesianProduct"), p.take(3000))
    assert("HashAggregate".r.findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q184 Gini: ONE window, over the distinct-cents frame — no " +
      "per-member ranking") {
    val p = finalPlan("q184_gini_revenue")
    assert("Window".r.findAllIn(p).size == 1,
      s"only the distinct-value cumulative may window:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q185 daily ACF: one window on the post-aggregate day frame; " +
      "no join anywhere") {
    val p = finalPlan("q185_daily_acf")
    assert(!p.contains("Join"), p.take(3000))
    assert("Window".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("q186 Theil: pure aggregate pipeline — no window, no ranking, " +
      "no cartesian") {
    val p = finalPlan("q186_theil_decomposition")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      p.take(3000))
  }

  test("q187 triangles: closing-edge probe is a LEFT SEMI equi-join; " +
      "no cartesian, no nested-loop on the big frames") {
    val p = finalPlan("q187_triangle_census")
    assert(p.contains("LeftSemi"),
      s"the closing probe must be a semi join:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q188 weighted median: pass-2 probe broadcasts the 1-row target " +
      "bin — the fact frame never sort-merge joins") {
    val p = finalPlan("q188_weighted_median")
    assert(p.contains("BroadcastHashJoin"),
      s"the covering-bin probe must broadcast:\n${p.take(3000)}")
    assert(!p.toLowerCase.contains("sortmergejoin"), p.take(3000))
  }

  test("q189 coherent slice: both FK chains keep via LEFT SEMI joins; " +
      "no cartesian") {
    val p = finalPlan("q189_coherent_slice")
    assert("LeftSemi".r.findAllIn(p).size >= 2,
      s"orders and lineitem must both keep via semi joins:\n" +
        p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q190 partition advisor: ALL candidates profile in ONE fact " +
      "scan — the stacked explode, not one GROUP BY per candidate") {
    val p = finalPlan("q190_partition_advisor")
    assert("Scan parquet".r.findAllIn(p).size == 1,
      s"k candidates must not mean k scans:\n${p.take(3000)}")
    assert(!p.contains("Join"), p.take(3000))
  }

  test("q191 Markov holdout: the model broadcasts into the eval side; " +
      "no sort-merge join") {
    val p = finalPlan("q191_markov_holdout")
    assert(p.contains("BroadcastHashJoin"),
      s"the |types|^2 model must broadcast:\n${p.take(3000)}")
    assert(!p.toLowerCase.contains("sortmergejoin"), p.take(3000))
  }

  test("q192 cross-correlation: lag alignment joins the bounded day " +
      "frames — the facts themselves never join, no window anywhere") {
    val p = finalPlan("q192_ship_lag_xcorr")
    assert(!p.contains("Window") && !p.contains("CartesianProduct"),
      p.take(3000))
    // both inputs aggregate to day frames BEFORE the lag join
    assert("HashAggregate".r.findAllIn(p).size >= 4, p.take(3000))
  }

  test("q194 CUPED: subject aggregate is the only fact exchange; the " +
      "pooled moments broadcast — no window, no sort-merge join") {
    val p = finalPlan("q194_cuped_readout")
    assert(!p.contains("Window") &&
      !p.toLowerCase.contains("sortmergejoin"), p.take(3000))
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2,
      s"only the custkey and 2-row arm aggregates may shuffle:\n" +
        p.take(3000))
  }

  test("q201 partition checksums: one scan, map-side partial digests — " +
      "no join, no window") {
    val p = finalPlan("q201_partition_checksums")
    assert(!p.contains("Join") && !p.contains("Window"), p.take(3000))
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1, p.take(3000))
    assert(p.contains("partial_sum"),
      s"the additive digest must combine map-side:\n${p.take(3000)}")
  }

  test("q200 SQL surface: probes broadcast into the codegen'd cosine " +
      "scan; one top-k window; no sort-merge join") {
    val p = finalPlan("q200_sql_surface")
    assert(!p.toLowerCase.contains("sortmergejoin"), p.take(3000))
    // count the Window node itself — Spark 4 also plans WindowGroupLimit
    // rank-pushdown nodes around it (a good thing, not a second window)
    assert("Window \\[".r.findAllIn(p).size == 1, p.take(3000))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q199 purchase cadence: gap histogram persists — one fact scan " +
      "feeds the model scalars and the cumulative readout") {
    val p = finalPlan("q199_purchase_cadence")
    assert(p.contains("InMemoryTableScan"), p.take(3000))
    assert("orders\\.parquet".r.findAllIn(p).size == 1,
      s"the fact must be scanned once:\n${p.take(3000)}")
  }

  test("q198 seasonal index: one window on the bounded month frame, " +
      "no join") {
    val p = finalPlan("q198_seasonal_index")
    assert(!p.contains("Join"), p.take(3000))
    assert("Window".r.findAllIn(p).size == 1, p.take(3000))
  }

  test("q196 NRR: the (customer, year) frame persists — orders scans " +
      "once for cohorts, horizons and the base divisor") {
    val p = finalPlan("q196_revenue_retention")
    assert(p.contains("InMemoryTableScan"), p.take(3000))
    assert("orders\\.parquet".r.findAllIn(p).size == 1,
      s"the fact must be scanned once:\n${p.take(3000)}")
  }

  test("q197 price-volume bridge: ONE fact pass of conditional " +
      "aggregates — no year self-join, no window") {
    val p = finalPlan("q197_price_volume_bridge")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"both years must come from one scan:\n${p.take(3000)}")
    assert(!p.contains("Window"), p.take(3000))
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q193 cycle time: the day histogram persists so the FK join runs " +
      "once; windows ride the histogram, never the joined fact") {
    val p = finalPlan("q193_cycle_time")
    // marks + final projection both read the persisted histogram, so
    // the fact is scanned and FK-joined exactly once
    assert(p.contains("InMemoryTableScan"),
      s"the day histogram must persist:\n${p.take(3000)}")
    assert("lineitem\\.parquet".r.findAllIn(p).size == 1,
      s"the fact must be scanned once:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q207 duplicated spans: hash-keyed shuffles only, LEFT SEMI rejoin, " +
      "no cartesian") {
    val p = finalPlan("q207_duplicated_spans")
    assert(p.contains("LeftSemi"), p.take(3000))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q208 winnowing: fingerprint selection is projection-shaped — the " +
      "md5-shingle array never re-evaluates per window position") {
    val p = finalPlan("q208_winnow_pairs")
    // one materialized hs projection per scan side: the md5 transform
    // appears as a named column, not inlined into the per-position lambda
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(3000))
    assert(p.contains("LeftSemi"),
      s"df-guard must prefilter via LEFT SEMI:\n${p.take(3000)}")
  }

  test("q209 chunk rebuild: winners aggregate map-side; rebuild joins only " +
      "position lists back to the doc scan") {
    val p = finalPlan("q209_chunk_dedup_rebuild")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    // kept-position lists are dimension-thin: the doc-side join must not
    // shuffle passage text — no Exchange may carry the passage column
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(3000))
  }

  test("q210 retrieval eval: corpus stats and probe terms broadcast; the " +
      "only corpus exchanges are the tf and score aggregates") {
    val p = finalPlan("q210_retrieval_eval")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"dfT/stats/probes must broadcast:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Window "),
      s"rank must be an aggregate, not a corpus window:\n${p.take(3000)}")
  }

  test("q211 naive Bayes: the model grid and priors broadcast into the " +
      "scoring stream; argmax is an aggregate, not a window") {
    val p = finalPlan("q211_naive_bayes")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"grid + priors must broadcast:\n${p.take(3000)}")
    assert(!p.contains("Window "),
      s"argmax must not window:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q213 AUC: ranking windows run per class over the eval slice; " +
      "model joins broadcast") {
    val p = finalPlan("q213_classifier_auc")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q214 context pack: the k-row head broadcasts; packing windows " +
      "never touch the corpus") {
    val p = finalPlan("q214_rag_context_pack")
    assert(p.contains("BroadcastHashJoin"),
      s"head must broadcast into the length projection:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q215 calibration: the d-row stats frame broadcasts back into the " +
      "error scan") {
    val p = finalPlan("q215_int8_calibration")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
    assert(!p.contains("Window "),
      s"per-dim stats must aggregate, not window:\n${p.take(3000)}")
  }

  test("q216 matryoshka: probe sets broadcast into both corpus scans; " +
      "no cartesian") {
    val p = finalPlan("q216_matryoshka_audit")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert("BroadcastHashJoin|BroadcastNestedLoopJoin".r
      .findAllIn(p).nonEmpty, p.take(3000))
  }

  test("q218 passage filter: kept positions are the only doc-keyed " +
      "shuffle; no cartesian, surprisal table joins on the token key") {
    val p = finalPlan("q218_passage_filter")
    assert(!p.contains("CartesianProduct"), p.take(3000))
    assert(!p.contains("Window "),
      s"the rebuild must not window:\n${p.take(3000)}")
  }

  test("q212 temperature mix: one corpus aggregate, then dimension-frame " +
      "windows only") {
    val p = finalPlan("q212_temperature_mix")
    // the only scan-sized work is the groupBy(lang) token count; windows
    // run on the post-agg group frame
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      s"corpus must scan once:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q220 epoch shuffle: id-only pruned scan, ONE hash shuffle (the " +
      "shard exchange) before the rank window") {
    val p = finalPlan("q220_epoch_shuffle")
    assert(p.contains("ReadSchema: struct<doc_id:bigint>"),
      s"scan must prune to the id column:\n${p.take(3000)}")
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      s"only the shard exchange may hash-shuffle:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q221 ngram novelty: hash-keyed aggregates only — no gram-keyed " +
      "join, doc-keyed frames broadcast") {
    val p = finalPlan("q221_ngram_novelty")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("SortMergeJoin"),
      s"the doc-keyed join must broadcast, and no gram-keyed pair join " +
        s"may exist:\n${p.take(3000)}")
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("q222 heaps law: boundary frame broadcasts into both <=-joins; " +
      "fit windows run post-aggregate") {
    val p = finalPlan("q222_heaps_law")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      s"both cumulative counts must broadcast the boundaries:\n" +
        p.take(3000))
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q223 char coverage: one corpus scan into the frequency " +
      "aggregate; rank windows on the alphabet frame only") {
    val p = finalPlan("q223_char_coverage")
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      s"corpus must scan once:\n${p.take(3000)}")
    assert(!p.contains("Join"),
      s"coverage is aggregate+window only:\n${p.take(3000)}")
  }

  test("q224 shard manifest: join-free — one fused-tokenize aggregate, " +
      "then the nShards-row dimension frame") {
    val p = finalPlan("q224_shard_manifest")
    assert(!p.contains("Join"),
      s"the manifest needs no join:\n${p.take(3000)}")
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      s"corpus must scan once:\n${p.take(3000)}")
  }

  test("q225 packing audit: one corpus scan, every candidate length " +
      "profiled in the same pass, no join") {
    val p = finalPlan("q225_packing_audit")
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      s"corpus must scan once for ALL candidate lengths:\n${p.take(3000)}")
    assert(!p.contains("Join"), s"audit is scan+window+agg:\n${p.take(3000)}")
  }

  test("q226 contamination report: benchmark grams broadcast into the " +
      "corpus gram scan; no cartesian") {
    val p = finalPlan("q226_contamination_report")
    assert(p.contains("BroadcastHashJoin"),
      s"bench side must broadcast:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q227 prefix cache: ONE corpus scan into the prefix aggregate — " +
      "no join, no window") {
    val p = finalPlan("q227_prefix_cache_share")
    assert("documents\\.parquet".r.findAllIn(p).size == 1,
      s"corpus must scan once:\n${p.take(3000)}")
    assert(!p.contains("Join") && !p.contains("Window "),
      s"rollup is two stacked aggregates:\n${p.take(3000)}")
  }

  test("q229 compaction plan: facts never re-scan (inventory is " +
      "checkpointed metadata); plan windows ride it, no join") {
    // the inventory localCheckpoints at construction (q133's precedent),
    // so the audited plan must run on the checkpoint scan alone
    val p = finalPlan("q229_compaction_plan")
    assert(!p.contains("lineitem.parquet"),
      s"post-checkpoint plan must not touch facts:\n${p.take(3000)}")
    assert(!p.contains("Join"), s"planner is metadata-only:\n${p.take(3000)}")
  }

  test("q230 clustering depth: the inequality self-join runs on the " +
      "checkpointed metadata frame only — facts never re-scan") {
    val p = finalPlan("q230_clustering_depth")
    assert(!p.contains("lineitem.parquet"),
      s"post-checkpoint plan must not touch facts:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct"), p.take(3000))
  }

  test("q219 batch parity: no per-group buffering operator — ordering " +
      "comes from the external sort, the fold is a lazy mapPartitions") {
    // the earlier flatMapGroupsWithState-on-batch form buffered each
    // shard's FULL history in one task (batch.toArray.sortBy) — at 100×
    // the events table that's a task OOM; the scale-safe shape is
    // repartition + spillable sortWithinPartitions + iterator fold
    val p = finalPlan("q219_heavy_hitters_parity")
    assert(!p.contains("FlatMapGroupsWithState"),
      s"batch form must not group-buffer:\n${p.take(3000)}")
    assert(p.contains("Sort ") || p.contains("Sort["),
      s"ordering must come from the external sort:\n${p.take(3000)}")
    assert(p.contains("MapPartitions"),
      s"fold must be the lazy mapPartitions:\n${p.take(3000)}")
  }

  test("q231/q232/q237 monitor parity forms: same scale-safe shape as " +
      "q219 — external sort + lazy fold, never a group buffer") {
    Seq("q231_variance_monitor_parity", "q232_burst_monitor_parity",
        "q237_neardup_stream_parity")
      .foreach { qid =>
        val p = finalPlan(qid)
        assert(!p.contains("FlatMapGroupsWithState"),
          s"$qid must not group-buffer:\n${p.take(3000)}")
        assert(p.contains("MapPartitions"),
          s"$qid fold must be the lazy mapPartitions:\n${p.take(3000)}")
      }
  }
}
