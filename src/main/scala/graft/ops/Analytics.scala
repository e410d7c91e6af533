package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.TableCatalog

/** Extras tier (SURVEY.md §2.11): the analytic operator families the
  * reference never exercises but the north star requires — grouped/window/
  * rollup aggregation, set ops, approximate distinct, dedup, embedding
  * similarity, text stats, JSON, event-time windows. All Spark built-ins;
  * partial (map-side) aggregation, AQE join planning and parquet pushdown
  * come from Catalyst.
  */
object Analytics {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    TableCatalog.load(spark, dir, name)

  // ---------------------------------------------------------------- q21
  /** Grouped aggregation with the full agg family (hash aggregate with
    * map-side partials; doubles summed via exact decimal). */
  def q21GroupAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        davg(col("l_discount"), scale = 6).as("avg_disc"),
        min(col("l_shipdate")).as("min_ship"),
        max(col("l_shipdate")).as("max_ship"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- q22
  /** Exact dedup keyed on a content hash (Dedup.exactByHash): the shuffle
    * carries a 64-char digest, not document bodies — the 100 TB-safe
    * formulation of dropDuplicates(text). */
  def q22DedupExact(spark: SparkSession, dir: String): DataFrame =
    Dedup.exactByHash(t(spark, dir, "documents"), "text", "doc_id")
      .orderBy("keep_id")

  // ---------------------------------------------------------------- q23
  /** MinHash-LSH near-dup pairs (MLlib; seeded) — registered as the
    * planted-pair recall envelope ([[Dedup.plantedPairEnvelope]]): 20
    * one-token-appended copies are planted (Jaccard ≈ 0.93–0.97, far
    * inside the 0.6-distance cut) and the oracle pins "the detector
    * recovers ≥60% of them" (measured 20/20 at sf0.01 AND sf0.1; 3
    * seeded hash tables put the per-pair miss probability under 1e-3).
    * The raw pair list stays engine-specific (seeded LSH) and is what
    * the bench times ([[q23NeardupMinhashPairs]]). */
  def q23NeardupMinhash(spark: SparkSession, dir: String): DataFrame = {
    val docs = t(spark, dir, "documents")
    Dedup.plantedPairEnvelope(
      Dedup.minhashNearDupPairs(
        Dedup.plantTextDups(docs, "doc_id", "text"),
        "text", "doc_id", maxDistance = 0.6),
      docs.filter(col("doc_id") < 20)
        .select((col("doc_id") + 1000000L).as("planted_id")),
      offset = 1000000L, floor = 0.6)
  }

  /** q23's BENCH form: the production pair scan over the raw corpus. */
  def q23NeardupMinhashPairs(spark: SparkSession, dir: String): DataFrame =
    Dedup.minhashNearDupPairs(t(spark, dir, "documents"), "text", "doc_id",
        maxDistance = 0.6)
      .orderBy("id_a", "id_b")

  // ---------------------------------------------------------------- q24
  /** Embedding cosine top-k, exact brute force: query set broadcast, corpus
    * scanned once, ranked per query. Similarity rounded + id tiebreak for
    * cross-engine-stable ranking. */
  def q24CosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = t(spark, dir, "embeddings")
    Similarity.bruteForceTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < 10),
        idCol = "vec_id", embCol = "embedding", k = 5)
      .orderBy("query_id", "rn")
  }

  // ---------------------------------------------------------------- q25
  /** Window functions: row_number / lag / running sum per customer ordered
    * by (date, key) — unique ordering keys keep lag deterministic. */
  def q25WindowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    t(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"),
        row_number().over(w).cast("long").as("rn"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        sum(col("o_totalprice").cast("decimal(18,4)"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("running_total"))
      .orderBy("o_custkey", "rn")
  }

  // ---------------------------------------------------------------- q26
  /** Tumbling event-time window (batch form of the streaming agg;
    * upgradeable to readStream + withWatermark unchanged). */
  def q26TumblingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  // ---------------------------------------------------------------- q27
  /** Approximate distinct via HLL++ next to the exact count. The HLL
    * estimate itself is engine-specific, so the query emits the q93
    * envelope form the oracle CAN check: the exact count (value-exact
    * both sides) plus an in-engine boolean that the estimate landed
    * inside the ±5% envelope (rsd 0.02), which the oracle expects TRUE.
    * Spark's HLL++ is deterministic for a given input set, so the
    * boolean is a stable claim, not a flaky one. */
  def q27ApproxDistinct(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .select(col("l_returnflag"), col("exact_parts"),
        (abs(col("approx_parts") - col("exact_parts")) <=
          col("exact_parts").cast("double") * 0.05).as("est_ok"))
      .orderBy("l_returnflag")

  /** Mergeable distinct-count sketches — the incremental-analytics pattern
    * q27's one-shot `approx_count_distinct` can't express: build a compact
    * HLL sketch PER FINE BUCKET (here per day), store it, and answer any
    * coarser rollup (week, month, all-time) by UNIONING sketches — no
    * re-scan of the fact data, which at 100 TB is the difference between a
    * metadata query and a day-long job. Spark's Datasketches-backed
    * `hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate` do the
    * heavy lifting; sketches are a few KB each, so the rollup aggregate
    * moves |buckets|·KB, never the corpus. */
  def hllSketchBuckets(df: DataFrame, bucket: Column, item: Column,
                       lgK: Int = 12): DataFrame =
    df.groupBy(bucket.as("bucket"))
      .agg(call_function("hll_sketch_agg", item, lit(lgK)).as("sketch"))

  /** Roll fine-bucket sketches up to a coarser grain and estimate. */
  def hllRollup(sketches: DataFrame, coarse: Column): DataFrame =
    sketches.groupBy(coarse.as("grain"))
      .agg(call_function("hll_sketch_estimate",
        call_function("hll_union_agg", col("sketch"))).as("est_distinct"))

  // ---------------------------------------------------------------- q93
  /** Weekly distinct users via daily HLL sketches unioned per week, with
    * the exact count alongside. Oracle design: the EXACT count pins
    * value-exact at every scale, and the estimate is published as an
    * in-engine envelope check (`est_ok` = within 5%, ~3σ for lgK=12) that
    * the oracle expects TRUE — a broken sketch pipeline (wrong union,
    * lost buckets) emits FALSE rows and hash-fails. The raw estimate is
    * deliberately NOT a pinned column: Datasketches HLL is only
    * coupon-exact below a few hundred distinct items (measured: exact
    * through ~384 at lgK=12, est 1504.51 at 1500 true), so pinning it to
    * COUNT(DISTINCT) would break at any scale past the sf0.01 gate. */
  def q93HllWeeklyUsers(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val daily = hllSketchBuckets(e, date_trunc("day", col("ts")),
      col("user_id"))
    val weekly = hllRollup(daily, date_trunc("week", col("bucket")))
    val exact = e.groupBy(date_trunc("week", col("ts")).as("grain"))
      .agg(countDistinct(col("user_id")).as("exact_distinct"))
    weekly.join(exact, "grain")
      .select(col("grain").as("week"), col("exact_distinct"),
        (abs(col("est_distinct") - col("exact_distinct")) <=
          col("exact_distinct").cast("double") * 0.05).as("est_ok"))
      .orderBy("week")
  }

  // ---------------------------------------------------------------- q28
  /** Top-k: ORDER BY + LIMIT fused by Spark into TakeOrderedAndProject —
    * per-partition heaps, no global sort. */
  def q28Topk(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  // ---------------------------------------------------------------- q29
  /** Set operations: (A ∪ B) ∖ (A ∩ B) over customer key sets — exercises
    * union-distinct, intersect, except. */
  def q29Setops(spark: SparkSession, dir: String): DataFrame = {
    val c = t(spark, dir, "customer")
    val a = c.filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val b = c.filter(col("c_acctbal") > 5000).select("c_custkey")
    a.union(b).distinct()
      .except(a.intersect(b))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q30
  /** ROLLUP grouping sets with exact-decimal sums; NULL markers for
    * super-aggregate rows sort first (matching the oracle's NULLS FIRST). */
  def q30Rollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- q31
  /** Text statistics over documents: lengths, token counts, distinct
    * tokens, average token length — all codegen'd string/array built-ins,
    * no UDF. */
  def q31TextStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .withColumn("toks", split(col("text"), "\\s+"))
      .select(col("doc_id"), col("lang"), col("n_chars"),
        length(col("text")).cast("long").as("text_len"),
        size(col("toks")).cast("long").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("long").as("n_distinct_tokens"),
        round((length(col("text")) - (size(col("toks")) - 1))
          .cast("double") / size(col("toks")), 6).as("avg_token_len"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q32
  /** JSON extraction from the events.props string column. */
  def q32JsonExtract(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k_val"))
      .orderBy("event_id")

  // ---------------------------------------------------------------- q43
  /** Session windows over event time (batch form of Streams.sessionize —
    * identical code path compiles over readStream). Oracle via the
    * gaps-and-islands formulation: new session when the gap to the previous
    * event is >= 5 minutes; session end = last event + gap, matching
    * Spark's half-open session_window. */
  def q43SessionWindow(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.sessionize(
        t(spark, dir, "events"), gap = "5 minutes")
      .orderBy("user_id", "session_start")

  // ---------------------------------------------------------------- q45
  /** CUBE grouping sets (all four combinations of the two flags). */
  def q45Cube(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- q46
  /** Semi/anti joins (EXISTS / NOT EXISTS): parts that were ordered vs
    * parts never ordered, tagged and unioned. */
  def q46SemiAnti(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val li = t(spark, dir, "lineitem")
    val semi = p.join(li, p("p_partkey") === li("l_partkey"), "left_semi")
      .select(col("p_partkey")).withColumn("tag", lit("ordered"))
    val anti = p.join(li, p("p_partkey") === li("l_partkey"), "left_anti")
      .select(col("p_partkey")).withColumn("tag", lit("never_ordered"))
    semi.unionByName(anti).orderBy("tag", "p_partkey")
  }

  // ---------------------------------------------------------------- q47
  /** Exact COUNT(DISTINCT) per group (expand-based distinct aggregate). */
  def q47CountDistinctGroup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("distinct_parts"),
        countDistinct(col("l_suppkey")).as("distinct_supps"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q58
  /** PIVOT: order counts by status × priority. Pivot values are declared
    * explicitly — at scale an implicit pivot first runs a distinct-collect
    * job over the pivot column, and declared values keep the output schema
    * stable when a partition is missing a category. Absent combinations
    * fill 0 (count semantics). */
  def q58Pivot(spark: SparkSession, dir: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
      "4-NOT SPECIFIED", "5-LOW")
    t(spark, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderstatus")
  }

  // ---------------------------------------------------------------- q59
  /** Exact percentiles per group (Spark `percentile`, linear
    * interpolation — the same definition as DuckDB's quantile_cont, so
    * the oracle checks it exactly). The scale path is
    * `approx_percentile` (q27-style sketching); this is the exact
    * reference the sketch is judged against. */
  def q59Percentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("percentile(l_quantity, 0.25)").as("p25"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.75)").as("p75"),
        expr("percentile(l_extendedprice, 0.95)").as("price_p95"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q70
  /** Sketch-based percentiles (the 100 TB path q59 is the exact reference
    * for): `approx_percentile` merges bounded-size histograms map-side, so
    * per-group state is O(1/accuracy) instead of O(distinct values) —
    * exact `percentile` ships every distinct value of the group through
    * the shuffle. The sketch values themselves are engine-specific, so
    * the query emits the q93 envelope form the oracle CAN check: per
    * group, one boolean per estimate asserting it landed between the
    * EXACT percentiles at q ± 0.01 — a 10× margin over the sketch's
    * rank-error bound of 1/accuracy = 0.001 — which the oracle expects
    * TRUE. (The exact side is the audit, same as q93's exact
    * countDistinct beside the HLL; production rollups run the sketch
    * alone.) */
  def q70ApproxPercentiles(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)")
          .as("qa"),
        expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("pa"),
        expr("percentile(l_quantity, array(0.24, 0.26, 0.49, 0.51, " +
          "0.74, 0.76))").as("qb"),
        expr("percentile(l_extendedprice, array(0.94, 0.96))").as("pb"))
      .select(col("l_returnflag"),
        element_at(col("qa"), 1)
          .between(element_at(col("qb"), 1), element_at(col("qb"), 2))
          .as("p25_ok"),
        element_at(col("qa"), 2)
          .between(element_at(col("qb"), 3), element_at(col("qb"), 4))
          .as("p50_ok"),
        element_at(col("qa"), 3)
          .between(element_at(col("qb"), 5), element_at(col("qb"), 6))
          .as("p75_ok"),
        col("pa").between(element_at(col("pb"), 1), element_at(col("pb"), 2))
          .as("price_p95_ok"))
      .orderBy("l_returnflag")

  /** q70's BENCH form ([[graft.SparkEntry.benchForm]]): the sketch-only
    * production projection. The registered/oracle q70 runs the exact
    * `percentile` audit beside the sketch (correct, and what the DuckDB
    * envelope checks), but that audit ships every distinct group value
    * through the shuffle — the exact cost `approx_percentile` exists to
    * avoid — so benching the audit form would report the price of the
    * REFERENCE, not of the sketch. The bench runs this projection; the
    * oracle run keeps the envelope. */
  def q70SketchOnly(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        expr("approx_percentile(l_quantity, array(0.25, 0.5, 0.75), 1000)")
          .as("qa"),
        expr("approx_percentile(l_extendedprice, 0.95, 1000)").as("pa"))
      .select(col("l_returnflag"),
        element_at(col("qa"), 1).as("p25"),
        element_at(col("qa"), 2).as("p50"),
        element_at(col("qa"), 3).as("p75"),
        col("pa").as("price_p95"))
      .orderBy("l_returnflag")

  // ---------------------------------------------------------------- q78
  /** Skew-salted fact-to-dim join, aggregated: the lineitem fact side is
    * salted (deterministic per-row hash), the orders side replicated
    * salt-factor×, and the join key becomes (key, salt) — so one hot order
    * key spreads over `factor` tasks instead of pinning one. Results are
    * EXACTLY the plain join's (the oracle is the unsalted SQL); this is
    * the explicit-salting escape hatch for power-law keys that overwhelm
    * even AQE's skew-join splitting at 100 TB. */
  def q78SaltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val ord = t(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority"))
    Skew.saltedJoin(li, ord, "l_orderkey", factor = 8)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("o_orderpriority")
  }

  // ---------------------------------------------------------------- q60
  /** Sliding (hopping) windows: 1-hour windows every 30 minutes, so each
    * event lands in two overlapping windows. Same incremental shape as
    * q26; `window(ts, len, slide)` plans a generate of window starts —
    * no self-join. */
  def q60SlidingWindow(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  // ---------------------------------------------------------------- q61
  /** Inter-event gaps per user via lag(): event-time deltas are the raw
    * material of sessionization and engagement metrics. Gap math in exact
    * integer microseconds; the average divides two exact numbers so both
    * engines produce identical doubles. */
  def q61EventGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    t(spark, dir, "events")
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("gap_us",
        unix_micros(col("ts").cast("timestamp")) -
          unix_micros(col("prev_ts").cast("timestamp")))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        count(col("gap_us")).as("n_gaps"),
        max(col("gap_us")).as("max_gap_us"),
        // integer division: exact in both engines — a double average at
        // ~1e10 µs magnitude differs in the final ulp after rounding
        expr("sum(gap_us) div count(gap_us)").as("avg_gap_us"))
      .filter(col("n_gaps") > 0)
      .orderBy("user_id")
  }

  // ---------------------------------------------------------------- q62
  /** Explicit GROUPING SETS — the general form that rollup/cube (q30/q45)
    * specialize: per-returnflag totals, per-linestatus totals, and the
    * grand total in one aggregation pass (Catalyst expands to a single
    * Expand + partial/final aggregate, not three scans). */
  def q62GroupingSets(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "lineitem").createOrReplaceTempView("li_q62")
    spark.sql(
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |       ${dsumSql("l_quantity")} AS sum_qty
         |FROM li_q62
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag ASC NULLS FIRST,
         |         l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  // --------------------------------------------------------------- q175
  /** 2-D skyline (Pareto frontier): the rows no other row beats on BOTH
    * axes — here the parts where no alternative is simultaneously at
    * least as large AND at least as cheap (strictly better on one axis).
    * The multi-criteria answer a single weighted score can't give: every
    * skyline point is optimal under SOME size/price trade-off.
    *
    * Scale shape: the naive form is the O(n²) dominance anti-join the
    * ORACLE runs. Here dominance collapses onto the per-size minimum:
    * a row survives iff it is the cheapest at its own size (per-size
    * aggregate, map-side combine, |sizes| rows out) AND no strictly
    * larger size is as cheap or cheaper (a strict running min over the
    * size-DESC-ordered per-size frame — a window over |sizes| rows,
    * never facts). The fact table is touched by exactly one aggregate
    * and one broadcast-joined filter — no self-join, no global sort. */
  def skyline2d(df: DataFrame, maxCol: String, minCol: String): DataFrame = {
    val perMax = df.groupBy(col(maxCol))
      .agg(min(col(minCol)).as("best_min"))
    val wGt = Window.orderBy(col(maxCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perMax
      .withColumn("min_gt", min(col("best_min")).over(wGt))
    df.join(broadcast(frontier), Seq(maxCol))
      .filter(col(minCol) === col("best_min") &&
        (col("min_gt").isNull || col("min_gt") > col(minCol)))
      .drop("best_min", "min_gt")
  }

  /** q175 entry: the size/price-efficient frontier of the parts catalog. */
  def q175Skyline(spark: SparkSession, dir: String): DataFrame =
    skyline2d(t(spark, dir, "part")
        .select(col("p_partkey"), col("p_size"), col("p_retailprice")),
        maxCol = "p_size", minCol = "p_retailprice")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
      .orderBy("p_partkey")

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q175_skyline" -> q175Skyline _,
    "q21_group_agg" -> q21GroupAgg _,
    "q22_dedup_exact" -> q22DedupExact _,
    "q23_neardup_minhash" -> q23NeardupMinhash _,
    "q24_cosine_topk" -> q24CosineTopk _,
    "q25_window_rank" -> q25WindowRank _,
    "q26_tumbling_window" -> q26TumblingWindow _,
    "q27_approx_distinct" -> q27ApproxDistinct _,
    "q93_hll_weekly_users" -> q93HllWeeklyUsers _,
    "q28_topk" -> q28Topk _,
    "q29_setops" -> q29Setops _,
    "q30_rollup" -> q30Rollup _,
    "q31_text_stats" -> q31TextStats _,
    "q32_json_extract" -> q32JsonExtract _,
    "q43_session_window" -> q43SessionWindow _,
    "q45_cube" -> q45Cube _,
    "q46_semi_anti" -> q46SemiAnti _,
    "q47_count_distinct_group" -> q47CountDistinctGroup _,
    "q58_pivot" -> q58Pivot _,
    "q59_percentiles" -> q59Percentiles _,
    "q70_approx_percentiles" -> q70ApproxPercentiles _,
    "q78_salted_join_agg" -> q78SaltedJoinAgg _,
    "q60_sliding_window" -> q60SlidingWindow _,
    "q61_event_gaps" -> q61EventGaps _,
    "q62_grouping_sets" -> q62GroupingSets _)

  /** Oracle SQL (DuckDB dialect). q23 carries the planted-pair recall
    * envelope (rows pinned to the planted set, floor boolean TRUE); q27
    * and q70 carry the q93 envelope form (exact values pinned,
    * estimate-in-envelope booleans the oracle expects TRUE). */
  /** Bench-form overrides (see [[graft.SparkEntry.benchForm]]): the
    * oracle-registered q70 carries the exact-percentile audit beside the
    * sketch; the benchmark times the sketch-only production projection. */
  val benchForm: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_approx_percentiles" -> q70SketchOnly _,
    "q23_neardup_minhash" -> q23NeardupMinhashPairs _)

  val oracle: Map[String, String] = Map(
    // q23: planted-pair recall envelope — rows are the planted ids
    // themselves; the measured-floor boolean is the cross-engine claim
    "q23_neardup_minhash" ->
      Dedup.plantedEnvelopeOracle("documents", "doc_id"),
    // q27: exact distinct pinned value-exact; the HLL++ estimate is an
    // in-engine ±5% envelope boolean (rsd 0.02, deterministic sketch)
    "q27_approx_distinct" ->
      """SELECT l_returnflag,
        |       CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |       TRUE AS est_ok
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // q70: each sketch estimate must land between the exact percentiles
    // at q ± 0.01 (10x the sketch's 1/1000 rank-error bound) — the
    // booleans are the oracle-checkable claim; the raw estimates are
    // engine-specific by design
    "q70_approx_percentiles" ->
      """SELECT l_returnflag,
        |       TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok,
        |       TRUE AS price_p95_ok
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,
    // q175: the oracle is the INDEPENDENT O(n²) dominance anti-join the
    // engine's per-size-minimum formulation replaces — completeness of
    // the frontier collapse is exactly what's checked. Raw stored values
    // only, no float arithmetic.
    "q175_skyline" ->
      """SELECT p_partkey, p_size, p_retailprice
        |FROM part p
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM part q
        |  WHERE q.p_size >= p.p_size
        |    AND q.p_retailprice <= p.p_retailprice
        |    AND (q.p_size > p.p_size
        |         OR q.p_retailprice < p.p_retailprice))
        |ORDER BY p_partkey""".stripMargin,
    // q93: the exact count pins value-exact; the estimate column is an
    // in-engine 5% envelope check the oracle expects TRUE at every scale
    // (the raw estimate is only coupon-exact below ~384 distinct at
    // lgK=12, so it cannot be pinned to COUNT(DISTINCT) beyond the gate)
    "q93_hll_weekly_users" ->
      """SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct,
        |       TRUE AS est_ok
        |FROM events GROUP BY 1 ORDER BY week""".stripMargin,
    // q78: the oracle is the UNSALTED join — salting must be invisible in
    // the result.
    "q78_salted_join_agg" ->
      s"""SELECT o_orderpriority, COUNT(*) AS n,
         |       ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q21_group_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       COUNT(*) AS n,
         |       ${dsumSql("l_quantity")} AS sum_qty,
         |       ${dsumSql("l_extendedprice")} AS sum_price,
         |       ${davgSql("l_discount", scale = 6)} AS avg_disc,
         |       MIN(l_shipdate) AS min_ship,
         |       MAX(l_shipdate) AS max_ship
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q22_dedup_exact" ->
      """SELECT sha256(text) AS content_sha, MIN(doc_id) AS keep_id,
        |       COUNT(*) AS dup_count
        |FROM documents GROUP BY sha256(text) ORDER BY keep_id""".stripMargin,
    "q24_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id,
        |                  CAST(embedding AS DOUBLE[]) AS q_emb
        |           FROM embeddings WHERE vec_id < 10),
        |c AS (SELECT vec_id AS neighbor_id,
        |             CAST(embedding AS DOUBLE[]) AS c_emb
        |      FROM embeddings),
        |scored AS (
        |  SELECT q.query_id, c.neighbor_id,
        |         ROUND(list_dot_product(q.q_emb, c.c_emb) /
        |               (SQRT(list_dot_product(q.q_emb, q.q_emb)) *
        |                SQRT(list_dot_product(c.c_emb, c.c_emb))), 6) AS sim
        |  FROM q, c WHERE q.query_id <> c.neighbor_id),
        |ranked AS (
        |  SELECT query_id, neighbor_id, sim,
        |         ROW_NUMBER() OVER (PARTITION BY query_id
        |                            ORDER BY sim DESC, neighbor_id) AS rn
        |  FROM scored)
        |SELECT query_id, neighbor_id, sim, rn FROM ranked
        |WHERE rn <= 5 ORDER BY query_id, rn""".stripMargin,
    "q25_window_rank" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
        |       ROW_NUMBER() OVER w AS rn,
        |       LAG(o_totalprice, 1) OVER w AS prev_price,
        |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER
        |            (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |            AS DOUBLE) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, rn""".stripMargin,
    "q26_tumbling_window" ->
      s"""SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
         |       CAST(date_trunc('hour', ts) AS TIMESTAMP)
         |         + INTERVAL 1 HOUR AS window_end,
         |       event_type,
         |       COUNT(*) AS n_events,
         |       ${dsumSql("value")} AS sum_value
         |FROM events
         |GROUP BY 1, 2, 3
         |ORDER BY window_start, event_type""".stripMargin,
    "q28_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q29_setops" ->
      """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | UNION
        | SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |EXCEPT
        |(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        | INTERSECT
        | SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
        |ORDER BY c_custkey""".stripMargin,
    "q30_rollup" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |       ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q31_text_stats" ->
      """SELECT doc_id, lang, n_chars,
        |       LENGTH(text) AS text_len,
        |       LEN(string_split_regex(text, '\s+')) AS n_tokens,
        |       LEN(list_distinct(string_split_regex(text, '\s+')))
        |         AS n_distinct_tokens,
        |       ROUND(CAST(LENGTH(text)
        |               - (LEN(string_split_regex(text, '\s+')) - 1) AS DOUBLE)
        |             / LEN(string_split_regex(text, '\s+')), 6)
        |         AS avg_token_len
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q32_json_extract" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
        |FROM events ORDER BY event_id""".stripMargin,
    "q43_session_window" ->
      s"""WITH marked AS (
         |  SELECT user_id, ts, value,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |                OR ts - lag(ts) OVER w >= INTERVAL 5 MINUTE
         |              THEN 1 ELSE 0 END AS new_s
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
         |sess AS (
         |  SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
         |              ROWS UNBOUNDED PRECEDING) AS sid
         |  FROM marked)
         |SELECT CAST(MIN(ts) AS TIMESTAMP) AS session_start,
         |       CAST(MAX(ts) + INTERVAL 5 MINUTE AS TIMESTAMP) AS session_end,
         |       user_id,
         |       COUNT(*) AS n_events,
         |       ${dsumSql("value")} AS sum_value
         |FROM sess GROUP BY user_id, sid
         |ORDER BY user_id, session_start""".stripMargin,
    "q45_cube" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |       ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q46_semi_anti" ->
      """(SELECT p_partkey, 'ordered' AS tag FROM part p
        | WHERE EXISTS (SELECT 1 FROM lineitem l
        |               WHERE l.l_partkey = p.p_partkey))
        |UNION ALL
        |(SELECT p_partkey, 'never_ordered' AS tag FROM part p
        | WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        |                   WHERE l.l_partkey = p.p_partkey))
        |ORDER BY tag, p_partkey""".stripMargin,
    "q47_count_distinct_group" ->
      """SELECT l_returnflag,
        |       COUNT(DISTINCT l_partkey) AS distinct_parts,
        |       COUNT(DISTINCT l_suppkey) AS distinct_supps,
        |       COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q58_pivot" ->
      """SELECT o_orderstatus,
        |  count(*) FILTER (WHERE o_orderpriority = '1-URGENT')
        |    AS "1-URGENT",
        |  count(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS "2-HIGH",
        |  count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')
        |    AS "3-MEDIUM",
        |  count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED')
        |    AS "4-NOT SPECIFIED",
        |  count(*) FILTER (WHERE o_orderpriority = '5-LOW') AS "5-LOW"
        |FROM orders GROUP BY o_orderstatus
        |ORDER BY o_orderstatus""".stripMargin,
    "q59_percentiles" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_quantity, 0.25) AS p25,
        |       quantile_cont(l_quantity, 0.5) AS p50,
        |       quantile_cont(l_quantity, 0.75) AS p75,
        |       quantile_cont(l_extendedprice, 0.95) AS price_p95
        |FROM lineitem GROUP BY l_returnflag
        |ORDER BY l_returnflag""".stripMargin,
    // q60: len = 2×slide, so every event belongs to exactly two windows:
    // the one starting at its 30-minute bucket and the one 30 minutes
    // earlier. The k-unnest reproduces Spark's window-start generation.
    "q60_sliding_window" ->
      s"""SELECT ws AS window_start,
         |       ws + INTERVAL 1 HOUR AS window_end,
         |       event_type,
         |       COUNT(*) AS n_events,
         |       ${dsumSql("value")} AS sum_value
         |FROM (
         |  SELECT e.*,
         |         time_bucket(INTERVAL '30 minutes', ts)
         |           - k.k * INTERVAL '30 minutes' AS ws
         |  FROM events e
         |  CROSS JOIN (SELECT unnest([0, 1]) AS k) k)
         |GROUP BY 1, 2, 3
         |ORDER BY window_start, event_type""".stripMargin,
    "q61_event_gaps" ->
      """WITH g AS (
        |  SELECT user_id,
        |         date_diff('microsecond',
        |           lag(ts, 1) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id),
        |           ts) AS gap_us
        |  FROM events)
        |SELECT user_id,
        |       COUNT(*) AS n_events,
        |       COUNT(gap_us) AS n_gaps,
        |       MAX(gap_us) AS max_gap_us,
        |       CAST(SUM(gap_us) AS BIGINT) // COUNT(gap_us) AS avg_gap_us
        |FROM g GROUP BY user_id
        |HAVING COUNT(gap_us) > 0
        |ORDER BY user_id""".stripMargin,
    "q62_grouping_sets" ->
      s"""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
         |       ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem
         |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
         |ORDER BY l_returnflag ASC NULLS FIRST,
         |         l_linestatus ASC NULLS FIRST""".stripMargin)
}
