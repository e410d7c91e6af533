package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.TableCatalog

/** Corpus- and event-insight operators: lexical statistics (TF-IDF,
  * Zipf frequencies), funnel analysis, statistical outlier detection,
  * histograms, and composition reporting. The reporting layer of a
  * training-data pipeline — what you run to KNOW a corpus before and
  * after the dedup/filter/mix stages reshape it.
  *
  * All pure DataFrame transforms: hash-aggregated with map-side partials,
  * window functions over bounded post-aggregate frames (one documented
  * exception: q80's ntile, which is total-order by definition and
  * restricted to dimension-sized inputs — see its scaladoc for the
  * fact-scale alternative), small stat tables broadcast back against the
  * fact scan. No UDFs, no collects.
  */
object Insights {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    TableCatalog.load(spark, dir, name)

  /** Per-document TF-IDF top terms: tf on (doc, term), document frequency
    * on term, score = tf · ln(N/df), top `k` per document.
    *
    * Scale shape: one shuffle keyed (doc_id, term) for tf, one keyed term
    * for df (both partial-aggregated map-side), df and the one-row N
    * broadcast back, and the top-k window partitions by doc_id — no
    * global sort, no skew (the heaviest key is one document's vocabulary).
    */
  def tfidfTopTerms(df: DataFrame, textCol: String, idCol: String,
                    k: Int = 3): DataFrame = {
    val toks = df.select(col(idCol),
      explode(Text.tokens(col(textCol))).as("term"))
    // persist: tf feeds document frequency, corpus size AND the score
    // join. Cache contract matches graft.ops.Dedup: the caller/harness
    // releases caches once the result is consumed (the returned frame is
    // lazy, so the operator itself cannot unpersist first).
    val tf = toks.groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf")).persist()
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = tf.select(countDistinct(col(idCol)).as("n_docs"))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 6))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select(col(idCol), col("term"), col("tf"), col("df"), col("score"),
        col("rnk"))
  }

  /** Corpus-level token frequencies (the Zipf curve head): explode tokens,
    * count per term, keep the top `k` by (count desc, term asc). The final
    * rank window runs over k rows only — candidate selection is a fused
    * TakeOrderedAndProject (per-partition heaps), never a global sort. */
  def tokenZipf(df: DataFrame, textCol: String, k: Int = 50): DataFrame = {
    val top = df.select(explode(Text.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("term").asc)
      .limit(k)
    top.withColumn("rnk",
        row_number().over(Window.orderBy(col("n").desc, col("term").asc))
          .cast("long"))
      .select("term", "n", "rnk")
  }

  /** One-pass table profile: per column — row count, nulls, exact distinct
    * count, numeric min/max. The `ANALYZE TABLE` a pipeline runs before
    * choosing partition keys, salting thresholds, and file layout. All
    * metrics ride ONE aggregate (count-distincts expand map-side; no
    * per-column scans), then a `stack` unpivots the single row into the
    * per-column report. `numericCols` opts columns into min/max (emitted
    * as double; null for the rest). */
  def profileTable(df: DataFrame, numericCols: Set[String]): DataFrame = {
    val cols = df.columns.toSeq
    def mm(c: String, f: Column => Column): Column =
      if (numericCols(c)) f(col(c)).cast("double")
      else lit(null).cast("double")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__nn"),
        countDistinct(col(c)).as(s"${c}__nd"),
        mm(c, min).as(s"${c}__mn"),
        mm(c, max).as(s"${c}__mx"))
    } :+ count(lit(1)).as("__n")
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot via explode-of-structs built with the Column API: column
    // names ride as lit() DATA, never interpolated into parsed SQL text,
    // so a quote or backtick in a name cannot break or corrupt the plan
    val entries = cols.map { c =>
      struct(lit(c).as("col_name"), col(s"${c}__nn").as("nn"),
        col(s"${c}__nd").as("n_distinct"), col(s"${c}__mn").as("min_num"),
        col(s"${c}__mx").as("max_num"))
    }
    one.select(col("__n").as("n_rows"), explode(array(entries: _*)).as("m"))
      .select(col("m.col_name").as("col_name"), col("n_rows"),
        (col("n_rows") - col("m.nn")).as("n_null"),
        col("m.n_distinct").as("n_distinct"), col("m.min_num").as("min_num"),
        col("m.max_num").as("max_num"))
  }

  // ---------------------------------------------------------------- q64
  /** TF-IDF top-3 terms per document. */
  def q64TfidfTopTerms(spark: SparkSession, dir: String): DataFrame =
    tfidfTopTerms(t(spark, dir, "documents").select(col("doc_id"),
        col("text")), "text", "doc_id", k = 3)
      .orderBy("doc_id", "rnk")

  // ---------------------------------------------------------------- q65
  /** Global top-50 tokens with ranks. */
  def q65TokenZipf(spark: SparkSession, dir: String): DataFrame =
    tokenZipf(t(spark, dir, "documents"), "text", k = 50)
      .orderBy("rnk")

  // ---------------------------------------------------------------- q66
  /** Event funnel view → click → purchase, strictly ordered by each
    * user's FIRST occurrence of each stage. One conditional-min aggregate
    * per user (single shuffle on user_id), then one global fold to the
    * four funnel counters — the standard product-analytics query at
    * event-log scale. */
  def q66EventFunnel(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val perUser = e.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "view", col("ts"))).as("t_view"),
      min(when(col("event_type") === "click", col("ts"))).as("t_click"),
      min(when(col("event_type") === "purchase", col("ts"))).as("t_purchase"))
    perUser.agg(
      count(lit(1)).as("n_users"),
      count(col("t_view")).as("n_view"),
      // coalesce: over an empty/click-free slice SUM yields NULL while the
      // oracle COALESCEs to 0 — match it so the funnel is total on any input
      coalesce(sum(when(col("t_click") > col("t_view"), 1L).otherwise(0L)),
        lit(0L)).as("n_view_click"),
      coalesce(sum(when(col("t_click") > col("t_view") &&
          col("t_purchase") > col("t_click"), 1L).otherwise(0L)),
        lit(0L)).as("n_full_funnel"))
  }

  // ---------------------------------------------------------------- q67
  /** Statistical outliers: events whose value is >3 sample standard
    * deviations from their event type's mean. Moments come from ONE
    * aggregate pass (exact decimal sums of x and x², so both engines
    * derive bit-identical means/deviations); the 5-row stats table
    * broadcasts back against the fact scan — no window over the raw
    * events, no second shuffle. */
  def q67ZscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
    val stats = e.groupBy(col("event_type")).agg(
        count(col("value")).as("n"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("s"),
        sum((col("value") * col("value")).cast("decimal(28,6)"))
          .cast("double").as("ss"))
      .withColumn("mean", col("s") / col("n"))
      .withColumn("sd",
        sqrt((col("ss") - col("s") * col("s") / col("n")) / (col("n") - 1)))
      .select("event_type", "mean", "sd")
    e.join(broadcast(stats), "event_type")
      .withColumn("z", round((col("value") - col("mean")) / col("sd"), 6))
      .filter(abs(col("z")) > 3.0)
      .select(col("event_id"), col("event_type"), col("value"), col("z"))
      .orderBy("event_id")
  }

  // ---------------------------------------------------------------- q68
  /** Fixed-width histogram of order totals: 20 buckets of 25k, top bucket
    * open-ended. Pure map-side bucketing + one aggregate — the shape
    * profiling query that precedes any partitioning/salting decision. */
  def q68PriceHistogram(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "orders")
      .withColumn("bucket",
        least(floor(col("o_totalprice") / 25000.0), lit(19L)).cast("long"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        dsum(col("o_totalprice")).as("sum_price"))
      .orderBy("bucket")

  // ---------------------------------------------------------------- q69
  /** Corpus composition: documents and characters per (source, language),
    * with each cell's share of the whole. The share window runs over the
    * post-aggregate frame (|sources|×|langs| rows), never the corpus. */
  def q69CorpusShare(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
      .withColumn("pct_docs",
        round(col("n_docs") * 100.0 /
          sum(col("n_docs")).over(Window.partitionBy()), 6))
      .orderBy("source", "lang")

  // ---------------------------------------------------------------- q71
  /** Profile of the orders table (numeric stats on the key/price cols). */
  def q71TableProfile(spark: SparkSession, dir: String): DataFrame =
    profileTable(t(spark, dir, "orders"),
        numericCols = Set("o_orderkey", "o_custkey", "o_totalprice"))
      .orderBy("col_name")

  // ---------------------------------------------------------------- q76
  /** Last-touch attribution: each purchase credits the user's latest
    * strictly-earlier non-purchase event; revenue rolls up by touch type.
    * The attribution pass is ONE window over (user, time) — max of a
    * (ts, id, type) struct, lexicographic so ties resolve on event id —
    * with no self-join; purchases with no prior touch credit 'none'. */
  def q76LastTouchAttribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(spark, dir, "events")
      .withColumn("prev",
        max(when(col("event_type") =!= "purchase",
          struct(col("ts"), col("event_id"), col("event_type")))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("value"),
        coalesce(col("prev.event_type"), lit("none")).as("touch_type"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_purchases"), dsum(col("value")).as("sum_value"))
      .orderBy("touch_type")
  }

  // ---------------------------------------------------------------- q77
  /** Day-over-day revenue deltas: daily aggregate, then lag over the
    * (post-aggregate, bounded) day series — the standard time-series
    * report; the global-order window never sees the raw fact table. */
  def q77DailyRevenueDelta(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    val w = Window.orderBy(col("day"))
    daily
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("delta", round(col("revenue") - col("prev_revenue"), 4))
      .withColumn("pct_change",
        when(col("prev_revenue") =!= 0.0,
          round((col("revenue") - col("prev_revenue")) * 100.0 /
            col("prev_revenue"), 6)))
      .orderBy("day")
  }

  // ---------------------------------------------------------------- q79
  /** Trailing 7-day revenue per day — a RANGE-frame window (value-based,
    * vs q25's ROWS frame): each day sums the revenue of days within
    * [day-6, day], regardless of how many day-rows exist (gaps count as
    * zero, which a ROWS frame would get wrong). The window runs over the
    * bounded post-aggregate day series keyed by an integer day number so
    * both engines frame identically. */
  def q79TrailingWindow(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
      .withColumn("day_num", datediff(col("day"), lit("1970-01-01")).cast("long"))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      .withColumn("trailing_7d",
        round(sum(col("revenue")).over(w), 4))
      .select("day", "revenue", "trailing_7d")
      .orderBy("day")
  }

  // ---------------------------------------------------------------- q80
  /** Hard bound for operators that plan an un-partitioned exact window
    * (single-task global sort): inputs past this are fact-scale and must
    * use the boundary-based shapes instead. 10M rows of a slim dimension
    * projection sort in one task in seconds; past that the single task
    * becomes the job. */
  val DimensionRowBound = 10_000_000L

  /** Enforce the dimension-size contract for single-task exact-sort
    * operators: fail fast (after reading at most `bound + 1` rows — the
    * probe is a limit-count, not a full scan) instead of silently
    * planning a global sort over fact-scale input. */
  private[graft] def requireDimensionSized(df: DataFrame, op: String,
      bound: Long = DimensionRowBound): DataFrame = {
    val probe = df.limit((bound + 1).toInt).count()
    require(probe <= bound,
      s"$op: input exceeds $bound rows — exact ntile plans a SINGLE-TASK " +
        "global sort, reserved for dimension-sized inputs. Fact-scale " +
        "bucketing goes through percentile boundaries applied map-side " +
        "(q70 approx boundaries + q68 CASE bucket / q119 shape).")
    df
  }

  /** Customer deciles by account balance (ntile) with per-decile stats —
    * the quantile-bucketing reporting pattern; ntile is deterministic
    * under a total order, so the decile assignment itself is
    * oracle-checkable.
    *
    * Scale contract — ENFORCED by [[requireDimensionSized]]: exact ntile
    * REQUIRES a total order (Spark plans the un-partitioned window as a
    * single-task sort), so this operator is for dimension-sized inputs —
    * customers, not fact rows. Bucketing a fact-scale column goes
    * through `approx_percentile` boundaries (q70) applied as a map-side
    * width/CASE bucket (q68 shape): same report, no global sort. */
  def q80CustomerDeciles(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("c_acctbal"), col("c_custkey"))
    requireDimensionSized(t(spark, dir, "customer"), "q80_customer_deciles")
      .withColumn("decile", ntile(10).over(w).cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        min(col("c_acctbal")).as("min_bal"),
        max(col("c_acctbal")).as("max_bal"),
        dsum(col("c_acctbal")).as("sum_bal"))
      .orderBy("decile")
  }

  // ---------------------------------------------------------------- q81
  /** Weekly cohort retention: users grouped by their FIRST active week,
    * tracked across subsequent weeks. Shape: distinct (user, week)
    * activity joins the per-user cohort assignment on user_id (both
    * sides user-keyed — co-partitioned shuffle, no broadcast needed at
    * any scale), aggregates to the cohort×week matrix, and the retention
    * denominator (cohort size = week-0 actives, since every user is
    * active in their own first week) comes from a window over the
    * bounded post-aggregate matrix. */
  def q81CohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = t(spark, dir, "events")
      .select(col("user_id"), date_trunc("week", col("ts")).as("week"))
    val active = e.distinct()
    // cohort derives from the DISTINCTED frame (min over distinct weeks ==
    // min over raw): both join branches then share one identical
    // scan+distinct Exchange, which ReuseExchange executes once — the raw
    // projection would read and shuffle the fact table twice
    val cohort = active.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    val matrix = active.join(cohort, "user_id")
      .groupBy(col("cohort_week"), col("week"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .withColumn("week_offset",
        expr("datediff(week, cohort_week) div 7"))
    val w = Window.partitionBy(col("cohort_week"))
    matrix
      .withColumn("cohort_size",
        max(when(col("week_offset") === 0, col("n_active"))).over(w))
      .withColumn("retention_pct",
        round(col("n_active") * 100.0 / col("cohort_size"), 6))
      .select("cohort_week", "week", "week_offset", "n_active",
        "cohort_size", "retention_pct")
      .orderBy("cohort_week", "week")
  }

  // ---------------------------------------------------------------- q150
  /** Position-based (U-shaped) multi-touch attribution — the
    * industry-standard upgrade of [[q76LastTouchAttribution]]: each
    * purchase splits its credit over ALL the user's touches since their
    * previous purchase (40% first touch, 40% last, the middle 20% split
    * evenly; a lone touch takes 100%, a pair 50/50). Credit and touch
    * counts roll up by touch event type.
    *
    * Scale shape: journeys are derived in ONE user-keyed window pass
    * (journey id = running count of prior purchases — no self-join of
    * events to purchases), and the per-journey position/size windows run
    * on (user, journey) — a REFINEMENT of the user hash partitioning, so
    * Catalyst inserts no second exchange, just a local sort. Per-journey
    * state is bounded by a user's activity between purchases. Weights
    * round to decimal(20,10) before the final sum (order-free, exact). */
  def positionAttribution(events: DataFrame,
                          convType: String = "purchase"): DataFrame = {
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ev = events
      .withColumn("jid",
        count(when(col("event_type") === convType, 1)).over(wPrev))
    // a journey converts iff its (user, jid) slice contains a conversion
    val wJourney = Window.partitionBy(col("user_id"), col("jid"))
    val touches = ev
      .withColumn("converted",
        max(when(col("event_type") === convType, 1).otherwise(0))
          .over(wJourney))
      .filter(col("event_type") =!= convType && col("converted") === 1)
    val wPos = Window.partitionBy(col("user_id"), col("jid"))
      .orderBy(col("ts"), col("event_id"))
    val m = count(lit(1)).over(wJourney)
    val pos = row_number().over(wPos)
    val weight = when(m === 1, lit(1.0))
      .when(m === 2, lit(0.5))
      .when(pos === 1 || pos === m, lit(0.4))
      .otherwise(lit(0.2) / (m - 2).cast("double"))
    touches
      .select(col("event_type").as("touch_type"),
        round(weight, 10).cast("decimal(20,10)").as("w"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_touches"),
        round(sum(col("w")).cast("double"), 6).as("credit"))
      .orderBy("touch_type")
  }

  /** q150 entry: U-shaped credit for purchases over `events`. */
  def q150PositionAttribution(spark: SparkSession, dir: String): DataFrame =
    positionAttribution(t(spark, dir, "events"))

  // ---------------------------------------------------------------- q162
  /** Per-source top-k terms — the "what is each domain about" leaderboard
    * — WITHOUT the row_number window: with few sources that window sorts
    * each source's whole (token, count) frame in one task, while
    * [[graft.functions.TopKByValue]] carries ≤k (count, token) pairs of
    * state per source through one map-side-combined aggregate. Ranks are
    * (count desc, token asc), the q64/q65 tie rule. */
  def q162SourceTopTerms(spark: SparkSession, dir: String,
                         k: Int = 5): DataFrame = {
    val topk = udaf(new graft.functions.TopKByValue(k),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Long,
        String)]())
    val counts = t(spark, dir, "documents")
      .select(col("source"),
        explode(graft.functions.wordTokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    counts.groupBy(col("source"))
      .agg(topk(col("cnt"), col("tok")).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), (col("pos") + 1).cast("long").as("rnk"),
        col("col._2").as("term"), col("col._1").as("cnt"))
      .orderBy("source", "rnk")
  }

  // --------------------------------------------------------------- q177
  /** Funnel time-to-convert: for every conversion, the time from the
    * FIRST touch of its journey (the touches since the user's previous
    * purchase — q150's journey segmentation) to the purchase, reported
    * as weekly exact p50/p90. The latency half of funnel analysis: q66
    * says HOW MANY convert, this says how long conversion takes, and the
    * p90 tail is what a "did the new flow slow users down" review reads.
    *
    * Scale shape: journey id and journey start ride the SAME user-keyed
    * exchange (the (user, jid) window refines the user partitioning —
    * q150's asserted plan shape); conversions then collapse to a
    * |weeks|-row exact-percentile aggregate over integer microsecond
    * waits. Instant conversions (a purchase opening its own journey)
    * count at 0 s. */
  def timeToConvert(events: DataFrame,
                    convType: String = "purchase"): DataFrame = {
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wJourney = Window.partitionBy(col("user_id"), col("jid"))
    events
      .withColumn("jid",
        count(when(col("event_type") === convType, 1)).over(wPrev))
      .withColumn("j_start_us",
        min(unix_micros(col("ts").cast("timestamp"))).over(wJourney))
      .filter(col("event_type") === convType)
      .select(date_trunc("week", col("ts")).as("week"),
        (unix_micros(col("ts").cast("timestamp")) - col("j_start_us"))
          .as("wait_us"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_conversions"),
        round(expr("percentile(wait_us, 0.5)") / 1000000.0, 3).as("p50_s"),
        round(expr("percentile(wait_us, 0.9)") / 1000000.0, 3).as("p90_s"))
  }

  def q177TimeToConvert(spark: SparkSession, dir: String): DataFrame =
    timeToConvert(t(spark, dir, "events")).orderBy("week")

  // --------------------------------------------------------------- q179
  /** Market-basket association at brand granularity: for every unordered
    * brand pair co-purchased inside one order, support, confidence and
    * lift — the classic "what sells together" report, and the measure
    * (lift) that separates genuine affinity from two brands merely both
    * being popular.
    *
    * Scale shape: the fact table collapses to the DISTINCT (order, brand)
    * incidence frame first (one hash aggregate; ≤ |orders|·|brands per
    * order| rows), so the pair self-join runs on the condensed frame,
    * equi-keyed on the order key — per-order pair fan-out is bounded by
    * the order's own line count (TPC-H ≤7), never a cross product. Brand
    * marginals (|brands| rows) and the order total (1 row) broadcast back
    * into the pair frame. The part dimension broadcasts into the fact
    * scan. Lift = n_ab·N / (n_a·n_b) computed as ONE integer-product
    * division in both engines, so the doubles match bit-for-bit. */
  def basketLift(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val items = lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("okey"), col("p_brand").as("brand"))
      .distinct()
    val nOrders = items.agg(countDistinct(col("okey")).as("n_orders"))
    val marginals = items.groupBy(col("brand")).agg(count(lit(1)).as("n"))
    val pairs = items
      .join(items.select(col("okey"), col("brand").as("brand_b")), "okey")
      .filter(col("brand") < col("brand_b"))
      .groupBy(col("brand").as("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_ab"))
    pairs
      .join(broadcast(marginals.select(col("brand").as("brand_a"),
        col("n").as("n_a"))), "brand_a")
      .join(broadcast(marginals.select(col("brand").as("brand_b"),
        col("n").as("n_b"))), "brand_b")
      .crossJoin(broadcast(nOrders))
      .select(col("brand_a"), col("brand_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        round(col("n_ab").cast("double") / col("n_orders"), 6)
          .as("support"),
        round(col("n_ab").cast("double") / col("n_a"), 6)
          .as("confidence"),
        round((col("n_ab") * col("n_orders")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
      .orderBy("brand_a", "brand_b")
  }

  def q179BasketLift(spark: SparkSession, dir: String): DataFrame =
    basketLift(t(spark, dir, "lineitem"), t(spark, dir, "part"))

  // --------------------------------------------------------------- q182
  /** RFM segmentation: every customer scored 1–5 on Recency (days since
    * last order, lower is better), Frequency (order count) and Monetary
    * (lifetime revenue), binned at the exact quintile boundaries of each
    * metric, then bucketed into the marketing segments those scores
    * imply. The report is the segment histogram — the input to "who gets
    * the win-back campaign".
    *
    * Scale shape: facts collapse to the per-customer (last, n, revenue)
    * aggregate first; quintile BOUNDARIES are one percentile aggregate
    * over that frame (12 doubles out) applied map-side via a broadcast —
    * q119's boundary pattern, never an ntile window whose single
    * partition would sort every customer in one task. `exact=false`
    * swaps in `approx_percentile` for the 100 TB path (sketch state,
    * same shape); the oracle-checked entry keeps the exact aggregate.
    * Boundary rule mirrored in the oracle: type-7 quintiles on DOUBLE
    * rounded to 6dp; score = 1 + count(boundaries < metric), recency
    * scored on the NEGATED day count so smaller recency ⇒ higher score
    * with the same rule. */
  def rfmSegments(orders: DataFrame, exact: Boolean = true): DataFrame = {
    val cust = orders
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
        count(lit(1)).as("f"),
        dsum(col("o_totalprice")).as("m"))
      .crossJoin(broadcast(
        orders.agg(max(col("o_orderdate")).as("asof"))))
      .select(col("o_custkey"),
        (-datediff(col("asof"), col("last_order"))).cast("double").as("r"),
        col("f").cast("double").as("f"), col("m"))
    val qs = (1 to 4).map(_ / 5.0).mkString("array(", ",", ")")
    def bounds(c: String) = {
      val agg = if (exact) s"percentile($c, $qs)"
      else s"approx_percentile($c, $qs, 10000)"
      expr(s"transform($agg, b -> round(b, 6))").as(s"b_$c")
    }
    val bd = cust.agg(bounds("r"), bounds("f"), bounds("m"))
    def score(c: String) =
      (size(filter(col(s"b_$c"), b => col(c) > b)) + 1).cast("long")
    cust.crossJoin(broadcast(bd))
      .select(col("o_custkey"), col("m"),
        score("r").as("r_score"), score("f").as("f_score"),
        score("m").as("m_score"))
      .withColumn("segment",
        when(col("r_score") >= 4 && col("f_score") >= 4 &&
          col("m_score") >= 4, "champion")
          .when(col("r_score") >= 4 && col("f_score") <= 2, "new")
          .when(col("r_score") <= 2 && col("f_score") >= 4, "at_risk_loyal")
          .when(col("r_score") <= 2 && col("f_score") <= 2, "hibernating")
          .otherwise("regular"))
      .groupBy(col("r_score"), col("f_score"), col("m_score"),
        col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        round(dsum(col("m"), 18, 6) / count(lit(1)), 6).as("avg_monetary"))
      .orderBy("r_score", "f_score", "m_score")
  }

  def q182RfmSegments(spark: SparkSession, dir: String): DataFrame =
    rfmSegments(t(spark, dir, "orders"))

  // --------------------------------------------------------------- q193
  /** Fulfillment cycle-time distribution: days from order to line-item
    * ship, as an exact day histogram with cumulative share and the
    * exact p50/p90/p99 read off it — the SLA readout ("99% of units
    * ship within N days") where an approx-percentile answer is exactly
    * what the contract forbids.
    *
    * Scale shape: the one big-big equi-join (lineitem ⋈ orders on the
    * FK) shuffles both sides once — the join every fulfillment question
    * pays; everything after collapses to the |distinct days| frame (a
    * domain bounded by the shipping window, not data volume), where the
    * cumulative window and the rank-threshold percentile picks are
    * arithmetic. Percentile semantics are q163's k = ⌈q·n⌉ ORDER
    * BY/OFFSET definition, duplicate-safe, exact.
    *
    * Determinism: day counts are exact longs; each row's cumulative
    * share is ONE double divide. */
  def cycleTimeHistogram(lineitem: DataFrame,
                         orders: DataFrame): DataFrame = {
    val days = lineitem
      .select(col("l_orderkey"), col("l_shipdate"))
      .join(orders.select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(datediff(col("l_shipdate"), col("o_orderdate"))
        .cast("long").as("days"))
      .groupBy(col("days")).agg(count(lit(1)).as("n"))
      // tiny domain-bounded frame, read by both the marks aggregate and
      // the final projection — persist so the FK join runs ONCE
      .persist()
    val w = Window.orderBy(col("days"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = days
      .withColumn("cum", sum(col("n")).over(w))
      .crossJoin(broadcast(days.agg(sum(col("n")).as("total"))))
    def kOf(q: Double) = ceil(lit(q) * col("total").cast("double"))
      .cast("long")
    val marks = cum
      .agg(min(when(col("cum") >= kOf(0.5), col("days"))).as("p50_days"),
        min(when(col("cum") >= kOf(0.9), col("days"))).as("p90_days"),
        min(when(col("cum") >= kOf(0.99), col("days"))).as("p99_days"))
    cum.crossJoin(broadcast(marks))
      .select(col("days"), col("n"),
        round(col("cum").cast("double") / col("total"), 6)
          .as("cum_share"),
        col("p50_days"), col("p90_days"), col("p99_days"))
      .orderBy("days")
  }

  def q193CycleTime(spark: SparkSession, dir: String): DataFrame =
    cycleTimeHistogram(t(spark, dir, "lineitem"), t(spark, dir, "orders"))

  // --------------------------------------------------------------- q195
  /** Wilson-lower-bound ranking: order items by the LOWER 95% confidence
    * bound of their success rate, not the raw rate — the classic fix for
    * "5/5 beats 950/1000" that every rating / defect-rate leaderboard
    * needs (Wilson 1927; the reddit/Evan Miller sort). Here: brands
    * ranked by return rate evidence.
    *
    * Scale shape: one fact pass with a broadcast dim join collapses to
    * the |brands|-row frame; the Wilson algebra is a projection and the
    * ranking is a tiny-frame sort.
    *
    * Determinism: n and k are exact longs; the closed form is evaluated
    * in ONE fixed operand order (z² terms as exact literals, IEEE sqrt),
    * mirrored in the oracle. */
  def wilsonRanking(lineitem: DataFrame, part: DataFrame): DataFrame = {
    val z = 1.96
    val counts = lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val lb = (p + z2 / (lit(2.0) * nD) -
      lit(z) * sqrt(p * (lit(1.0) - p) / nD +
        z2 / (lit(4.0) * nD * nD))) / (lit(1.0) + z2 / nD)
    counts
      .select(col("brand"), col("n"), col("k"),
        round(p, 6).as("rate"),
        round(lb, 6).as("wilson_lb"))
      .orderBy(col("wilson_lb").desc, col("brand"))
  }

  def q195WilsonRanking(spark: SparkSession, dir: String): DataFrame =
    wilsonRanking(t(spark, dir, "lineitem"), t(spark, dir, "part"))

  // --------------------------------------------------------------- q196
  /** Net revenue retention by acquisition cohort: for each first-order
    * year and horizon k, the cohort's revenue k years on as a fraction
    * of its acquisition-year revenue — the DOLLAR-weighted retention
    * curve (count-based q81 says how many came back; NRR says whether
    * the money did, expansion included).
    *
    * Scale shape: one fact pass to the (customer, year) frame; the
    * customer's cohort year is a min-aggregate over that same frame
    * joined back customer-keyed (co-partitioned — both sides hash on
    * the customer); everything after lives on the |years|² cohort
    * frame, where the base-revenue divisor broadcasts.
    *
    * Determinism: integer cents end-to-end; one double divide per row. */
  def revenueRetention(orders: DataFrame, maxK: Int = 3): DataFrame = {
    val cy = orders
      .groupBy(col("o_custkey"), year(col("o_orderdate")).as("y"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .persist()
    val cohort = cy.groupBy(col("o_custkey")).agg(min(col("y")).as("y0"))
    val frame = cy.join(cohort, "o_custkey")
      .withColumn("k", col("y") - col("y0"))
      .filter(col("k").between(0, maxK))
      .groupBy(col("y0").as("cohort_year"), col("k"))
      .agg(count(lit(1)).as("n_active"),
        sum(col("cents")).as("rev_cents"))
    val base = frame.filter(col("k") === 0)
      .select(col("cohort_year").as("by"), col("rev_cents").as("base"))
    frame.join(broadcast(base), col("cohort_year") === col("by"))
      .select(col("cohort_year").cast("long").as("cohort_year"),
        col("k").cast("long").as("k"), col("n_active"),
        round(col("rev_cents").cast("double") / 100.0, 2).as("revenue"),
        round(col("rev_cents").cast("double") /
          col("base").cast("double"), 6).as("nrr"))
      .orderBy("cohort_year", "k")
  }

  def q196RevenueRetention(spark: SparkSession, dir: String): DataFrame =
    revenueRetention(t(spark, dir, "orders"))

  // --------------------------------------------------------------- q197
  /** Price–volume bridge: decompose each brand's revenue change between
    * two years into the part explained by price movement and the part
    * explained by volume movement — the Laspeyres/Paasche identity
    * Δrev = (p₁−p₀)·q₁ + p₀·(q₁−q₀), which holds exactly. The finance
    * close's "why did revenue move" in one pass.
    *
    * Scale shape: ONE fact pass of conditional aggregates per brand
    * (broadcast part dim); the bridge algebra is a projection over the
    * |brands| frame. No join between years, no window.
    *
    * Determinism: quantities and revenue cents are exact integers; unit
    * prices and the two effect terms are fixed-order double arithmetic
    * mirrored in the oracle. */
  def priceVolumeBridge(lineitem: DataFrame, part: DataFrame,
                        year0: Int, year1: Int): DataFrame = {
    def inYear(yr: Int, c: Column) =
      sum(when(year(col("l_shipdate")) === yr, c).otherwise(0L))
    val f = lineitem
      .join(broadcast(part.select(col("p_partkey"), col("p_brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(
        inYear(year0, round(col("l_quantity")).cast("long")).as("q0"),
        inYear(year1, round(col("l_quantity")).cast("long")).as("q1"),
        inYear(year0, round(col("l_extendedprice") * 100).cast("long"))
          .as("r0"),
        inYear(year1, round(col("l_extendedprice") * 100).cast("long"))
          .as("r1"))
      .filter(col("q0") > 0 && col("q1") > 0)
    val p0 = col("r0").cast("double") / col("q0")
    val p1 = col("r1").cast("double") / col("q1")
    f.select(col("brand"), col("q0"), col("q1"),
      round(col("r0").cast("double") / 100.0, 2).as("rev0"),
      round(col("r1").cast("double") / 100.0, 2).as("rev1"),
      round((col("r1") - col("r0")).cast("double") / 100.0, 2)
        .as("delta"),
      round((p1 - p0) * col("q1") / 100.0, 2).as("price_effect"),
      round(p0 * (col("q1") - col("q0")) / 100.0, 2).as("volume_effect"))
      .orderBy("brand")
  }

  def q197PriceVolumeBridge(spark: SparkSession, dir: String): DataFrame =
    priceVolumeBridge(t(spark, dir, "lineitem"), t(spark, dir, "part"),
      1995, 1996)

  // ------------------------------------------------------------ registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q193_cycle_time" -> q193CycleTime _,
    "q195_wilson_ranking" -> q195WilsonRanking _,
    "q196_revenue_retention" -> q196RevenueRetention _,
    "q197_price_volume_bridge" -> q197PriceVolumeBridge _,
    "q179_basket_lift" -> q179BasketLift _,
    "q182_rfm_segments" -> q182RfmSegments _,
    "q177_time_to_convert" -> q177TimeToConvert _,
    "q150_position_attribution" -> q150PositionAttribution _,
    "q162_source_top_terms" -> ((s: SparkSession, d: String) =>
      q162SourceTopTerms(s, d)),
    "q79_trailing_window" -> q79TrailingWindow _,
    "q80_customer_deciles" -> q80CustomerDeciles _,
    "q81_cohort_retention" -> q81CohortRetention _,
    "q71_table_profile" -> q71TableProfile _,
    "q76_last_touch_attribution" -> q76LastTouchAttribution _,
    "q77_daily_revenue_delta" -> q77DailyRevenueDelta _,
    "q64_tfidf_top_terms" -> q64TfidfTopTerms _,
    "q65_token_zipf" -> q65TokenZipf _,
    "q66_event_funnel" -> q66EventFunnel _,
    "q67_zscore_outliers" -> q67ZscoreOutliers _,
    "q68_price_histogram" -> q68PriceHistogram _,
    "q69_corpus_share" -> q69CorpusShare _)

  val oracle: Map[String, String] = Map(
    // q196: integer cents, co-keyed cohort join, one divide per row.
    "q196_revenue_retention" ->
      """WITH cy AS (
        |  SELECT o_custkey, year(o_orderdate) AS y,
        |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1, 2),
        |cohort AS (
        |  SELECT o_custkey, MIN(y) AS y0 FROM cy GROUP BY 1),
        |f AS (
        |  SELECT y0 AS cohort_year, y - y0 AS k,
        |         COUNT(*) AS n_active,
        |         CAST(SUM(cents) AS BIGINT) AS rev_cents
        |  FROM cy JOIN cohort USING (o_custkey)
        |  WHERE y - y0 BETWEEN 0 AND 3
        |  GROUP BY 1, 2)
        |SELECT CAST(f.cohort_year AS BIGINT) AS cohort_year,
        |       CAST(f.k AS BIGINT) AS k, f.n_active,
        |       round(CAST(f.rev_cents AS DOUBLE) / 100.0, 2) AS revenue,
        |       round(CAST(f.rev_cents AS DOUBLE)
        |             / CAST(b.rev_cents AS DOUBLE), 6) AS nrr
        |FROM f JOIN f b
        |  ON b.cohort_year = f.cohort_year AND b.k = 0
        |ORDER BY cohort_year, k""".stripMargin,
    // q197: exact integer quantities/cents; unit prices and both effect
    // terms in the engine's operand order.
    "q197_price_volume_bridge" ->
      """WITH f AS (
        |  SELECT p_brand AS brand,
        |    CAST(SUM(CASE WHEN year(l_shipdate) = 1995
        |       THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
        |       AS BIGINT) AS q0,
        |    CAST(SUM(CASE WHEN year(l_shipdate) = 1996
        |       THEN CAST(round(l_quantity) AS BIGINT) ELSE 0 END)
        |       AS BIGINT) AS q1,
        |    CAST(SUM(CASE WHEN year(l_shipdate) = 1995
        |       THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |       ELSE 0 END) AS BIGINT) AS r0,
        |    CAST(SUM(CASE WHEN year(l_shipdate) = 1996
        |       THEN CAST(round(l_extendedprice * 100) AS BIGINT)
        |       ELSE 0 END) AS BIGINT) AS r1
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT brand, q0, q1,
        |       round(CAST(r0 AS DOUBLE) / 100.0, 2) AS rev0,
        |       round(CAST(r1 AS DOUBLE) / 100.0, 2) AS rev1,
        |       round(CAST(r1 - r0 AS DOUBLE) / 100.0, 2) AS delta,
        |       round((CAST(r1 AS DOUBLE) / q1 - CAST(r0 AS DOUBLE) / q0)
        |             * q1 / 100.0, 2) AS price_effect,
        |       round(CAST(r0 AS DOUBLE) / q0 * (q1 - q0) / 100.0, 2)
        |         AS volume_effect
        |FROM f WHERE q0 > 0 AND q1 > 0 ORDER BY brand""".stripMargin,
    // q195: exact counts; the Wilson closed form replicated term for
    // term in the same operand order (z-squared terms as literals).
    "q195_wilson_ranking" ->
      """WITH c AS (
        |  SELECT p_brand AS brand, COUNT(*) AS n,
        |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
        |              END) AS BIGINT) AS k
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT brand, n, k,
        |       round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
        |       round((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
        |              + 3.8415999999999997 / (2.0 * CAST(n AS DOUBLE))
        |              - 1.96 * sqrt(
        |                  CAST(k AS DOUBLE) / CAST(n AS DOUBLE) *
        |                  (1.0 - CAST(k AS DOUBLE) / CAST(n AS DOUBLE))
        |                  / CAST(n AS DOUBLE)
        |                  + 3.8415999999999997 /
        |                    (4.0 * CAST(n AS DOUBLE)
        |                         * CAST(n AS DOUBLE))))
        |             / (1.0 + 3.8415999999999997 / CAST(n AS DOUBLE)),
        |             6) AS wilson_lb
        |FROM c ORDER BY wilson_lb DESC, brand""".stripMargin,
    // q193: exact day counts off the FK join; rank-threshold percentile
    // picks (k = ceil(q*n)) and one double divide per row.
    "q193_cycle_time" ->
      """WITH d AS (
        |  SELECT date_diff('day', o_orderdate, l_shipdate) AS days
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |h AS (SELECT days, COUNT(*) AS n FROM d GROUP BY 1),
        |c AS (
        |  SELECT days, n, SUM(n) OVER (ORDER BY days
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM h),
        |m AS (
        |  SELECT
        |    min(CASE WHEN cum >= CAST(ceil(0.5 * CAST(total AS DOUBLE))
        |          AS BIGINT) THEN days END) AS p50_days,
        |    min(CASE WHEN cum >= CAST(ceil(0.9 * CAST(total AS DOUBLE))
        |          AS BIGINT) THEN days END) AS p90_days,
        |    min(CASE WHEN cum >= CAST(ceil(0.99 * CAST(total AS DOUBLE))
        |          AS BIGINT) THEN days END) AS p99_days
        |  FROM c, t)
        |SELECT days, n,
        |       round(CAST(cum AS DOUBLE) / total, 6) AS cum_share,
        |       p50_days, p90_days, p99_days
        |FROM c, t, m ORDER BY days""".stripMargin,
    // q179: counts are exact integers; every ratio is ONE double divide
    // of integer products, mirrored operand for operand.
    "q179_basket_lift" ->
      """WITH items AS (
        |  SELECT DISTINCT l_orderkey AS okey, p_brand AS brand
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM items),
        |m AS (SELECT brand, COUNT(*) AS n FROM items GROUP BY 1),
        |p AS (
        |  SELECT a.brand AS brand_a, b.brand AS brand_b,
        |         COUNT(*) AS n_ab
        |  FROM items a JOIN items b
        |    ON a.okey = b.okey AND a.brand < b.brand
        |  GROUP BY 1, 2)
        |SELECT brand_a, brand_b, n_ab, ma.n AS n_a, mb.n AS n_b,
        |       round(CAST(n_ab AS DOUBLE) / n_orders, 6) AS support,
        |       round(CAST(n_ab AS DOUBLE) / ma.n, 6) AS confidence,
        |       round(CAST(n_ab * n_orders AS DOUBLE)
        |             / CAST(ma.n * mb.n AS DOUBLE), 6) AS lift
        |FROM p JOIN m ma ON p.brand_a = ma.brand
        |       JOIN m mb ON p.brand_b = mb.brand, n
        |ORDER BY brand_a, brand_b""".stripMargin,
    // q182: quintile boundaries mirror q119's proven recipe (type-7
    // quantile_cont on DOUBLE, rounded 6dp, score = 1 + #(bounds <
    // metric)); monetary means go through the decimal(18,6) re-sum.
    "q182_rfm_segments" ->
      """WITH cust AS (
        |  SELECT o_custkey, max(o_orderdate) AS last_order,
        |         COUNT(*) AS fc,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        |           AS m
        |  FROM orders GROUP BY 1),
        |mx AS (SELECT max(o_orderdate) AS t_ref FROM orders),
        |c2 AS (
        |  SELECT o_custkey,
        |         -CAST(date_diff('day', last_order, t_ref) AS DOUBLE) AS r,
        |         CAST(fc AS DOUBLE) AS f, m
        |  FROM cust, mx),
        |bd AS (
        |  SELECT
        |    list_transform(quantile_cont(r, [0.2,0.4,0.6,0.8]),
        |                   b -> round(b, 6)) AS br,
        |    list_transform(quantile_cont(f, [0.2,0.4,0.6,0.8]),
        |                   b -> round(b, 6)) AS bf,
        |    list_transform(quantile_cont(m, [0.2,0.4,0.6,0.8]),
        |                   b -> round(b, 6)) AS bm
        |  FROM c2),
        |s AS (
        |  SELECT o_custkey, m,
        |         1 + len(list_filter(br, x -> r > x)) AS r_score,
        |         1 + len(list_filter(bf, x -> f > x)) AS f_score,
        |         1 + len(list_filter(bm, x -> m > x)) AS m_score
        |  FROM c2, bd),
        |l AS (
        |  SELECT *, CASE
        |    WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
        |      THEN 'champion'
        |    WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
        |    WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk_loyal'
        |    WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
        |    ELSE 'regular' END AS segment
        |  FROM s)
        |SELECT CAST(r_score AS BIGINT) AS r_score,
        |       CAST(f_score AS BIGINT) AS f_score,
        |       CAST(m_score AS BIGINT) AS m_score, segment,
        |       COUNT(*) AS n_customers,
        |       round(CAST(SUM(CAST(m AS DECIMAL(18,6))) AS DOUBLE)
        |             / COUNT(*), 6) AS avg_monetary
        |FROM l GROUP BY 1, 2, 3, 4
        |ORDER BY r_score, f_score, m_score""".stripMargin,
    // q177: integer-microsecond waits feed the exact percentile
    // (quantile_cont ≡ Spark percentile, q59's proven mirror); the /1e6
    // second conversion happens AFTER interpolation in both engines.
    "q177_time_to_convert" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         COUNT(*) FILTER (event_type = 'purchase') OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS jid
        |  FROM events),
        |j AS (
        |  SELECT *, MIN(epoch_us(ts)) OVER (PARTITION BY user_id, jid)
        |           AS j_start_us
        |  FROM ev),
        |c AS (
        |  SELECT CAST(date_trunc('week', ts) AS TIMESTAMP) AS week,
        |         epoch_us(ts) - j_start_us AS wait_us
        |  FROM j WHERE event_type = 'purchase')
        |SELECT week, COUNT(*) AS n_conversions,
        |       round(quantile_cont(wait_us, 0.5) / 1000000.0, 3) AS p50_s,
        |       round(quantile_cont(wait_us, 0.9) / 1000000.0, 3) AS p90_s
        |FROM c GROUP BY week ORDER BY week""".stripMargin,
    // q162: the oracle is the NAIVE per-group window the bounded
    // aggregate replaces.
    "q162_source_top_terms" ->
      """WITH tok AS (
        |  SELECT source, t.tok
        |  FROM documents,
        |       unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                          x -> len(x) > 0)) AS t(tok)),
        |c AS (SELECT source, tok, COUNT(*) AS cnt FROM tok GROUP BY 1, 2),
        |r AS (
        |  SELECT source, tok AS term, cnt,
        |         row_number() OVER (PARTITION BY source
        |                            ORDER BY cnt DESC, tok) AS rnk
        |  FROM c)
        |SELECT source, rnk, term, cnt FROM r WHERE rnk <= 5
        |ORDER BY source, rnk""".stripMargin,
    // q150: U-shaped credit; weights round to DECIMAL(20,10) pre-sum so
    // the Σ is order-free and bit-equal across engines.
    "q150_position_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         COUNT(*) FILTER (event_type = 'purchase') OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS jid
        |  FROM events),
        |j AS (
        |  SELECT *,
        |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id, jid) AS converted
        |  FROM ev),
        |tch AS (
        |  SELECT user_id, jid, event_type,
        |         row_number() OVER (PARTITION BY user_id, jid
        |                            ORDER BY ts, event_id) AS pos,
        |         COUNT(*) OVER (PARTITION BY user_id, jid) AS m
        |  FROM j
        |  WHERE event_type <> 'purchase' AND converted = 1),
        |wts AS (
        |  SELECT event_type AS touch_type,
        |         CAST(round(
        |           CASE WHEN m = 1 THEN CAST(1.0 AS DOUBLE)
        |                WHEN m = 2 THEN CAST(0.5 AS DOUBLE)
        |                WHEN pos = 1 OR pos = m THEN CAST(0.4 AS DOUBLE)
        |                ELSE CAST(0.2 AS DOUBLE)
        |                     / CAST(m - 2 AS DOUBLE) END,
        |           10) AS DECIMAL(20,10)) AS w
        |  FROM tch)
        |SELECT touch_type, COUNT(*) AS n_touches,
        |       round(CAST(SUM(w) AS DOUBLE), 6) AS credit
        |FROM wts GROUP BY touch_type ORDER BY touch_type""".stripMargin,
    // q81: both engines truncate weeks to ISO Monday starts.
    "q81_cohort_retention" ->
      """WITH a AS (
        |  SELECT DISTINCT user_id,
        |         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
        |  FROM events),
        |c AS (SELECT user_id, MIN(week) AS cohort_week FROM a GROUP BY 1),
        |m AS (
        |  SELECT cohort_week, week, COUNT(DISTINCT a.user_id) AS n_active,
        |         date_diff('day', cohort_week, week) // 7 AS week_offset
        |  FROM a JOIN c ON a.user_id = c.user_id
        |  GROUP BY 1, 2, 4)
        |SELECT cohort_week, week, CAST(week_offset AS BIGINT) AS week_offset,
        |       n_active,
        |       MAX(CASE WHEN week_offset = 0 THEN n_active END)
        |         OVER (PARTITION BY cohort_week) AS cohort_size,
        |       round(n_active * 100.0 /
        |         MAX(CASE WHEN week_offset = 0 THEN n_active END)
        |           OVER (PARTITION BY cohort_week), 6) AS retention_pct
        |FROM m ORDER BY cohort_week, week""".stripMargin,
    "q79_trailing_window" ->
      s"""WITH d AS (
         |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         |         ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders GROUP BY 1),
         |n AS (
         |  SELECT day, revenue,
         |         date_diff('day', TIMESTAMP '1970-01-01 00:00:00', day)
         |           AS day_num
         |  FROM d)
         |SELECT day, revenue,
         |       round(SUM(revenue) OVER (ORDER BY day_num
         |         RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
         |         AS trailing_7d
         |FROM n ORDER BY day""".stripMargin,
    "q80_customer_deciles" ->
      s"""WITH t AS (
         |  SELECT c_acctbal,
         |         ntile(10) OVER (ORDER BY c_acctbal, c_custkey) AS decile
         |  FROM customer)
         |SELECT CAST(decile AS BIGINT) AS decile, COUNT(*) AS n,
         |       MIN(c_acctbal) AS min_bal, MAX(c_acctbal) AS max_bal,
         |       ${dsumSql("c_acctbal")} AS sum_bal
         |FROM t GROUP BY decile ORDER BY decile""".stripMargin,
    // q76: DuckDB struct max is lexicographic by field order exactly like
    // Spark's struct ordering, so (ts, id, typ) resolves identically.
    "q76_last_touch_attribution" ->
      s"""WITH a AS (
         |  SELECT value, event_type,
         |         (max(CASE WHEN event_type <> 'purchase'
         |               THEN {'ts': ts, 'id': event_id, 'typ': event_type}
         |              END)
         |          OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |         ).typ AS touch_type
         |  FROM events)
         |SELECT COALESCE(touch_type, 'none') AS touch_type,
         |       COUNT(*) AS n_purchases,
         |       ${dsumSql("value")} AS sum_value
         |FROM a WHERE event_type = 'purchase'
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q77_daily_revenue_delta" ->
      s"""WITH d AS (
         |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         |         COUNT(*) AS n_orders,
         |         ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders GROUP BY 1)
         |SELECT day, n_orders, revenue,
         |       lag(revenue, 1) OVER (ORDER BY day) AS prev_revenue,
         |       round(revenue - lag(revenue, 1) OVER (ORDER BY day), 4)
         |         AS delta,
         |       CASE WHEN lag(revenue, 1) OVER (ORDER BY day) <> 0
         |            THEN round((revenue - lag(revenue, 1) OVER (ORDER BY day))
         |                   * 100.0 / lag(revenue, 1) OVER (ORDER BY day), 6)
         |       END AS pct_change
         |FROM d ORDER BY day""".stripMargin,
    "q71_table_profile" -> {
      val numeric = Set("o_orderkey", "o_custkey", "o_totalprice")
      Seq("o_custkey", "o_orderdate", "o_orderkey", "o_orderpriority",
        "o_orderstatus", "o_totalprice").map { c =>
        val (mn, mx) =
          if (numeric(c)) (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)")
          else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
        s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |       COUNT(*) - COUNT($c) AS n_null,
           |       COUNT(DISTINCT $c) AS n_distinct,
           |       $mn AS min_num, $mx AS max_num
           |FROM orders""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
    },
    "q64_tfidf_top_terms" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                            t -> len(t) > 0)) AS term
        |  FROM documents),
        |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
        |dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tf),
        |scored AS (
        |  SELECT doc_id, term, tf, df,
        |         round(tf * ln(CAST(n_docs AS DOUBLE) / df), 6) AS score
        |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
        |r AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |             ORDER BY score DESC, term) AS rnk
        |  FROM scored)
        |SELECT doc_id, term, tf, df, score, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk""".stripMargin,
    "q65_token_zipf" ->
      """WITH toks AS (
        |  SELECT unnest(list_filter(string_split_regex(lower(text), '\W+'),
        |                            t -> len(t) > 0)) AS term
        |  FROM documents),
        |counts AS (SELECT term, COUNT(*) AS n FROM toks GROUP BY 1),
        |r AS (
        |  SELECT term, n,
        |         row_number() OVER (ORDER BY n DESC, term) AS rnk
        |  FROM counts)
        |SELECT term, n, CAST(rnk AS BIGINT) AS rnk
        |FROM r WHERE rnk <= 50 ORDER BY rnk""".stripMargin,
    "q66_event_funnel" ->
      """WITH u AS (
        |  SELECT user_id,
        |         min(ts) FILTER (event_type = 'view') AS t_view,
        |         min(ts) FILTER (event_type = 'click') AS t_click,
        |         min(ts) FILTER (event_type = 'purchase') AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT COUNT(*) AS n_users,
        |       COUNT(t_view) AS n_view,
        |       CAST(COALESCE(SUM(CASE WHEN t_click > t_view
        |              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_view_click,
        |       CAST(COALESCE(SUM(CASE WHEN t_click > t_view
        |              AND t_purchase > t_click
        |              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_full_funnel
        |FROM u""".stripMargin,
    "q67_zscore_outliers" ->
      """WITH st AS (
        |  SELECT event_type,
        |         COUNT(value) AS n,
        |         CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS s,
        |         CAST(SUM(CAST(value * value AS DECIMAL(28,6))) AS DOUBLE)
        |           AS ss
        |  FROM events GROUP BY 1),
        |st2 AS (
        |  SELECT event_type, s / n AS mean,
        |         sqrt((ss - s * s / n) / (n - 1)) AS sd
        |  FROM st)
        |SELECT event_id, e.event_type, value,
        |       round((value - mean) / sd, 6) AS z
        |FROM events e JOIN st2 USING (event_type)
        |WHERE abs(round((value - mean) / sd, 6)) > 3
        |ORDER BY event_id""".stripMargin,
    "q68_price_histogram" ->
      s"""SELECT LEAST(CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT), 19)
         |         AS bucket,
         |       COUNT(*) AS n,
         |       MIN(o_totalprice) AS min_price,
         |       MAX(o_totalprice) AS max_price,
         |       ${dsumSql("o_totalprice")} AS sum_price
         |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q69_corpus_share" ->
      """SELECT source, lang, COUNT(*) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       round(COUNT(*) * 100.0 /
        |         CAST(SUM(COUNT(*)) OVER () AS BIGINT), 6) AS pct_docs
        |FROM documents GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
}
