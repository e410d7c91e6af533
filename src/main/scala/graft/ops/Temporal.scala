package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.TableCatalog

/** Temporal operators the reference lacks entirely: as-of lookups and
  * bounded time-range joins over event time. Both are expressed so Catalyst
  * keeps them linear-ish at scale — the as-of is a pure window function (no
  * join at all), and the range join generates candidates by minute bucket
  * instead of exploding per-key cross products.
  */
object Temporal {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    TableCatalog.load(spark, dir, name)

  /** As-of lookup: for every event, the timestamp of the latest *earlier*
    * event of `eventType` for the same user. A sort-merge as-of join in
    * window-function clothing: one shuffle on user_id, no join, no state
    * explosion — the formulation that survives a 100× scale-up. */
  def asOfPrevEvent(events: DataFrame, eventType: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    events.select(col("event_id"), col("user_id"), col("ts"),
      col("event_type"),
      max(when(col("event_type") === eventType, col("ts"))).over(w)
        .as("prev_match_ts"))
  }

  /** Bounded range self-join: pairs of events of the same user where the
    * second strictly follows the first by at most `maxGapSeconds`. Candidate
    * generation is bucketed — each left event probes its own minute bucket
    * and the next one (a ≤60s window can span at most two) — so the join is
    * an equi-join on (user, bucket) with a residual filter, never an O(n²)
    * per-user product. */
  def timeRangePairs(events: DataFrame,
                     maxGapSeconds: Int = 60): DataFrame = {
    require(maxGapSeconds <= 60,
      "bucket width is one minute; widen the probe list for larger gaps")
    val withBucket = events
      .withColumn("us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("bucket", expr("us div 60000000"))
    val left = withBucket.select(
      col("user_id"), col("event_id").as("id_a"), col("us").as("us_a"),
      explode(array(col("bucket"), col("bucket") + 1)).as("bucket"))
    val right = withBucket.select(
      col("user_id"), col("event_id").as("id_b"), col("us").as("us_b"),
      col("bucket"))
    left.join(right, Seq("user_id", "bucket"))
      .filter(col("us_b") > col("us_a") &&
        col("us_b") <= col("us_a") + maxGapSeconds * 1000000L)
      .select(col("user_id"), col("id_a"), col("id_b"),
        ((col("us_b") - col("us_a")).cast("double") / 1e6).as("gap_seconds"))
      .distinct()
  }

  /** CDC latest-snapshot compaction: one row per key — the newest by
    * (tsCol, tieCol). The upsert-materialization step of every
    * change-capture pipeline; one shuffle on the key, per-partition sort,
    * rank filter. `tieCol` makes the winner total (timestamps collide in
    * real logs). */
  def latestSnapshot(df: DataFrame, keyCols: Seq[String], tsCol: String,
                     tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(tieCol).desc)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** SCD2 validity intervals from a change log: each state-change row gets
    * [valid_from, valid_to) bounded by the key's next change (open-ended
    * for the current row). The slowly-changing-dimension builder — one
    * window per key, no self-join. */
  def scd2Intervals(df: DataFrame, keyCols: Seq[String], tsCol: String,
                    tieCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col(tieCol))
    df.withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** Keyless interval-overlap join: for every point event, how many
    * intervals [start, start+length) drawn from the WHOLE stream contain
    * it. Unlike [[timeRangePairs]] there is no user/equi key to hash on —
    * the naive formulation is a broadcast-nested-loop (or cartesian)
    * range join between two fact-sized inputs, the classic scale-killer.
    * The rewrite buckets time at EXACTLY the interval length: an interval
    * then overlaps at most two buckets (its own and the next), so
    * replicating each interval into those two buckets turns the range
    * join into an equi-join on bucket plus a residual containment filter.
    * Shuffle volume is 2·|intervals| + |points|, never
    * |points|·|intervals|; a replica in the start bucket's successor that
    * can't match (interval flush on a boundary) is discarded by the
    * residual, so no post-join dedup is needed — each interval has one
    * replica per bucket and a point lives in exactly one bucket. */
  def overlapCounts(points: DataFrame, intervals: DataFrame,
                    lengthUs: Long): DataFrame = {
    require(lengthUs > 0, "interval length must be positive")
    val pts = points
      .select(col("event_id"),
        unix_micros(col("ts").cast("timestamp")).as("p_us"))
      .withColumn("bucket", expr(s"p_us div $lengthUs"))
    val iv = intervals
      .select(col("event_id").as("iid"),
        unix_micros(col("ts").cast("timestamp")).as("i_us"))
      .withColumn("bucket",
        explode(array(expr(s"i_us div $lengthUs"),
          expr(s"i_us div $lengthUs") + 1)))
    pts.join(iv,
        pts("bucket") === iv("bucket") &&
          col("p_us") >= col("i_us") &&
          col("p_us") < col("i_us") + lengthUs,
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("iid")).as("n_overlap"))
  }

  // ------------------------------------------------------------ registry
  /** q44 — as-of previous purchase per event (window formulation). */
  def q44AsofPrevPurchase(spark: SparkSession, dir: String): DataFrame =
    asOfPrevEvent(t(spark, dir, "events"), "purchase")
      .orderBy("event_id")

  /** q48 — same-user event pairs within 60 seconds (bucketed range join). */
  def q48TimeRangeJoin(spark: SparkSession, dir: String): DataFrame =
    timeRangePairs(t(spark, dir, "events"), maxGapSeconds = 60)
      .orderBy("user_id", "id_a", "id_b")

  /** q72 — latest event per user (CDC upsert compaction). */
  def q72LatestSnapshot(spark: SparkSession, dir: String): DataFrame =
    latestSnapshot(t(spark, dir, "events"), Seq("user_id"), "ts", "event_id")
      .select("user_id", "event_id", "ts", "event_type", "value")
      .orderBy("user_id")

  /** q73 — SCD2 intervals of each user's event-type state changes. */
  def q73Scd2Intervals(spark: SparkSession, dir: String): DataFrame =
    scd2Intervals(
        t(spark, dir, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type")),
        Seq("user_id"), "ts", "event_id")
      .select("user_id", "event_id", "event_type", "valid_from", "valid_to",
        "is_current")
      .orderBy("user_id", "valid_from", "event_id")

  /** Peak interval overlap (max concurrency) per day — the sweep-line
    * classic: every interval contributes a +1 delta at its (clipped) start
    * and a −1 at its end, a running sum over (time, delta) gives the live
    * count, and its max per day is the answer. Intervals are half-open
    * [start, end): the `delta asc` tie order releases an ending interval
    * BEFORE an equal-instant start claims its slot.
    *
    * Scale design: the window partitions by DAY, not globally — intervals
    * crossing midnight are split into per-day segments first (explode over
    * the day span), so each day's sweep is independent and the global sort
    * a naive formulation needs never exists. An interval alive at day
    * start contributes its +1 at the clipped segment start, preserving
    * carry-over counts across the split. */
  def maxConcurrency(intervals: DataFrame, startCol: String,
                     endCol: String): DataFrame = {
    val seg = intervals
      .select(col(startCol).as("s"), col(endCol).as("e"))
      .withColumn("d", explode(sequence(to_date(col("s")),
        // end is exclusive: an interval ending exactly at midnight has no
        // segment in that day
        to_date(col("e") - expr("interval 1 microsecond")))))
      .withColumn("seg_s", greatest(col("s"), col("d").cast("timestamp_ntz")))
      .withColumn("seg_e", least(col("e"),
        (col("d") + expr("interval 1 day")).cast("timestamp_ntz")))
    val deltas = seg.select(col("d"), col("seg_s").as("t"),
        lit(1).as("delta"))
      .unionAll(seg.select(col("d"), col("seg_e").as("t"),
        lit(-1).as("delta")))
    val w = Window.partitionBy(col("d"))
      .orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("live", sum(col("delta")).over(w))
      .groupBy(col("d").as("day"))
      .agg(max(col("live")).as("max_concurrent"))
  }

  // ---------------------------------------------------------------- q96
  /** Peak concurrent sessions per day, sessions being [ts, ts+30 min). */
  def q96MaxConcurrency(spark: SparkSession, dir: String): DataFrame =
    maxConcurrency(
        t(spark, dir, "events")
          .select(col("ts").as("s"),
            (col("ts") + expr("interval 30 minutes")).as("e")),
        "s", "e")
      .orderBy("day")

  // --------------------------------------------------------------- q140
  /** q140 — keyless range join: per event, the number of high-value
    * "incident" windows (value ≥ 150, [ts, ts+10 min)) that contain its
    * timestamp. An incident's own point event counts itself — its ts is
    * in its own window — matching the oracle's plain non-equi join. */
  def q140IntervalOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
    overlapCounts(ev, ev.filter(col("value") >= 150.0), 600000000L)
      .orderBy("event_id")
  }

  // --------------------------------------------------------------- q153
  /** Nearest-in-time join: for every purchase event, the SAME user's
    * temporally closest `view` event in either direction — the
    * bidirectional generalization of the backward-only as-of join
    * ([[q44AsofPrevPurchase]]), the lookup behind "which impression drove
    * this conversion". Ties (equal gap both sides) resolve backward, the
    * as-of convention.
    *
    * Scale shape: NO event×event self-join — both candidates come from
    * one user-keyed sorted window pass (running max of a (ts, id) struct
    * strictly before the row, running min strictly after), so the cost
    * is the single per-user sort every sequence op pays and state is two
    * structs per row. Gap arithmetic is integer microseconds — exact in
    * both engines. */
  def nearestEvent(events: DataFrame, anchorType: String,
                   targetType: String): DataFrame = {
    val us = unix_micros(col("ts").cast("timestamp"))
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    val tgt = when(col("event_type") === targetType,
      struct(col("us"), col("event_id")))
    val ev = events
      .select(col("user_id"), col("event_id"), col("event_type"),
        us.as("us"))
      .withColumn("prev_t", max(tgt).over(wPrev))
      .withColumn("next_t", min(tgt).over(wNext))
      .filter(col("event_type") === anchorType)
    val dPrev = col("us") - col("prev_t.us")
    val dNext = col("next_t.us") - col("us")
    ev.select(col("user_id"), col("event_id"),
        when(col("prev_t").isNotNull &&
            (col("next_t").isNull || dPrev <= dNext), lit("prev"))
          .when(col("next_t").isNotNull, lit("next"))
          .otherwise(lit("none")).as("direction"),
        when(col("prev_t").isNotNull &&
            (col("next_t").isNull || dPrev <= dNext),
          col("prev_t.event_id"))
          .when(col("next_t").isNotNull, col("next_t.event_id"))
          .as("nearest_id"),
        when(col("prev_t").isNotNull &&
            (col("next_t").isNull || dPrev <= dNext), dPrev)
          .when(col("next_t").isNotNull, dNext).as("gap_us"))
  }

  /** q153 entry: nearest view around each purchase. */
  def q153NearestEvent(spark: SparkSession, dir: String): DataFrame =
    nearestEvent(t(spark, dir, "events"), "purchase", "view")
      .orderBy("user_id", "event_id")

  // --------------------------------------------------------------- q165
  /** Snapshot diff audit: align two versions of a table on its key and
    * report, per compared column, how many rows were added, removed,
    * changed, or untouched — the reconciliation a CDC/replication
    * pipeline runs to PROVE an apply pass ([[Stats.mergeUpsert]]'s verb)
    * did what it claimed. One full-outer join on the key (the minimal
    * shuffle for the question), NULL-safe comparisons (`<=>`) so NULL↔
    * value transitions count as changes, and a single global fold to
    * the audit row.
    *
    * @param compareCols columns checked for value changes */
  def snapshotDiff(base: DataFrame, next: DataFrame, keyCol: String,
                   compareCols: Seq[String]): DataFrame = {
    val b = base.select((keyCol +: compareCols).map(c =>
      col(c).as(s"b_$c")): _*)
    val n = next.select((keyCol +: compareCols).map(c =>
      col(c).as(s"n_$c")): _*)
    val joined = b.join(n, col(s"b_$keyCol") === col(s"n_$keyCol"),
      "full_outer")
    val changed = compareCols.map(c => !(col(s"b_$c") <=> col(s"n_$c")))
      .reduce(_ || _)
    joined.agg(
      count(when(col(s"b_$keyCol").isNull, 1)).as("n_added"),
      count(when(col(s"n_$keyCol").isNull, 1)).as("n_removed"),
      count(when(col(s"b_$keyCol").isNotNull &&
        col(s"n_$keyCol").isNotNull && changed, 1)).as("n_changed"),
      count(when(col(s"b_$keyCol").isNotNull &&
        col(s"n_$keyCol").isNotNull && !changed, 1)).as("n_unchanged"))
  }

  /** q165 entry: audit a deterministic synthetic second version of
    * `orders` — keys ≡0 mod 97 deleted, prices ≡0 mod 31 bumped, keys
    * ≡0 mod 113 re-inserted shifted by 10⁷ (inserts). */
  def q165SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderpriority"))
    val nextV = base.filter(col("o_orderkey") % 97 =!= 0)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 31 === 0,
          round(col("o_totalprice") + 10.0, 2))
          .otherwise(col("o_totalprice")))
      .unionByName(base.filter(col("o_orderkey") % 113 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L))
    snapshotDiff(base, nextV, "o_orderkey",
      Seq("o_totalprice", "o_orderpriority"))
  }

  // --------------------------------------------------------------- q168
  /** Seasonal-residual anomaly detection on a daily event series: each
    * (day, event_type) count is compared against the LEAVE-ONE-OUT mean
    * of the same weekday's other occurrences — the seasonal-naive
    * baseline that doesn't let a spike inflate its own expectation. Days
    * whose count is ≥1.5× or ≤⅔ of that expectation are flagged. The
    * detection complement of [[Audit.q113DowSeasonality]] (which reports
    * the weekday PROFILE) and of q154 (which catches per-user
    * minute-scale bursts; this catches corpus-level day-scale shifts —
    * an ingest gap, a bot flood, a broken feed).
    *
    * Scale shape: one (day, type) hash aggregate over the fact table;
    * everything after runs on the bounded |days|×|types| frame — the
    * weekday baseline is a second tiny aggregate broadcast back, so no
    * window ever touches fact rows. LOO mean = (Σ_dow − n)/(cnt − 1):
    * integer subtraction then one double divide — engine-exact.
    * Weekdays with a single occurrence have no peer baseline and are
    * emitted unflagged with NULL expectation (a 4-week frame never hits
    * this; a 1-week one would). */
  def seasonalAnomalies(events: DataFrame, hi: Double = 1.5,
                        lo: Double = 2.0 / 3.0): DataFrame = {
    val daily = events
      .groupBy(date_trunc("day", col("ts")).as("day"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("dow", dayofweek(col("day")).cast("long"))
    val byDow = daily.groupBy(col("event_type"), col("dow"))
      .agg(sum(col("n")).as("dow_sum"), count(lit(1)).as("dow_cnt"))
    daily.join(broadcast(byDow), Seq("event_type", "dow"))
      .withColumn("expected",
        when(col("dow_cnt") > 1,
          round((col("dow_sum") - col("n")).cast("double") /
            (col("dow_cnt") - 1).cast("double"), 6)))
      .withColumn("ratio",
        when(col("expected").isNotNull && col("expected") > 0,
          round(col("n").cast("double") / col("expected"), 6)))
      .withColumn("anomaly",
        coalesce(col("ratio") >= hi || col("ratio") <= lo, lit(false)))
      .select(col("day"), col("event_type"), col("n"), col("expected"),
        col("ratio"), col("anomaly"))
  }

  /** q168 entry: daily anomalies across the 30-day event window. */
  def q168SeasonalAnomalies(spark: SparkSession, dir: String): DataFrame =
    seasonalAnomalies(t(spark, dir, "events"))
      .orderBy("day", "event_type")

  // --------------------------------------------------------------- q181
  /** Time-weighted average event value per user: each event's value
    * "holds" until the user's next event, and the average weights every
    * value by how long it held — the correct mean for any
    * sampled-on-change series (sensor readings, account balances, spot
    * prices), where the plain row mean over-counts bursts of rapid
    * updates.
    *
    * Determinism: weights are integer MICROSECOND gaps and values are
    * integer CENTS; each interval's value·duration product is formed
    * AFTER casting cents to decimal(38,0) — a long·long product would
    * silently wrap in non-ANSI Spark for a large value held across a
    * multi-year gap, exactly where the oracle's BIGINT multiply errors
    * instead (the cast-before-multiply discipline of q185/q194). Sums
    * stay decimal(38,0); the one double divide happens at the very end,
    * mirrored operand for operand in the oracle.
    *
    * Scale shape: one user-keyed exchange feeds the lead window, then
    * the same partitioning feeds the per-user aggregate — no join, no
    * second shuffle, no per-user state beyond the running sums. */
  def timeWeightedAvg(events: DataFrame): DataFrame = {
    // ordering by the integer microsecond image of ts is the same total
    // order (epoch_us is monotone), so ts itself never travels
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    events
      .select(col("user_id"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .withColumn("next_us", lead(col("us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .select(col("user_id"), (col("next_us") - col("us")).as("wus"),
        (col("cents").cast("decimal(38,0)") *
          (col("next_us") - col("us"))).as("cwus"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_intervals"),
        sum(col("wus")).as("span_us"),
        round(sum(col("cwus")).cast("double") /
          sum(col("wus")) / 100.0, 6).as("twa_value"))
      .orderBy("user_id")
  }

  def q181TimeWeightedAvg(spark: SparkSession, dir: String): DataFrame =
    timeWeightedAvg(t(spark, dir, "events"))

  // --------------------------------------------------------------- q183
  /** Kaplan–Meier survival curve over subject lifetimes: for each
    * observed lifetime (days from a subject's first to last activity),
    * the risk set, the churn events, the right-censored exits (subjects
    * still active within `censorGapDays` of the observation horizon),
    * and the product-limit survival estimate S(t) = Π_{s≤t} (1 − d_s/n_s)
    * — the censoring-correct retention curve (Kaplan & Meier 1958),
    * where the naive "% still active after t days" is biased by subjects
    * who simply weren't observed long enough.
    *
    * Scale shape: the fact table collapses to one (first, last) row per
    * subject (hash aggregate), then to one row per distinct lifetime DAY
    * — a frame bounded by the observation span (a domain, not a data
    * volume). The cumulative windows ride that day frame; nothing
    * per-subject ever sorts or windows.
    *
    * Determinism: lifetimes are exact datediff day counts; risk sets and
    * event counts are exact longs. S(t) is exp(Σ ln(1−d/n)) with each
    * ratio produced by ONE double divide — the same transcendental
    * evaluation order as the oracle (the q171 cross-entropy recipe). */
  def kaplanMeier(subjects: DataFrame, keyCol: String, tsCol: String,
                  censorGapDays: Int = 90): DataFrame = {
    val perKey = subjects
      .groupBy(col(keyCol))
      .agg(min(col(tsCol)).as("first_d"), max(col(tsCol)).as("last_d"))
    val horizon = perKey.agg(max(col("last_d")).as("max_d"))
    val lifetimes = perKey
      .crossJoin(broadcast(horizon))
      .select(
        datediff(col("last_d"), col("first_d")).cast("long")
          .as("lifetime_d"),
        (datediff(col("max_d"), col("last_d")) > censorGapDays)
          .cast("long").as("churned"))
    val byDay = lifetimes
      .groupBy(col("lifetime_d"))
      .agg(sum(col("churned")).as("d"),
        sum(lit(1) - col("churned")).as("c"))
    val wCum = Window.orderBy(col("lifetime_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wRev = Window.orderBy(col("lifetime_d"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    byDay
      // everyone whose lifetime is >= t is still at risk at t
      .withColumn("n_risk", sum(col("d") + col("c")).over(wRev))
      .withColumn("lnterm",
        when(col("d") > 0,
          log((col("n_risk") - col("d")).cast("double") / col("n_risk")))
          .otherwise(lit(0.0)))
      .withColumn("survival",
        round(exp(sum(col("lnterm")).over(wCum)), 6))
      .filter(col("d") > 0)
      .select(col("lifetime_d"), col("n_risk"), col("d").as("n_events"),
        col("c").as("n_censored"), col("survival"))
      .orderBy("lifetime_d")
  }

  /** q183 entry: customer survival over order activity — "still a
    * customer" = ordered within 90 days of the dataset horizon. */
  def q183KaplanMeier(spark: SparkSession, dir: String): DataFrame =
    kaplanMeier(t(spark, dir, "orders"), "o_custkey", "o_orderdate")

  // --------------------------------------------------------------- q199
  /** Repeat-purchase cadence: the distribution of gaps between a
    * customer's consecutive orders (day histogram with cumulative
    * share), plus the exponential-model readout — MLE rate λ̂ = gaps/Σd
    * and the implied P(next order ≤ 30d) = 1 − e^{−30λ̂} — against the
    * EMPIRICAL 30-day share, so the one-number model and the data sit
    * side by side (a large gap between them says "don't model cadence
    * as memoryless").
    *
    * Scale shape: one user-keyed exchange for the lag window, then the
    * gap frame collapses to the day histogram (domain-bounded by the
    * date span); the model scalars ride a 1-row broadcast.
    *
    * Determinism: gaps are exact datediff days; λ̂ is one divide; exp is
    * IEEE on an identical operand; shares are one divide per row. */
  def purchaseCadence(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("prev", lag(col("o_orderdate"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(datediff(col("o_orderdate"), col("prev")).cast("long")
        .as("gap_d"))
      .groupBy(col("gap_d")).agg(count(lit(1)).as("n"))
      .persist()
    val model = gaps.agg(
      sum(col("n")).as("n_gaps"),
      sum(col("gap_d") * col("n")).as("sum_d"),
      sum(when(col("gap_d") <= 30, col("n")).otherwise(0L))
        .as("n_le30"))
      .select(col("n_gaps"),
        (col("n_gaps").cast("double") / col("sum_d")).as("lambda"),
        (col("n_le30").cast("double") / col("n_gaps"))
          .as("emp_le30"))
    val wCum = Window.orderBy(col("gap_d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gaps
      .withColumn("cum", sum(col("n")).over(wCum))
      .crossJoin(broadcast(model))
      .select(col("gap_d"), col("n"),
        round(col("cum").cast("double") / col("n_gaps"), 6)
          .as("cum_share"),
        round(col("lambda"), 6).as("lambda_hat"),
        round(lit(1.0) - exp(lit(-30.0) * col("lambda")), 6)
          .as("model_p_le30"),
        round(col("emp_le30"), 6).as("empirical_p_le30"))
      .orderBy("gap_d")
  }

  def q199PurchaseCadence(spark: SparkSession, dir: String): DataFrame =
    purchaseCadence(t(spark, dir, "orders"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q199_purchase_cadence" -> q199PurchaseCadence _,
    "q183_kaplan_meier" -> q183KaplanMeier _,
    "q181_time_weighted_avg" -> q181TimeWeightedAvg _,
    "q168_seasonal_anomalies" -> q168SeasonalAnomalies _,
    "q153_nearest_event" -> q153NearestEvent _,
    "q165_snapshot_diff" -> q165SnapshotDiff _,
    "q44_asof_prev_purchase" -> q44AsofPrevPurchase _,
    "q48_time_range_join" -> q48TimeRangeJoin _,
    "q72_latest_snapshot" -> q72LatestSnapshot _,
    "q73_scd2_intervals" -> q73Scd2Intervals _,
    "q96_max_concurrency" -> q96MaxConcurrency _,
    "q140_interval_overlap" -> q140IntervalOverlap _)

  val oracle: Map[String, String] = Map(
    // q199: exact day gaps; one divide for lambda, IEEE exp on an
    // identical operand, one divide per histogram row.
    "q199_purchase_cadence" ->
      """WITH g AS (
        |  SELECT date_diff('day',
        |           lag(o_orderdate) OVER (PARTITION BY o_custkey
        |             ORDER BY o_orderdate, o_orderkey),
        |           o_orderdate) AS gap_d
        |  FROM orders),
        |h AS (
        |  SELECT gap_d, COUNT(*) AS n FROM g
        |  WHERE gap_d IS NOT NULL GROUP BY 1),
        |m AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_gaps,
        |         CAST(SUM(n) AS BIGINT) /
        |           CAST(CAST(SUM(gap_d * n) AS BIGINT) AS DOUBLE)
        |           AS lambda,
        |         CAST(SUM(CASE WHEN gap_d <= 30 THEN n ELSE 0 END)
        |              AS DOUBLE) / CAST(SUM(n) AS BIGINT) AS emp
        |  FROM h),
        |c AS (
        |  SELECT gap_d, n, SUM(n) OVER (ORDER BY gap_d
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM h)
        |SELECT gap_d, n,
        |       round(CAST(cum AS DOUBLE) / n_gaps, 6) AS cum_share,
        |       round(lambda, 6) AS lambda_hat,
        |       round(1.0 - exp(-30.0 * lambda), 6) AS model_p_le30,
        |       round(emp, 6) AS empirical_p_le30
        |FROM c, m ORDER BY gap_d""".stripMargin,
    // q183: exact day-count lifetimes; risk sets and counts exact;
    // ln/exp evaluated in the same operand order as the engine (one
    // divide inside the ln).
    "q183_kaplan_meier" ->
      """WITH pu AS (
        |  SELECT o_custkey, min(o_orderdate) AS f, max(o_orderdate) AS l
        |  FROM orders GROUP BY 1),
        |h AS (SELECT max(l) AS mx FROM pu),
        |lt AS (
        |  SELECT date_diff('day', f, l) AS lifetime_d,
        |         CAST(date_diff('day', l, mx) > 90 AS BIGINT) AS churned
        |  FROM pu, h),
        |bd AS (
        |  SELECT lifetime_d, SUM(churned) AS d, SUM(1 - churned) AS c
        |  FROM lt GROUP BY 1),
        |r AS (
        |  SELECT lifetime_d, d, c,
        |         SUM(d + c) OVER (ORDER BY lifetime_d
        |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        |           AS n_risk
        |  FROM bd),
        |s AS (
        |  SELECT lifetime_d, d, c, n_risk,
        |         CASE WHEN d > 0
        |           THEN ln(CAST(n_risk - d AS DOUBLE) / n_risk)
        |           ELSE 0.0 END AS lnterm
        |  FROM r),
        |f AS (
        |  SELECT lifetime_d, d, c, n_risk,
        |         round(exp(SUM(lnterm) OVER (ORDER BY lifetime_d
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
        |           AS survival
        |  FROM s)
        |SELECT lifetime_d, CAST(n_risk AS BIGINT) AS n_risk,
        |       CAST(d AS BIGINT) AS n_events,
        |       CAST(c AS BIGINT) AS n_censored, survival
        |FROM f WHERE d > 0 ORDER BY lifetime_d""".stripMargin,
    // q181: integer-microsecond gaps x integer cents, summed exactly;
    // the double divide and /100 rescale happen last, in the same order.
    "q181_time_weighted_avg" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_us(ts) AS us,
        |         CAST(round(value * 100) AS BIGINT) AS cents,
        |         lead(epoch_us(ts)) OVER (
        |           PARTITION BY user_id ORDER BY ts, event_id)
        |           AS next_us
        |  FROM events),
        |i AS (
        |  SELECT user_id, next_us - us AS wus,
        |         CAST(cents AS HUGEINT) * (next_us - us) AS cwus
        |  FROM e WHERE next_us IS NOT NULL)
        |SELECT user_id, COUNT(*) AS n_intervals,
        |       CAST(SUM(wus) AS BIGINT) AS span_us,
        |       round(CAST(SUM(cwus) AS DOUBLE)
        |             / CAST(SUM(wus) AS BIGINT) / 100.0, 6) AS twa_value
        |FROM i GROUP BY 1 ORDER BY user_id""".stripMargin,
    // q168: LOO mean over integer (sum, cnt) then one double divide; the
    // ratio divides by the ROUNDED expectation exactly as the engine
    // does. dow numbering differs across engines but is only a grouping
    // key, never output.
    "q168_seasonal_anomalies" ->
      """WITH daily AS (
        |  SELECT date_trunc('day', ts) AS day, event_type,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |d2 AS (SELECT *, dayofweek(day) AS dow FROM daily),
        |b AS (SELECT event_type, dow, SUM(n) AS dow_sum,
        |             COUNT(*) AS dow_cnt
        |      FROM d2 GROUP BY 1, 2),
        |e AS (
        |  SELECT day, event_type, n,
        |         CASE WHEN dow_cnt > 1
        |              THEN round(CAST(dow_sum - n AS DOUBLE)
        |                         / (dow_cnt - 1), 6) END AS expected
        |  FROM d2 JOIN b USING (event_type, dow)),
        |r AS (
        |  SELECT *, CASE WHEN expected IS NOT NULL AND expected > 0
        |                 THEN round(CAST(n AS DOUBLE) / expected, 6)
        |            END AS ratio
        |  FROM e)
        |SELECT CAST(day AS TIMESTAMP) AS day, event_type,
        |       CAST(n AS BIGINT) AS n, expected, ratio,
        |       coalesce(ratio >= 1.5 OR ratio <= 2.0/3.0, false)
        |         AS anomaly
        |FROM r ORDER BY day, event_type""".stripMargin,
    // q165: same synthetic second version, NULL-safe compares via
    // IS DISTINCT FROM (DuckDB's <=> negation).
    "q165_snapshot_diff" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders),
        |nxt AS (
        |  SELECT o_orderkey,
        |         CASE WHEN o_orderkey % 31 = 0
        |              THEN round(o_totalprice + 10.0, 2)
        |              ELSE o_totalprice END AS o_totalprice,
        |         o_orderpriority
        |  FROM base WHERE o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_totalprice, o_orderpriority
        |  FROM base WHERE o_orderkey % 113 = 0),
        |j AS (
        |  SELECT b.o_orderkey AS bk, n.o_orderkey AS nk,
        |         (b.o_totalprice IS DISTINCT FROM n.o_totalprice
        |          OR b.o_orderpriority IS DISTINCT FROM n.o_orderpriority)
        |           AS chg
        |  FROM base b FULL OUTER JOIN nxt n
        |    ON b.o_orderkey = n.o_orderkey)
        |SELECT COUNT(*) FILTER (bk IS NULL) AS n_added,
        |       COUNT(*) FILTER (nk IS NULL) AS n_removed,
        |       COUNT(*) FILTER (bk IS NOT NULL AND nk IS NOT NULL
        |                        AND chg) AS n_changed,
        |       COUNT(*) FILTER (bk IS NOT NULL AND nk IS NOT NULL
        |                        AND NOT chg) AS n_unchanged
        |FROM j""".stripMargin,
    // q153: struct MIN/MAX are lexicographic by field order in both
    // engines (q76's pattern); gaps are integer microseconds.
    "q153_nearest_event" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type, epoch_us(ts) AS us
        |  FROM events),
        |w AS (
        |  SELECT *,
        |    MAX(CASE WHEN event_type = 'view'
        |             THEN {'us': us, 'id': event_id} END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS prev_t,
        |    MIN(CASE WHEN event_type = 'view'
        |             THEN {'us': us, 'id': event_id} END)
        |      OVER (PARTITION BY user_id ORDER BY us, event_id
        |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
        |      AS next_t
        |  FROM e)
        |SELECT user_id, event_id,
        |  CASE WHEN prev_t IS NOT NULL
        |            AND (next_t IS NULL
        |                 OR us - prev_t.us <= next_t.us - us)
        |         THEN 'prev'
        |       WHEN next_t IS NOT NULL THEN 'next'
        |       ELSE 'none' END AS direction,
        |  CASE WHEN prev_t IS NOT NULL
        |            AND (next_t IS NULL
        |                 OR us - prev_t.us <= next_t.us - us)
        |         THEN prev_t.id
        |       WHEN next_t IS NOT NULL THEN next_t.id END AS nearest_id,
        |  CASE WHEN prev_t IS NOT NULL
        |            AND (next_t IS NULL
        |                 OR us - prev_t.us <= next_t.us - us)
        |         THEN us - prev_t.us
        |       WHEN next_t IS NOT NULL THEN next_t.us - us END AS gap_us
        |FROM w WHERE event_type = 'purchase'
        |ORDER BY user_id, event_id""".stripMargin,
    "q140_interval_overlap" ->
      """WITH inc AS (
        |  SELECT event_id AS iid, epoch_us(CAST(ts AS TIMESTAMP)) AS i_us
        |  FROM events WHERE value >= 150.0)
        |SELECT e.event_id, COUNT(i.iid) AS n_overlap
        |FROM events e LEFT JOIN inc i
        |  ON epoch_us(CAST(e.ts AS TIMESTAMP)) >= i.i_us
        | AND epoch_us(CAST(e.ts AS TIMESTAMP)) < i.i_us + 600000000
        |GROUP BY e.event_id ORDER BY e.event_id""".stripMargin,
    "q96_max_concurrency" ->
      """WITH iv AS (
        |  SELECT CAST(ts AS TIMESTAMP) AS s,
        |         CAST(ts AS TIMESTAMP) + INTERVAL 30 MINUTE AS e
        |  FROM events),
        |seg AS (
        |  SELECT s, e,
        |         unnest(generate_series(CAST(s AS DATE),
        |           CAST(e - INTERVAL 1 MICROSECOND AS DATE),
        |           INTERVAL 1 DAY)) AS dts
        |  FROM iv),
        |seg2 AS (
        |  SELECT CAST(dts AS DATE) AS d,
        |         greatest(s, CAST(CAST(dts AS DATE) AS TIMESTAMP)) AS seg_s,
        |         least(e, CAST(CAST(dts AS DATE) AS TIMESTAMP)
        |                  + INTERVAL 1 DAY) AS seg_e
        |  FROM seg),
        |deltas AS (
        |  SELECT d, seg_s AS t, 1 AS delta FROM seg2
        |  UNION ALL
        |  SELECT d, seg_e, -1 FROM seg2),
        |live AS (
        |  SELECT d, SUM(delta) OVER (PARTITION BY d ORDER BY t, delta
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS live
        |  FROM deltas)
        |SELECT d AS day, CAST(MAX(live) AS BIGINT) AS max_concurrent
        |FROM live GROUP BY d ORDER BY day""".stripMargin,
    "q44_asof_prev_purchase" ->
      """SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |       CAST(MAX(CASE WHEN event_type = 'purchase' THEN ts END)
        |              OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |            AS TIMESTAMP) AS prev_match_ts
        |FROM events ORDER BY event_id""".stripMargin,
    "q48_time_range_join" ->
      """SELECT a.user_id, a.event_id AS id_a, b.event_id AS id_b,
        |       CAST(epoch_us(CAST(b.ts AS TIMESTAMP))
        |            - epoch_us(CAST(a.ts AS TIMESTAMP)) AS DOUBLE) / 1e6
        |         AS gap_seconds
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND epoch_us(CAST(b.ts AS TIMESTAMP)) > epoch_us(CAST(a.ts AS TIMESTAMP))
        | AND epoch_us(CAST(b.ts AS TIMESTAMP))
        |     <= epoch_us(CAST(a.ts AS TIMESTAMP)) + 60000000
        |ORDER BY a.user_id, id_a, id_b""".stripMargin,
    "q72_latest_snapshot" ->
      """SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type,
        |       value
        |FROM (SELECT *, row_number() OVER (PARTITION BY user_id
        |                 ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q73_scd2_intervals" ->
      """SELECT user_id, event_id, event_type,
        |       CAST(ts AS TIMESTAMP) AS valid_from,
        |       CAST(lead(ts, 1) OVER w AS TIMESTAMP) AS valid_to,
        |       lead(ts, 1) OVER w IS NULL AS is_current
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, valid_from, event_id""".stripMargin)
}
