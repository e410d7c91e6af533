package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._
import graft.sources.TableCatalog

/** Statistical / reshaping / maintenance operators rounding out the
  * relational surface: unpivot (wide→long reshape), exact correlation
  * matrices, grouped median+mode, per-document character entropy, grouped
  * argmax, batch merge-upsert (CDC apply), exponentially-decayed trailing
  * averages, embedding component statistics, date-spine gap filling, and
  * distribution ranks (percent_rank / cume_dist).
  *
  * Everything is a pure DataFrame transform with deterministic,
  * DuckDB-mirrorable semantics: double aggregates route through exact
  * decimal sums ([[graft.functions.dsum]]-style), argmax ties resolve
  * through lexicographic struct ordering, and decayed weights use
  * power-of-two decay so every weighted term is correctly rounded the
  * same way in both engines.
  */
object Stats {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    TableCatalog.load(spark, dir, name)

  /** Wide→long unpivot of aggregate metric columns (the reshape every
    * reporting sink wants). Runs AFTER aggregation, so the unpivot
    * multiplies a |groups|-row frame, never the fact table. */
  def unpivotMetrics(df: DataFrame, id: String, metrics: Seq[String],
                     varCol: String = "metric",
                     valCol: String = "mval"): DataFrame =
    df.unpivot(Array(col(id)), metrics.map(col).toArray, varCol, valCol)

  /** Batch merge-upsert (the MERGE INTO / CDC-apply primitive): rows of
    * `base` whose key appears in `changes` are replaced by the change row
    * (op 'U'), keys flagged 'D' are deleted, and new keys (op 'I') append.
    *
    * Scale shape: ONE anti-join keyed on `keyCol` (a typical CDC batch is
    * tiny next to the base snapshot, so AQE broadcasts it and the base
    * never shuffles) plus a union with the surviving change rows. This is
    * the batch-table twin of the streaming upsert sink
    * ([[graft.streaming.Streams]]); q72's latest-wins snapshot compacts a
    * change LOG, this applies a resolved batch to a base table. */
  def mergeUpsert(base: DataFrame, changes: DataFrame, keyCol: String,
                  opCol: String = "op"): DataFrame = {
    val kept = base.join(changes.select(col(keyCol)), Seq(keyCol), "left_anti")
    kept.unionByName(changes.filter(col(opCol) =!= "D").drop(opCol))
  }

  /** Exponentially-decayed trailing average over a (bounded) keyed series:
    * value at t averages the series' values over the trailing `window`
    * positions with weight 2^-(t-k) — the smoothing curve of monitoring
    * and trend reports. Decay is a POWER OF TWO by design: each weighted
    * term is then an exact exponent shift of the input double, so after a
    * fixed decimal rounding both engines sum identical terms in exact
    * decimal arithmetic and the result is bit-stable — an arbitrary alpha
    * would make the float summation order observable.
    *
    * Candidate pairing is the q48 bucket pattern (each row joins its own
    * and the previous `window`-sized bucket, residual-filtered), so the
    * join stays equi-keyed and near-linear; the frame is post-aggregate
    * (days, not facts), bounded at any corpus scale. */
  def decayedTrailingAvg(series: DataFrame, posCol: String, valCol: String,
                         window: Int = 30): DataFrame = {
    val a = series.select(col("*"),
      (col(posCol) / window).cast("long").as("bucket_a"))
    val b = series.select(col(posCol).as("pos_b"), col(valCol).as("val_b"))
      .withColumn("bucket",
        explode(array((col("pos_b") / window).cast("long"),
          (col("pos_b") / window).cast("long") + 1)))
    val paired = a.join(b,
        col("bucket_a") === col("bucket") &&
          col("pos_b").between(col(posCol) - (window - 1), col(posCol)))
      .withColumn("diff", (col(posCol) - col("pos_b")).cast("int"))
    val term = (col("val_b") /
      call_function("shiftleft", lit(1L), col("diff")))
      .cast("decimal(38,25)")
    val weight = (lit(1.0) /
      call_function("shiftleft", lit(1L), col("diff")))
      .cast("decimal(38,30)")
    paired
      .groupBy(series.columns.map(col): _*)
      .agg(round(sum(term).cast("double") / sum(weight).cast("double"), 6)
        .as("decayed_avg"))
  }

  // ---------------------------------------------------------------- q82
  /** Per-returnflag metric sums reshaped long via `Dataset.unpivot`. */
  def q82UnpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    val agg = t(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        dsum(col("l_discount")).as("sum_disc"))
    unpivotMetrics(agg, "l_returnflag",
        Seq("sum_qty", "sum_price", "sum_disc"))
      .orderBy("l_returnflag", "metric")
  }

  // ---------------------------------------------------------------- q83
  /** Exact Pearson correlation matrix over the lineitem measures. All
    * moments (Σx, Σx², Σxy) ride ONE aggregate pass as exact decimal sums
    * — so both engines derive bit-identical correlations — and the 3
    * output rows unfold from the single moment row with no second scan.
    * (Spark's own `corr` streams float partials whose merge order is
    * nondeterministic; the moment form is the scale-stable way.) */
  def q83CorrelationMatrix(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val q = col("l_quantity"); val p = col("l_extendedprice")
    val d = col("l_discount")
    def d18(c: Column) = sum(c.cast("decimal(18,4)")).cast("double")
    def d28(c: Column) = sum(c.cast("decimal(28,6)")).cast("double")
    val m = li.agg(
      count(lit(1)).as("n"),
      d18(q).as("sq"), d18(p).as("sp"), d18(d).as("sd"),
      d28(q * q).as("sqq"), d28(p * p).as("spp"), d28(d * d).as("sdd"),
      d28(q * p).as("sqp"), d28(q * d).as("sqd"), d28(p * d).as("spd"))
    def corrOf(sx: String, sy: String, sxy: String, sxx: String,
               syy: String): Column =
      round((col("n") * col(sxy) - col(sx) * col(sy)) /
        (sqrt(col("n") * col(sxx) - col(sx) * col(sx)) *
          sqrt(col("n") * col(syy) - col(sy) * col(sy))), 6)
    val rows = array(
      struct(lit("extendedprice").as("var_x"), lit("discount").as("var_y"),
        corrOf("sp", "sd", "spd", "spp", "sdd").as("corr_v")),
      struct(lit("quantity").as("var_x"), lit("discount").as("var_y"),
        corrOf("sq", "sd", "sqd", "sqq", "sdd").as("corr_v")),
      struct(lit("quantity").as("var_x"), lit("extendedprice").as("var_y"),
        corrOf("sq", "sp", "sqp", "sqq", "spp").as("corr_v")))
    m.select(explode(rows).as("r"), col("n"))
      .select(col("r.var_x").as("var_x"), col("r.var_y").as("var_y"),
        col("r.corr_v").as("corr_v"), col("n"))
      .orderBy("var_x", "var_y")
  }

  // --------------------------------------------------------------- q132
  /** Per-group ordinary least squares (price ~ quantity by returnflag):
    * closed-form slope/intercept from the five exact sufficient moments
    * (n, Σx, Σy, Σx², Σxy) — the q83 decimal-moment pattern, grouped.
    * ONE pass over the fact table with map-side partials; the moment
    * frame is |groups| rows, so the regression arithmetic is free at any
    * scale, and adding groups (or a y per metric) never re-scans. The
    * 2-dp inputs make every product exact in double before the exact
    * DECIMAL sums, so slope/intercept are bit-identical to the oracle's
    * mirrored formula. */
  def q132GroupRegression(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val x = col("l_quantity"); val y = col("l_extendedprice")
    def d18(c: Column) = sum(c.cast("decimal(18,4)")).cast("double")
    def d28(c: Column) = sum(c.cast("decimal(28,6)")).cast("double")
    val m = li.groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        d18(x).as("sx"), d18(y).as("sy"),
        d28(x * x).as("sxx"), d28(x * y).as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    m.select(col("l_returnflag"), col("n"),
        round(slope, 6).as("slope"),
        round((col("sy") - slope * col("sx")) / col("n"), 6)
          .as("intercept"))
      .orderBy("l_returnflag")
  }

  // --------------------------------------------------------------- q133
  /** Chi-squared test of independence between order status and order
    * priority — the categorical-association screen (is priority assigned
    * independently of status?) every data-quality / experiment pipeline
    * runs. ONE pass over the fact table produces the r×c contingency
    * cells; row totals, column totals, N, and the distinct-level counts
    * are all re-aggregated from that |r·c|-row frame, so the statistic's
    * arithmetic is free at any scale and the fact table is scanned
    * exactly once. Expected counts and the (O−E)²/E terms evaluate in
    * DOUBLE with the formula tree mirrored token-for-token in the
    * oracle; the per-cell contributions sum as DECIMAL(28,12)
    * (order-free) so the statistic is hash-exact. Also reports Cramér's
    * V = sqrt(χ² / (N·min(r−1, c−1))), the [0,1] effect size that stays
    * comparable as N grows. */
  def chiSquare(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    // localCheckpoint materializes the r×c cell frame (bounded by the
    // categorical domains, never by N) so the four derived aggregates
    // below reuse it — without it each re-derives the subtree and the
    // fact table is scanned four times instead of once (plan-asserted)
    val cells = df.groupBy(col(aCol), col(bCol))
      .agg(count(lit(1)).as("obs"))
      .localCheckpoint()
    val rowT = cells.groupBy(col(aCol))
      .agg(sum(col("obs")).as("row_tot"))
    val colT = cells.groupBy(col(bCol))
      .agg(sum(col("obs")).as("col_tot"))
    val tot = cells.agg(
      sum(col("obs")).as("n_total"),
      countDistinct(col(aCol)).as("n_r"),
      countDistinct(col(bCol)).as("n_c"))
    val e = col("row_tot").cast("double") * col("col_tot").cast("double") /
      col("n_total").cast("double")
    val contrib = (col("obs").cast("double") - e) *
      (col("obs").cast("double") - e) / e
    val j = cells
      .join(broadcast(rowT), aCol)
      .join(broadcast(colT), bCol)
      .crossJoin(broadcast(tot))
      .select(col("n_total"), col("n_r"), col("n_c"),
        contrib.cast("decimal(28,12)").as("term"))
    val chi2 = sum(col("term")).cast("double")
    j.groupBy(col("n_total"), col("n_r"), col("n_c"))
      .agg(round(chi2, 6).as("chi2"),
        round(sqrt(chi2 / (col("n_total").cast("double") *
          least(col("n_r") - 1, col("n_c") - 1).cast("double"))), 6)
          .as("cramers_v"))
      .select(col("n_total"),
        ((col("n_r") - 1) * (col("n_c") - 1)).as("dof"),
        col("chi2"), col("cramers_v"))
  }

  /** q133 entry: status × priority over orders. */
  def q133ChiSquare(spark: SparkSession, dir: String): DataFrame =
    chiSquare(t(spark, dir, "orders"), "o_orderstatus", "o_orderpriority")

  // --------------------------------------------------------------- q136
  /** Welch's unequal-variance t-test: does mean account balance differ
    * between the BUILDING and MACHINERY customer segments? The whole
    * test is ONE conditional-aggregate pass (n, Σx, Σx² per arm via
    * FILTER-style `when` sums in exact decimal) — a 1-row frame at any
    * scale, never a per-arm re-scan. Mean, sample variance, the t
    * statistic, and the Welch–Satterthwaite degrees of freedom evaluate
    * in DOUBLE from those exact moments with the expression tree
    * mirrored in the oracle, so every output digit is hash-exact. The
    * same shape extends to any A/B metric: add a `when` pair per arm. */
  def welchTtest(df: DataFrame, valCol: String, groupCol: String,
                 armA: String, armB: String): DataFrame = {
    val c = df.filter(col(groupCol).isin(armA, armB))
    def arm(seg: String): Column = col(groupCol) === seg
    def n(seg: String): Column = count(when(arm(seg), lit(1)))
    def s(seg: String): Column =
      sum(when(arm(seg), col(valCol).cast("decimal(18,4)")))
        .cast("double")
    def ss(seg: String): Column =
      sum(when(arm(seg), (col(valCol) * col(valCol))
        .cast("decimal(28,6)"))).cast("double")
    val m = c.agg(
      n(armA).as("n1"), s(armA).as("s1"), ss(armA).as("ss1"),
      n(armB).as("n2"), s(armB).as("s2"), ss(armB).as("ss2"))
    val n1 = col("n1").cast("double"); val n2 = col("n2").cast("double")
    val v1 = (n1 * col("ss1") - col("s1") * col("s1")) / (n1 * (n1 - lit(1.0)))
    val v2 = (n2 * col("ss2") - col("s2") * col("s2")) / (n2 * (n2 - lit(1.0)))
    val se2 = v1 / n1 + v2 / n2
    val meanDiff = col("s1") / n1 - col("s2") / n2
    val dof = se2 * se2 /
      ((v1 / n1) * (v1 / n1) / (n1 - lit(1.0)) +
        (v2 / n2) * (v2 / n2) / (n2 - lit(1.0)))
    m.select(col("n1"), col("n2"),
      round(meanDiff, 6).as("mean_diff"),
      round(meanDiff / sqrt(se2), 6).as("t_stat"),
      round(dof, 6).as("welch_dof"))
  }

  /** q136 entry: BUILDING vs MACHINERY on account balance. */
  def q136WelchTtest(spark: SparkSession, dir: String): DataFrame =
    welchTtest(t(spark, dir, "customer"), "c_acctbal", "c_mktsegment",
      "BUILDING", "MACHINERY")

  // --------------------------------------------------------------- q137
  /** Mann–Whitney U: the nonparametric (rank-based) counterpart of q136's
    * t-test — does one arm stochastically dominate the other, with no
    * normality assumption. Classic formulations rank every ROW under one
    * global sort (the q119 single-task scale-killer); this one never
    * ranks rows. One fact pass reduces to per-VALUE counts (cnt, arm-A
    * cnt), and every rank quantity folds over that frame: with
    * cum_before = Σ cnt of smaller values, the average rank of a value's
    * tie group is cum_before + (cnt+1)/2, so the arm-A rank sum is
    * R1 = Σ cnt_a·(cum_before + (cnt+1)/2) — computed as the INTEGER
    * 2·R1 = Σ cnt_a·(2·cum_before + cnt + 1) in DECIMAL(38,0), exact at
    * any scale, halved in double (exact: halves). Tie correction
    * Σ(t³−t) folds over the same frame. The one ordered window runs on
    * the DISTINCT-VALUE frame, bounded by the 2-dp currency domain
    * (~1.1M values max regardless of row count — the q80
    * bounded-dimension contract), never the fact table. U, z (with tie
    * correction), and the rank-biserial effect size evaluate in DOUBLE
    * with the tree mirrored in the oracle. */
  def mannWhitney(df: DataFrame, valCol: String, groupCol: String,
                  armA: String, armB: String): DataFrame = {
    val c = df.filter(col(groupCol).isin(armA, armB))
    val perVal = c.groupBy(col(valCol).as("v"))
      .agg(count(lit(1)).as("cnt"),
        count(when(col(groupCol) === armA, lit(1))).as("cnt_a"))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = perVal.withColumn("cum_before",
      coalesce(sum(col("cnt")).over(w), lit(0L)))
    val m = cum.agg(
      sum(col("cnt")).as("n"),
      sum(col("cnt_a")).as("n1"),
      sum((col("cnt_a") * (lit(2L) * col("cum_before") + col("cnt") + 1))
        .cast("decimal(38,0)")).as("r2"),
      sum((col("cnt") * col("cnt") * col("cnt") - col("cnt"))
        .cast("decimal(38,0)")).as("tsum"))
    val n1d = col("n1").cast("double")
    val n2d = (col("n") - col("n1")).cast("double")
    val nd = col("n").cast("double")
    val r1 = col("r2").cast("double") / lit(2.0)
    val u1 = r1 - n1d * (n1d + lit(1.0)) / lit(2.0)
    val mu = n1d * n2d / lit(2.0)
    val sigma = sqrt(n1d * n2d / lit(12.0) *
      ((nd + lit(1.0)) - col("tsum").cast("double") / (nd * (nd - lit(1.0)))))
    m.select(col("n1"), (col("n") - col("n1")).as("n2"),
      round(u1, 6).as("u_stat"),
      round((u1 - mu) / sigma, 6).as("z_stat"),
      round(lit(1.0) - lit(2.0) * u1 / (n1d * n2d), 6).as("rank_biserial"))
  }

  /** q137 entry: BUILDING vs MACHINERY on account balance (the
    * nonparametric twin of q136 on the same arms). */
  def q137MannWhitney(spark: SparkSession, dir: String): DataFrame =
    mannWhitney(t(spark, dir, "customer"), "c_acctbal", "c_mktsegment",
      "BUILDING", "MACHINERY")

  // --------------------------------------------------------------- q138
  /** Two-proportion z-test on purchase share: split users into
    * deterministic A/B cohorts (the q52 md5-prefix hash split — the
    * assignment a real experiment pipeline uses) and test whether the
    * share of purchase events differs between cohorts under the pooled
    * standard error. The whole test is ONE conditional-aggregate pass
    * over the fact table — no per-user shuffle, a 1-row frame at any
    * scale — then pure scalar double arithmetic mirrored in the oracle.
    * The md5 split is reproduced verbatim in DuckDB, so cohort
    * membership — not just the formula — is cross-checked. */
  def q138TwoProportionZ(spark: SparkSession, dir: String): DataFrame = {
    val ev = t(spark, dir, "events")
      .withColumn("cohort",
        when(substring(md5(col("user_id").cast("string")), 1, 1) < "8",
          lit("A")).otherwise(lit("B")))
    val purchase = (col("event_type") === "purchase").cast("long")
    val m = ev.agg(
      count(when(col("cohort") === "A", lit(1))).as("n1"),
      sum(when(col("cohort") === "A", purchase).otherwise(lit(0L)))
        .as("x1"),
      count(when(col("cohort") === "B", lit(1))).as("n2"),
      sum(when(col("cohort") === "B", purchase).otherwise(lit(0L)))
        .as("x2"))
    val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
    val p1 = col("x1").cast("double") / n1d
    val p2 = col("x2").cast("double") / n2d
    val pPool = (col("x1") + col("x2")).cast("double") / (n1d + n2d)
    val se = sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / n1d + lit(1.0) / n2d))
    m.select(col("n1"), col("x1"), col("n2"), col("x2"),
      round(p1, 6).as("rate_a"), round(p2, 6).as("rate_b"),
      round((p1 - p2) / se, 6).as("z_stat"))
  }

  // ---------------------------------------------------------------- q84
  /** Grouped median + deterministic mode: exact interpolated median of
    * quantity per returnflag, and the most frequent linestatus with ties
    * broken lexicographically (Spark's own `mode` is tie-nondeterministic;
    * the count+rank form is reproducible in any engine). */
  def q84MedianMode(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val med = li.groupBy(col("l_returnflag"))
      .agg(median(col("l_quantity")).as("median_qty"))
    val counts = li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("n").desc, col("l_linestatus").asc)
    val mode = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("l_linestatus").as("mode_status"),
        col("n").as("mode_n"))
    med.join(mode, "l_returnflag").orderBy("l_returnflag")
  }

  // ---------------------------------------------------------------- q85
  /** Character-entropy quality signal per document (fused
    * [[graft.functions.CharEntropy]] — one projection, zero shuffle; the
    * oracle recomputes it relationally, char-exploded). */
  def q85CharEntropy(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), length(col("text")).cast("long").as("n_chars_t"),
        round(charEntropy(col("text")), 6).as("entropy"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q86
  /** Grouped argmax: each market segment's top customer by account
    * balance, ties to the smallest custkey — ONE aggregate over a
    * lexicographic (−balance, custkey) struct; no window, no join, no
    * second pass (max_by ties are undefined; struct-min ties are not). */
  def q86GroupArgmax(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(min(struct((-col("c_acctbal")).as("na"),
        col("c_custkey").as("k"))).as("m"))
      .select(col("c_mktsegment"), col("m.k").as("top_custkey"),
        (-col("m.na")).as("top_acctbal"))
      .orderBy("c_mktsegment")

  // ---------------------------------------------------------------- q87
  /** MERGE INTO semantics over orders: a deterministic synthetic change
    * batch (price bumps on keys %10, deletes on keys %97, re-keyed
    * inserts on keys %13) applied via [[mergeUpsert]]. */
  def q87MergeUpsert(spark: SparkSession, dir: String): DataFrame = {
    val base = t(spark, dir, "orders")
    val k = col("o_orderkey")
    val upd = base.filter(k % 10 === 0 && k % 97 =!= 0)
      .withColumn("o_totalprice", col("o_totalprice") + 100.0)
      .withColumn("op", lit("U"))
    val del = base.filter(k % 97 === 0).withColumn("op", lit("D"))
    val ins = base.filter(k % 13 === 0)
      .withColumn("o_orderkey", k + 100000000L)
      .withColumn("op", lit("I"))
    val changes = upd.unionByName(del).unionByName(ins)
    mergeUpsert(base, changes, "o_orderkey").orderBy("o_orderkey")
  }

  // ---------------------------------------------------------------- q88
  /** Decayed trailing average of daily revenue (half-per-day decay,
    * 30-day window) via [[decayedTrailingAvg]]. */
  def q88DecayedRevenue(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
      .withColumn("day_num",
        datediff(col("day"), lit("1970-01-01")).cast("long"))
    decayedTrailingAvg(daily, "day_num", "revenue", window = 30)
      .select("day", "revenue", "decayed_avg")
      .orderBy("day")
  }

  // ---------------------------------------------------------------- q89
  /** Embedding component statistics: dimension, L2 norm (validates the
    * corpus's normalization invariant), min/max component per vector.
    * Pure fused projections ([[graft.functions.DotProduct]] for the norm)
    * — zero shuffle at any corpus size. */
  def q89EmbeddingStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        size(col("embedding")).cast("long").as("dim"),
        round(l2norm(col("embedding")), 6).as("norm"),
        array_min(col("embedding")).cast("double").as("min_c"),
        array_max(col("embedding")).cast("double").as("max_c"))
      .orderBy("vec_id")

  // ---------------------------------------------------------------- q90
  /** Date-spine gap fill: a generated continuous day spine left-joins the
    * daily aggregate so missing days surface as explicit zero rows — the
    * difference between a time series a forecaster can consume and one
    * with silent holes. The spine is O(days) (explodes from the one-row
    * min/max aggregate) and the daily frame joins it broadcast-small. */
  def q90DateSpineGapfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    val spine = daily.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"),
        expr("interval 1 day"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(col("day"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy("day")
  }

  // ---------------------------------------------------------------- q94
  /** Ancestor-chain rollup via SQL `WITH RECURSIVE` (Spark 4's recursive
    * CTE): each order's parent is `o_orderkey div 10` (a synthetic but
    * deterministic forest — the org-chart / bill-of-materials shape),
    * and the recursion carries every node's ROOT and DEPTH down the tree.
    * The recursive term is a plain equi-join against the previous
    * iteration's frontier, so each round is one shuffle over the frontier
    * only (Spark's recursive CTE supports UNION ALL — monotone
    * accumulation; cyclic closures still go through
    * [[Dedup.connectedComponents]]). Closed-form check: with contiguous
    * keys, depth(k) = digits(k) − 1 and root(k) = leading digit. */
  def q94RecursiveHierarchy(spark: SparkSession, dir: String): DataFrame = {
    t(spark, dir, "orders").select(col("o_orderkey"))
      .createOrReplaceTempView("q94_orders")
    spark.sql(
      """WITH RECURSIVE h(k, root, depth) AS (
        |  SELECT o_orderkey, o_orderkey, 0L FROM q94_orders
        |  WHERE o_orderkey <= 9
        |  UNION ALL
        |  SELECT o.o_orderkey, h.root, h.depth + 1L
        |  FROM q94_orders o JOIN h ON o.o_orderkey div 10 = h.k
        |  WHERE o.o_orderkey > 9)
        |SELECT k AS o_orderkey, root AS root_key, depth
        |FROM h ORDER BY o_orderkey""".stripMargin)
  }

  // ---------------------------------------------------------------- q95
  /** Last-observation-carried-forward over the gap-filled day spine: gap
    * days inherit the most recent observed revenue instead of q90's zero
    * — the imputation a forecaster wants for stock-like series. One
    * `last(..., ignoreNulls)` window over the bounded day spine (never
    * the fact table); `is_gap` keeps imputed rows distinguishable. */
  def q95LocfGapfill(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    val spine = daily.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"),
        expr("interval 1 day"))).as("day"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine.join(daily, Seq("day"), "left")
      .select(col("day"), col("revenue").isNull.as("is_gap"),
        last(col("revenue"), ignoreNulls = true).over(w)
          .as("revenue_filled"))
      .orderBy("day")
  }

  // --------------------------------------------------------------- q174
  /** Linear-interpolation gap fill — the straight-line upgrade of q95's
    * LOCF: a missing day's value is drawn on the line between its nearest
    * observed neighbors, weighted by day distance (LOCF's step function
    * biases trailing averages whenever a gap sits on a trend; sensor and
    * revenue series conventionally interpolate). Observed days pass
    * through untouched; the spine ends at the observed extremes, so both
    * neighbors always exist.
    *
    * Scale shape: q95's exact contract — the spine and both
    * direction windows run on the bounded post-aggregate DAY frame
    * (the unpartitioned window rides |days| rows, never facts; the
    * same documented bounded-frame contract). Interpolation arithmetic
    * is fixed-order double ops on integer day distances, mirrored
    * verbatim in the oracle. */
  def linearInterpDaily(daily: DataFrame, dayCol: String,
                        valCol: String): DataFrame = {
    val spine = daily
      .agg(min(col(dayCol)).as("mn"), max(col(dayCol)).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"),
        expr("interval 1 day"))).as(dayCol))
    val wb = Window.orderBy(col(dayCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.orderBy(col(dayCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    // the spine spans [min(day), max(day)] of the OBSERVED series, so
    // every row has an observed neighbor on both sides — no one-sided
    // fallback branch exists (or could ever run)
    spine.join(daily, Seq(dayCol), "left")
      .withColumn("prev_v", last(col(valCol), ignoreNulls = true).over(wb))
      .withColumn("prev_d",
        last(when(col(valCol).isNotNull, col(dayCol)), ignoreNulls = true)
          .over(wb))
      .withColumn("next_v",
        first(col(valCol), ignoreNulls = true).over(wf))
      .withColumn("next_d",
        first(when(col(valCol).isNotNull, col(dayCol)), ignoreNulls = true)
          .over(wf))
      .select(col(dayCol), col(valCol).isNull.as("is_gap"),
        round(
          when(col(valCol).isNotNull, col(valCol))
            .otherwise(col("prev_v") +
              (col("next_v") - col("prev_v")) *
                (datediff(col(dayCol), col("prev_d")).cast("double") /
                  datediff(col("next_d"), col("prev_d")).cast("double"))),
          6).as(s"${valCol}_interp"))
  }

  def q174LinearInterp(spark: SparkSession, dir: String): DataFrame = {
    val daily = t(spark, dir, "orders")
      .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
      .agg(dsum(col("o_totalprice")).as("revenue"))
    linearInterpDaily(daily, "day", "revenue").orderBy("day")
  }

  // ---------------------------------------------------------------- q91
  /** Distribution position of every customer inside its segment:
    * percent_rank + cume_dist over account balance (value-based, so ties
    * are deterministic) — per-partition windows, no global sort. */
  def q91PercentRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal"))
    t(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("c_custkey")
  }

  // ---------------------------------------------------------------- q98
  /** Two-system reconciliation via FULL OUTER join — the audit query every
    * pipeline migration runs: per-key activity from both sides, rows kept
    * even when a key exists in only one system, tagged with presence.
    * Both sides pre-aggregate BEFORE the join (the join then moves
    * |keys| rows, not |facts|) and share the key hash partitioning. */
  def q98FullOuterReconcile(spark: SparkSession, dir: String): DataFrame = {
    val o = t(spark, dir, "orders").groupBy(col("o_custkey").as("key"))
      .agg(count(lit(1)).as("n_orders"))
    val e = t(spark, dir, "events").groupBy(col("user_id").as("key"))
      .agg(count(lit(1)).as("n_events"))
    o.join(e, Seq("key"), "full_outer")
      .select(col("key"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        when(col("n_orders").isNull, "events_only")
          .when(col("n_events").isNull, "orders_only")
          .otherwise("both").as("presence"))
      .orderBy("key")
  }

  // ---------------------------------------------------------------- q99
  /** Dense reporting grid: CROSS JOIN of two small dimensions (regions ×
    * order priorities) left-joined against the fact rollup, zero-filled —
    * so every cell exists even with no data (the report shape BI tools
    * demand). The only cross join in the engine is |dims|×|dims| (25
    * rows); the fact side aggregates before joining and the 4-table
    * dimension chain broadcasts. */
  def q99DenseGrid(spark: SparkSession, dir: String): DataFrame = {
    val regions = t(spark, dir, "region").select(col("r_regionkey"),
      col("r_name"))
    val prios = t(spark, dir, "orders")
      .select(col("o_orderpriority")).distinct()
    val facts = t(spark, dir, "orders")
      .join(t(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(t(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
    regions.crossJoin(prios)
      .join(facts.withColumnRenamed("o_orderpriority", "f_prio"),
        col("r_regionkey") === col("n_regionkey") &&
          col("o_orderpriority") === col("f_prio"),
        "left")
      .select(col("r_name"), col("o_orderpriority"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"))
      .orderBy("r_name", "o_orderpriority")
  }

  // ------------------------------------------------------------ registry
  // --------------------------------------------------------------- q146
  /** Two-sample Kolmogorov–Smirnov drift statistic on BINNED values —
    * the train/serve-skew monitor: D = max |F̂_A(x) − F̂_B(x)| between two
    * arms' empirical CDFs, with the 5% critical value
    * 1.358·√((n_A+n_B)/(n_A·n_B)) alongside and a drift verdict.
    *
    * Exact KS on a continuous column needs the globally sorted ECDF — a
    * full-data sort, the q137 anti-pattern. Binning first (fixed width,
    * `invBinWidth` = 1/width chosen so bin = floor(v·invBinWidth) is the
    * same IEEE multiply+floor in any engine) bounds the ordered frame at
    * |bins| rows: the cumulative window runs on the bin frame, never the
    * data, making the statistic exact FOR THE BINNED distributions (the
    * standard at-scale trade; D on bins ≤ true D, and the bin width
    * bounds the gap). ONE conditional-aggregate pass over the fact
    * table; everything after is |bins|-row math.
    *
    * Cross-engine determinism: bin ids and per-bin counts are integers;
    * the CDF divisions and the max are the same IEEE doubles both sides
    * (max is order-free); the 1.358 constant is CAST to double in the
    * oracle so no decimal-vs-binary folding diverges; outputs round to
    * 6 dp, the verdict compares unrounded bit-equal doubles. */
  def ksDrift(df: DataFrame, valCol: String, groupCol: String,
              armA: String, armB: String,
              invBinWidth: Double = 2.0): DataFrame = {
    val perBin = df.filter(col(groupCol).isin(armA, armB))
      .select(floor(col(valCol).cast("double") * lit(invBinWidth))
        .cast("long").as("bin"), col(groupCol).as("g"))
      .groupBy(col("bin"))
      .agg(count(when(col("g") === armA, 1)).as("cnt_a"),
        count(when(col("g") === armB, 1)).as("cnt_b"))
    // bounded-frame contract: the unpartitioned window orders BINS
    // (value_range·invBinWidth rows), never data rows — the same
    // bounded-distinct contract as q137's rank fold
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perBin
      .withColumn("cum_a", sum(col("cnt_a")).over(w))
      .withColumn("cum_b", sum(col("cnt_b")).over(w))
    val tot = perBin.agg(sum(col("cnt_a")).as("n_a"),
      sum(col("cnt_b")).as("n_b"))
    val agg = cum.crossJoin(broadcast(tot))
      .agg(max(abs(col("cum_a").cast("double") / col("n_a").cast("double") -
          col("cum_b").cast("double") / col("n_b").cast("double")))
          .as("ks_d"),
        max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"))
    val nad = col("n_a").cast("double")
    val nbd = col("n_b").cast("double")
    val crit = lit(1.358) * sqrt((nad + nbd) / (nad * nbd))
    agg.select(col("n_a"), col("n_b"),
      round(col("ks_d"), 6).as("ks_d"),
      round(crit, 6).as("d_crit"),
      (col("ks_d") > crit).as("drifted"))
  }

  /** q146 entry: purchase-vs-view drift on event value (bin width 0.5 —
    * the ×2 multiply is exact in binary, so binning is bit-stable). */
  def q146KsDrift(spark: SparkSession, dir: String): DataFrame =
    ksDrift(t(spark, dir, "events"), "value", "event_type",
      "purchase", "view")

  // --------------------------------------------------------------- q149
  /** Population-stability-index drift per segment: for every group,
    * PSI = Σ_bins (p_g − p_ref)·ln(p_g/p_ref) between the group's
    * binned value distribution and the GLOBAL (all-groups) reference —
    * the monitoring metric risk/data teams read next to [[ksDrift]]
    * (KS gives one worst-bin verdict for two arms; PSI scores every
    * segment against the mix, with the usual 0.1 / 0.25 watch/act
    * thresholds). Empty bins get Laplace smoothing (+½ per bin over the
    * global bin set) so the log never sees zero and the metric stays
    * defined for segments that miss bins entirely.
    *
    * Scale shape: ONE (group, bin) counting pass with map-side combine
    * is the only fact-table work. The reference distribution folds from
    * those partials (never re-scans), the dense group×bin grid is a
    * cross join of two POST-AGGREGATE frames (|groups|·|bins| rows),
    * and global totals broadcast. Per-term doubles round to
    * decimal(28,12) before the per-group sum — q134's KL pattern — so
    * the Σ is order-free and last-ulp ln() differences between engines
    * are absorbed; fixed-width integer bins are bit-stable. */
  def psiDrift(df: DataFrame, valCol: String, groupCol: String,
               binWidth: Double): DataFrame = {
    // scoped persist (q55/q123 pattern, released by the harness's
    // clearCache): the one fact-table pass materializes the tiny
    // (group, bin) frame once; the three derivations below re-read the
    // cached partials instead of re-scanning the corpus
    val counts = df.select(col(groupCol).as("g"),
        floor(col(valCol).cast("double") / lit(binWidth))
          .cast("long").as("bin"))
      .groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("c"))
      .persist()
    val perGroup = counts.groupBy(col("g")).agg(sum(col("c")).as("n_g"))
    val perBin = counts.groupBy(col("bin")).agg(sum(col("c")).as("c_ref"))
    val tot = perBin.agg(sum(col("c_ref")).as("n_all"),
      count(lit(1)).as("n_bins"))
    val grid = perGroup.crossJoin(perBin)
      .join(counts, Seq("g", "bin"), "left")
      .na.fill(0L, Seq("c"))
      .crossJoin(broadcast(tot))
    val half = lit(0.5)
    val smoothB = half * col("n_bins").cast("double")
    val pG = (col("c").cast("double") + half) /
      (col("n_g").cast("double") + smoothB)
    val pRef = (col("c_ref").cast("double") + half) /
      (col("n_all").cast("double") + smoothB)
    grid.select(col("g"), col("n_g"),
        ((pG - pRef) * log(pG / pRef)).cast("decimal(28,12)").as("term"))
      .groupBy(col("g"), col("n_g"))
      .agg(round(sum(col("term")).cast("double"), 6).as("psi"))
      .withColumn("verdict",
        when(col("psi") >= 0.25, "act")
          .when(col("psi") >= 0.1, "watch").otherwise("stable"))
  }

  /** q149 entry: per-source length-distribution drift vs the corpus mix
    * (64-char bins over `n_chars`). */
  def q149PsiDrift(spark: SparkSession, dir: String): DataFrame =
    psiDrift(t(spark, dir, "documents"), "n_chars", "source", 64.0)
      .withColumnRenamed("g", "source")
      .orderBy("source")

  // --------------------------------------------------------------- q158
  /** Per-segment quantile normalization: remap every value onto the
    * GLOBAL distribution so that a value at its segment's p-th
    * percentile becomes the global p-th-percentile value — the
    * calibration step that makes quality scores comparable across
    * domains whose raw scales differ (each source's scorer drifts; its
    * RANK within the source is the trustworthy signal).
    *
    * Exact per-rank normalization needs a per-segment sort of the fact
    * table. Binning first (the q146/q149 contract) bounds every ordered
    * frame at the post-aggregate (segment, bin) grid: within-segment
    * cumulative shares ride a window over |segments|·|bins| rows, the
    * mapping "smallest global bin whose cumulative share covers mine"
    * is a non-equi join of two POST-AGGREGATE frames, and the per-row
    * remap is a broadcast (segment, bin)→target probe into the scan.
    * Shares are int/int divisions — identical IEEE doubles both sides —
    * and the normalized value is the target bin's inclusive upper edge
    * ((bin+1)·width−1, integer). */
  def quantileNormalize(df: DataFrame, valCol: String, groupCol: String,
                        binWidth: Long): DataFrame = {
    val binned = df.select(col(groupCol).as("g"), col(valCol).as("v"))
      .withColumn("bin", floor(col("v").cast("double") /
        lit(binWidth.toDouble)).cast("long"))
    val counts = binned.groupBy(col("g"), col("bin"))
      .agg(count(lit(1)).as("c")).persist()
    val wSrc = Window.partitionBy(col("g")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val nSrc = Window.partitionBy(col("g"))
    val srcShare = counts
      .withColumn("share",
        sum(col("c")).over(wSrc).cast("double") /
          sum(col("c")).over(nSrc).cast("double"))
    val gl = counts.groupBy(col("bin")).agg(sum(col("c")).as("cg"))
    val wG = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gShare = gl
      .withColumn("gshare", sum(col("cg")).over(wG).cast("double") /
        sum(col("cg")).over(Window.partitionBy()).cast("double"))
      .select(col("bin").as("gbin"), col("gshare"))
    // smallest global bin covering the segment share — a non-equi join
    // of two post-aggregate frames (|segments|·|bins| × |bins|)
    val mapped = srcShare.join(gShare, col("gshare") >= col("share"))
      .groupBy(col("g"), col("bin"))
      .agg(min(col("gbin")).as("target_bin"))
    binned.join(broadcast(mapped), Seq("g", "bin"))
      .select(col("g"), col("v"),
        ((col("target_bin") + 1) * binWidth - 1).as("norm_v"))
  }

  /** q158 entry: source-calibrated document lengths (16-char bins),
    * aggregated per (source, raw bin edge) for a deterministic frame. */
  def q158QuantileNormalize(spark: SparkSession, dir: String): DataFrame =
    quantileNormalize(t(spark, dir, "documents")
        .select(col("source"), col("n_chars")), "n_chars", "source", 16L)
      .groupBy(col("g").as("source"), col("norm_v"))
      .agg(count(lit(1)).as("n"), min(col("v")).as("raw_lo"),
        max(col("v")).as("raw_hi"))
      .orderBy("source", "norm_v")

  // --------------------------------------------------------------- q163
  /** EXACT distributed quantile without a global sort — the two-pass
    * selection a 100 TB engine uses when "approx_percentile is not
    * admissible" (billing, SLAs, regulatory p99s): pass 1 bins values
    * and counts (map-side combine; the cumulative window runs over the
    * |bins|-row frame), the covering bin and the rank offset inside it
    * fall out arithmetically, and pass 2 ranks ONLY that bin's rows —
    * 1/|bins| of the data, and shrinking as bins refine — to pick the
    * k-th smallest. Rank semantics: k = max(1, ceil(q·n)), the
    * ORDER BY/OFFSET definition, duplicate-safe.
    *
    * The one unpartitioned window orders the single covering bin's rows
    * — the documented bounded-frame contract (q146/q151), with the bin
    * width as the knob. */
  def exactQuantile(df: DataFrame, valCol: String, q: Double,
                    binWidth: Double): DataFrame = {
    val binned = df.select(col(valCol).cast("double").as("v"))
      .withColumn("bin", floor(col("v") / lit(binWidth)).cast("long"))
    val counts = binned.groupBy(col("bin")).agg(count(lit(1)).as("c"))
      .persist()
    val wBins = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts.agg(sum(col("c")).as("n"))
      .withColumn("k",
        greatest(lit(1L), ceil(lit(q) * col("n").cast("double"))
          .cast("long")))
    val target = counts.withColumn("cum", sum(col("c")).over(wBins))
      .crossJoin(broadcast(tot))
      .filter(col("cum") >= col("k"))
      .orderBy(col("bin")).limit(1)
      .select(col("bin").as("tbin"), (col("cum") - col("c")).as("before"),
        col("n"), col("k"))
    val wIn = Window.orderBy(col("v"))
    binned.join(broadcast(target), col("bin") === col("tbin"))
      .withColumn("rn", row_number().over(wIn).cast("long"))
      .filter(col("rn") === col("k") - col("before"))
      .select(col("n"), col("k"), col("v").as("value"))
  }

  /** q163 entry: exact median of l_extendedprice (unit-width bins). */
  def q163ExactMedian(spark: SparkSession, dir: String): DataFrame =
    exactQuantile(t(spark, dir, "lineitem").select(col("l_extendedprice")),
      "l_extendedprice", 0.5, 100.0)

  // --------------------------------------------------------------- q188
  /** EXACT WEIGHTED quantile — q163's two-pass selection generalized to
    * per-row weights: the weighted p-quantile is the smallest value
    * whose cumulative weight reaches k = max(1, ⌈p·W⌉). What
    * approx_percentile's accuracy argument can't give you when rows
    * aren't equal (a median price weighted by units sold; a latency
    * percentile weighted by request volume).
    *
    * Same scale shape as q163: pass 1 bins WEIGHT MASS per bin
    * (map-side combine; cumulative window over the |bins|-row frame),
    * the covering bin falls out arithmetically, pass 2 runs the
    * cumulative weight over ONLY that bin's rows. Weights are integer;
    * the threshold is the only double op and is mirrored in the oracle.
    * Zero/negative weights are dropped on entry (both sides), so a
    * massless row can never become the reported value. */
  def weightedQuantile(df: DataFrame, valCol: String, wCol: String,
                       q: Double, binWidth: Double): DataFrame = {
    val base = df
      .select(col(valCol).cast("double").as("v"),
        col(wCol).cast("long").as("w"))
      .filter(col("w") > 0)
    val binned = base.withColumn("bin",
      floor(col("v") / lit(binWidth)).cast("long"))
    val counts = binned.groupBy(col("bin")).agg(sum(col("w")).as("c"))
      .persist()
    val wBins = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = counts.agg(sum(col("c")).as("wtot"))
      .withColumn("k",
        greatest(lit(1L), ceil(lit(q) * col("wtot").cast("double"))
          .cast("long")))
    val target = counts.withColumn("cum", sum(col("c")).over(wBins))
      .crossJoin(broadcast(tot))
      .filter(col("cum") >= col("k"))
      .orderBy(col("bin")).limit(1)
      .select(col("bin").as("tbin"), (col("cum") - col("c")).as("before"),
        col("wtot"), col("k"))
    val wIn = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    binned.join(broadcast(target), col("bin") === col("tbin"))
      .withColumn("cw", sum(col("w")).over(wIn))
      .filter(col("before") + col("cw") >= col("k"))
      .orderBy(col("v")).limit(1)
      .select(col("wtot"), col("k"), col("v").as("value"))
  }

  /** q188 entry: median sale price weighted by units sold — "the price
    * at which the median UNIT ships", not the median line. */
  def q188WeightedMedian(spark: SparkSession, dir: String): DataFrame =
    weightedQuantile(
      t(spark, dir, "lineitem").select(col("l_extendedprice"),
        col("l_quantity")),
      "l_extendedprice", "l_quantity", 0.5, 100.0)

  // --------------------------------------------------------------- q180
  /** Poisson bootstrap confidence interval for a mean — the distributed
    * bootstrap: instead of resampling n rows with replacement (which
    * needs global coordination), every row independently draws a
    * Poisson(1) weight per replicate, which converges to the same
    * resampling distribution (the classic bag-of-little-bootstraps /
    * streaming-bootstrap trick). Reported: the full-sample mean and the
    * rank-based 95% band (3rd / 98th order statistics of 100 replicate
    * means).
    *
    * Determinism: the weight is the Poisson(1) inverse CDF evaluated on
    * a seeded md5 uniform — the CDF steps are LITERAL double constants
    * (e^{-1}·Σ 1/k!), so the draw is a pure comparison ladder both
    * engines compute identically; weights ≥7 (mass 8e-5) truncate, a
    * standard bounded-weight bootstrap. Replicate means divide a decimal
    * weighted sum by an integer weight total — no FP accumulation-order
    * drift; order statistics come from one array_sort, no interpolation.
    *
    * Scale shape: one projection-side explode (×R rows, the declared
    * cost of R replicates — weights never materialize per-row state),
    * then a hash aggregate onto R groups with map-side combine: the
    * shuffle carries R partial rows per task regardless of input size.
    * The R-length mean array lives in ONE final 1-row aggregate. */
  def bootstrapCi(df: DataFrame, valCol: Column, idCol: Column,
                  reps: Int = 100): DataFrame = {
    require(reps % 4 == 0, "reps must pack into 4-lane md5 digests")
    // P(Poisson(1) <= k) for k = 0..5, as exact literals
    val cdf = Seq(0.36787944117144233, 0.7357588823428847,
      0.9196986029286058, 0.9810118431238463, 0.9963401531726563,
      0.9994058151824183)
    // one md5 digest per (row, 4 replicates): the 32 hex chars split
    // into four independent 32-bit uniforms (lanes), so the digest
    // count is reps/4 per row — the md5 is the dominant per-row cost
    // and a one-digest-per-replicate draw measured 4-5x slower
    val u = (conv(expr("substring(hx, 1 + 8 * lane, 8)"), 16, 10)
      .cast("double") + 0.5) / 4294967296.0
    val w = cdf.map(c => when(u >= c, 1).otherwise(0))
      .reduce(_ + _).cast("long")
    val loK = math.max(1, math.ceil(0.025 * reps).toInt)    // 3 of 100
    val hiK = math.min(reps, math.ceil(0.975 * reps).toInt) // 98 of 100
    // the explode multiplies rows x reps/4: if the input arrives in
    // fewer partitions than cores (one small parquet file), the whole
    // replicate pipeline would run inside those few tasks — spread the
    // SLIM (id, v) base first (measured 10x on a single-file input; a
    // wide input at scale already exceeds defaultParallelism and skips
    // the shuffle entirely)
    val slim = df.select(idCol.as("id"), valCol.as("v"))
    val par = df.sparkSession.sparkContext.defaultParallelism
    val base = if (slim.rdd.getNumPartitions < par)
      slim.repartition(par) else slim
    val means = base
      .select(col("id"), col("v"),
        explode(sequence(lit(0), lit(reps / 4 - 1))).as("b"))
      .withColumn("hx", md5(concat_ws(":", lit("bs"),
        col("id").cast("string"), col("b").cast("string"))))
      .select(col("v"), col("b"),
        explode(sequence(lit(0), lit(3))).as("lane"), col("hx"))
      // integer CENTS keep the weighted sum exact in plain 64-bit
      // arithmetic (a decimal(38,4) product here runs on BigDecimal and
      // measured 3x slower over the xR exploded frame); exact while
      // sum(w x cents) < 2^63 — ~9e16 dollars of replicate mass
      .select((col("b") * 4 + col("lane")).as("r"),
        (w * round(col("v") * 100).cast("long")).as("wc"), w.as("w"))
      .groupBy(col("r"))
      // guard the divide: a replicate with zero total weight has no mean
      // (NULL here; under ANSI the raw divide would throw a generic
      // DIVIDE_BY_ZERO) — the size assert below turns it into a specific
      // failure instead of a silent order-statistic shift
      .agg(when(sum(col("w")) > 0,
        round(sum(col("wc")).cast("double") / sum(col("w")) / 100.0, 6))
        .as("mean_r"))
    val full = df.agg(round(davg(valCol), 6).as("full_mean"))
    // a replicate whose total Poisson weight is 0 (P = e^{-n}, only
    // reachable on tiny inputs) has NULL mean_r, and collect_list drops
    // NULLs SILENTLY — the order statistics would then index a shorter
    // array and return shifted CI bounds. Fail loudly instead: the
    // element_at index only resolves once assert_true vouches that all
    // `reps` replicate means survived.
    def checkedIdx(k: Int) = when(
      assert_true(size(col("ms")) === reps,
        lit(s"bootstrapCi: a zero-weight replicate produced a NULL " +
          s"mean (input too small for a Poisson bootstrap of $reps " +
          "replicates)")).isNull, lit(k))
    means
      .agg(array_sort(collect_list(col("mean_r"))).as("ms"))
      .crossJoin(broadcast(full))
      .select(lit(reps.toLong).as("n_replicates"), col("full_mean"),
        element_at(col("ms"), checkedIdx(loK)).as("ci_lo"),
        element_at(col("ms"), checkedIdx(hiK)).as("ci_hi"))
  }

  /** q180 entry: bootstrap 95% CI for the mean order price. */
  def q180BootstrapCi(spark: SparkSession, dir: String): DataFrame =
    bootstrapCi(t(spark, dir, "orders"), col("o_totalprice"),
      col("o_orderkey"))

  // --------------------------------------------------------------- q184
  /** EXACT per-group Gini coefficient without ranking individual rows.
    * The rank-weighted sum Σᵢ Rᵢ·xᵢ that Gini needs collapses onto the
    * DISTINCT-VALUE frame: every tie block shares one x, so its rank sum
    * is c·C_prev + c(c+1)/2 regardless of tie order. The engine therefore
    * aggregates members to integer cents, groups BY VALUE, and runs the
    * cumulative window over the (group, distinct-cents) frame — whose
    * size is bounded by the value DOMAIN (cents of a bounded price
    * range), not by the member count. At 100 TB the per-group window
    * frame stays domain-sized while the member frame grows 1000×; no
    * per-member ranking, sort, or ntile anywhere.
    *
    * Determinism: everything is integer (cents, counts, rank sums) up to
    * decimal(38,0) products; Gini = (2·Σx·S − (n+1)·T) / (n·T) is ONE
    * double divide at the end, mirrored operand for operand.
    *
    * Gini here is the standard relative mean-difference form over
    * per-customer lifetime revenue, grouped by nation. */
  def giniByGroup(members: DataFrame, groupCol: String,
                  centsCol: String): DataFrame = {
    val byValue = members
      .groupBy(col(groupCol), col(centsCol).as("cents"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col(groupCol)).orderBy(col("cents"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byValue
      .withColumn("cprev", sum(col("c")).over(w) - col("c"))
      .select(col(groupCol), col("cents"), col("c"),
        // integer div: c·(c+1) is always even, so `div` is exact
        expr("c * cprev + c * (c + 1) div 2").as("s"))
      .groupBy(col(groupCol))
      .agg(sum(col("c")).as("n"),
        sum(col("cents") * col("c").cast("decimal(38,0)")).as("t"),
        sum(col("cents") * col("s").cast("decimal(38,0)")).as("xs"))
      .select(col(groupCol), col("n"),
        round(col("t").cast("double") / 100.0, 2).as("total_value"),
        round(
          (lit(2) * col("xs") - (col("n") + 1) * col("t")).cast("double") /
            (col("n").cast("decimal(38,0)") * col("t")).cast("double"),
          6).as("gini"))
      .orderBy(groupCol)
  }

  /** q184 entry: revenue-concentration Gini per nation over per-customer
    * lifetime order revenue. */
  def q184GiniRevenue(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .join(t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("cents"))
    giniByGroup(cust, "nation", "cents")
  }

  // --------------------------------------------------------------- q185
  /** Lag-k autocorrelation (ACF) of a daily revenue series, k = 1..7 —
    * the first diagnostic anyone runs on a business time series (weekly
    * seasonality shows up as a k=7 spike).
    *
    * Scale shape: the fact table collapses to the |days|-row daily frame
    * first (one hash aggregate, map-side combined); the lag window and
    * the per-k Pearson aggregates all ride that bounded frame (a date
    * span is a domain, not a data volume — q174's documented contract).
    * One unpartitioned window over ≤ thousands of rows, then a 7-group
    * aggregate.
    *
    * Determinism: daily values are integer cents; all Pearson moments
    * are exact decimal sums; the two sqrt's and the final divide run in
    * doubles identically in both engines (IEEE sqrt is correctly
    * rounded). */
  def dailyAcf(orders: DataFrame, maxLag: Int = 7): DataFrame = {
    val daily = orders
      .groupBy(col("o_orderdate").as("day"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("x"))
    val w = Window.orderBy(col("day"))
    val lagged = daily.select(col("x") +:
      (1 to maxLag).map(k => lag(col("x"), k).over(w).as(s"l$k")): _*)
    val pairs = lagged
      .select(col("x"), posexplode(
        array((1 to maxLag).map(k => col(s"l$k")): _*)))
      .select((col("pos") + 1).as("k"), col("x"), col("col").as("y"))
      .filter(col("y").isNotNull)
    // cast BEFORE the product: daily-cents squares overflow a long past
    // ~sf0.3; decimal(38,0) x long products stay exact
    def d(c: Column) = sum(c)
    def dd(c: Column) = c.cast("decimal(38,0)")
    pairs
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_pairs"),
        d(dd(col("x"))).as("sx"), d(dd(col("y"))).as("sy"),
        d(dd(col("x")) * col("y")).as("sxy"),
        d(dd(col("x")) * col("x")).as("sxx"),
        d(dd(col("y")) * col("y")).as("syy"))
      .select(col("k").cast("long").as("k"), col("n_pairs"),
        round(
          (col("n_pairs") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (sqrt((col("n_pairs") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
              sqrt((col("n_pairs") * col("syy") - col("sy") * col("sy"))
                .cast("double"))), 6).as("acf"))
      .orderBy("k")
  }

  def q185DailyAcf(spark: SparkSession, dir: String): DataFrame =
    dailyAcf(t(spark, dir, "orders"))

  // --------------------------------------------------------------- q192
  /** Lead–lag cross-correlation between two daily series: corr(x_t,
    * y_{t+lag}) for lag = 0..maxLag — the diagnostic that finds HOW LONG
    * one process trails another (here: revenue booked by order date vs
    * revenue recognized by ship date; the argmax lag is the typical
    * fulfillment delay, read straight off the curve).
    *
    * Scale shape: both facts collapse to their |days|-row daily frames
    * first; the lag alignment is an equi-join of the ×|lags| exploded
    * driver frame against the second day frame — tens of thousands of
    * rows however big the facts are. Pearson per lag from exact decimal
    * moments (q185's recipe, cast-before-multiply). */
  def dailyXcorr(driver: DataFrame, dayColX: Column, valX: Column,
                 follower: DataFrame, dayColY: Column, valY: Column,
                 maxLag: Int = 14): DataFrame = {
    def daily(df: DataFrame, d: Column, v: Column, out: String) =
      df.groupBy(d.cast("date").as("day"))
        .agg(sum(round(v * 100).cast("long")).as(out))
    val dx = daily(driver, dayColX, valX, "x")
    val dy = daily(follower, dayColY, valY, "y")
    val pairs = dx
      .select(col("day"), col("x"),
        explode(sequence(lit(0), lit(maxLag))).as("lag"))
      .join(dy.select(col("day").as("yday"), col("y")),
        expr("date_add(day, lag) = yday"))
    def dd(c: Column) = c.cast("decimal(38,0)")
    pairs
      .groupBy(col("lag"))
      .agg(count(lit(1)).as("n_days"),
        sum(dd(col("x"))).as("sx"), sum(dd(col("y"))).as("sy"),
        sum(dd(col("x")) * col("y")).as("sxy"),
        sum(dd(col("x")) * col("x")).as("sxx"),
        sum(dd(col("y")) * col("y")).as("syy"))
      .select(col("lag").cast("long").as("lag"), col("n_days"),
        round(
          (col("n_days") * col("sxy") - col("sx") * col("sy"))
            .cast("double") /
            (sqrt((col("n_days") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
              sqrt((col("n_days") * col("syy") - col("sy") * col("sy"))
                .cast("double"))), 6).as("xcorr"))
      .orderBy("lag")
  }

  // --------------------------------------------------------------- q194
  /** CUPED variance-reduced experiment readout (Deng et al., WSDM'13):
    * the adjusted metric ȳ_arm − θ·(x̄_arm − x̄) removes the part of the
    * outcome the PRE-experiment covariate already predicted, shrinking
    * the A/B confidence interval by 1−ρ² with zero bias (assignment is
    * independent of the pre-period). The standard trick that cuts
    * experiment runtimes in half; θ = cov(x,y)/var(x) is fit on the
    * pooled population.
    *
    * Scale shape: one pass collapses the fact to per-subject (pre, post)
    * cents; the pooled moments are ONE tiny aggregate broadcast back
    * into the 2-row per-arm frame. Nothing beyond the subject aggregate
    * ever shuffles.
    *
    * Determinism: all moments are exact decimal sums of integer cents
    * (cast-before-multiply); θ, ρ² and each adjusted mean are fixed-
    * order double arithmetic mirrored in the oracle. */
  def cupedReadout(orders: DataFrame, cutoff: String): DataFrame = {
    val cut = lit(cutoff).cast("timestamp_ntz")
    val subj = orders
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(col("o_orderdate") < cut,
          round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
          .as("x"),
        sum(when(col("o_orderdate") >= cut,
          round(col("o_totalprice") * 100).cast("long")).otherwise(0L))
          .as("y"))
      .withColumn("arm",
        when(substring(md5(concat(lit("ab:"),
          col("o_custkey").cast("string"))), 1, 8) < lit("80000000"),
          "treatment").otherwise("control"))
    def dd(c: Column) = c.cast("decimal(38,0)")
    // ONE fact pass: per-arm sufficient moments; the pooled moments are
    // the 2-row sums (decimal addition is associative, so this is
    // bit-identical to aggregating the population directly)
    val armMoments = subj.groupBy(col("arm"))
      .agg(count(lit(1)).as("n"),
        sum(dd(col("x"))).as("sx"), sum(dd(col("y"))).as("sy"),
        sum(dd(col("x")) * col("y")).as("sxy"),
        sum(dd(col("x")) * col("x")).as("sxx"),
        sum(dd(col("y")) * col("y")).as("syy"))
      .persist()
    val pooled = armMoments.agg(
      sum(col("n")).as("n"),
      sum(col("sx")).as("sx"), sum(col("sy")).as("sy"),
      sum(col("sxy")).as("sxy"), sum(col("sxx")).as("sxx"),
      sum(col("syy")).as("syy"))
      .select(
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("theta"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") *
          (col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          ((col("n") * col("sxx") - col("sx") * col("sx")).cast("double") *
            (col("n") * col("syy") - col("sy") * col("sy"))
              .cast("double"))).as("rho2"),
        (col("sx").cast("double") / col("n")).as("xbar_all"))
    armMoments.select(col("arm"), col("n"), col("sx"), col("sy"))
      .crossJoin(broadcast(pooled))
      .select(col("arm"), col("n"),
        round(col("sx").cast("double") / col("n") / 100.0, 6)
          .as("mean_pre"),
        round(col("sy").cast("double") / col("n") / 100.0, 6)
          .as("mean_post"),
        round((col("sy").cast("double") / col("n") -
          col("theta") * (col("sx").cast("double") / col("n") -
            col("xbar_all"))) / 100.0, 6).as("mean_adjusted"),
        round(col("theta"), 6).as("theta"),
        round(col("rho2"), 6).as("var_reduction"))
      .orderBy("arm")
  }

  /** q194 entry: pre-period before 1996, outcome after; hash-split
    * arms. */
  def q194CupedReadout(spark: SparkSession, dir: String): DataFrame =
    cupedReadout(t(spark, dir, "orders"), "1996-01-01 00:00:00")

  // --------------------------------------------------------------- q198
  /** Classical seasonal index via ratio-to-centered-moving-average: each
    * calendar month's index is the average of (month revenue / centered
    * 12-month moving average) across years — the multiplicative
    * decomposition every demand-planning forecast starts from (index
    * 1.1 = "this month runs 10% hot after detrending"). q113 reads
    * day-of-week seasonality off raw means; this one removes TREND
    * first, which is what makes indices comparable across a growing
    * business.
    *
    * Scale shape: the fact collapses to the |months|-row series (one
    * hash aggregate); the centered MA is one window over that bounded
    * frame (a calendar is a domain, not a data volume — q174's
    * contract), and the per-month average is a 12-row aggregate.
    *
    * Determinism: monthly cents are exact; the centered MA is the
    * standard 2×12 form — (half the 6-back + full 5-back..5-fwd + half
    * the 6-fwd)/12 — computed over exact integer window sums, one
    * double ratio per month, ratios rounded to 6dp before the decimal
    * mean (q186's order-independence recipe). */
  def seasonalIndex(orders: DataFrame): DataFrame = {
    val monthly = orders
      .groupBy(trunc(col("o_orderdate"), "month").as("m"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
    val w = Window.orderBy(col("m"))
    def lagN(n: Int) = lag(col("cents"), n).over(w)
    def leadN(n: Int) = lead(col("cents"), n).over(w)
    // 2x12 centered MA: needs all 13 neighbors present (interior months)
    val inner = (-5 to 5).map(i =>
      if (i < 0) lagN(-i) else if (i > 0) leadN(i) else col("cents"))
      .reduce(_ + _)
    val ma2x12 = (lagN(6) + leadN(6) + inner * 2).cast("double") / 24.0
    monthly
      .withColumn("ma", ma2x12)
      .filter(col("ma").isNotNull)
      .select(month(col("m")).as("month"),
        round(col("cents") / col("ma"), 6).as("ratio"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_years"),
        // exact decimal sum / count, NOT avg(): DuckDB's AVG returns a
        // float accumulation, which is order-dependent
        round(sum(col("ratio").cast("decimal(18,6)")).cast("double") /
          count(lit(1)), 6).as("seasonal_index"))
      .select(col("month").cast("long").as("month"), col("n_years"),
        col("seasonal_index"))
      .orderBy("month")
  }

  def q198SeasonalIndex(spark: SparkSession, dir: String): DataFrame =
    seasonalIndex(t(spark, dir, "orders"))

  /** q192 entry: order-date revenue leading ship-date revenue. */
  def q192ShipLagXcorr(spark: SparkSession, dir: String): DataFrame =
    dailyXcorr(
      t(spark, dir, "orders"), col("o_orderdate"), col("o_totalprice"),
      t(spark, dir, "lineitem"), col("l_shipdate"), col("l_extendedprice"))

  // --------------------------------------------------------------- q186
  /** Theil-T inequality decomposition — q184's Gini tells you HOW unequal
    * revenue is; Theil tells you WHERE the inequality lives, because it
    * decomposes additively: total = Σ_g share_g·T_g (within groups)
    * + Σ_g share_g·ln(μ_g/μ) (between groups) — the property Gini lacks.
    * Output: per group, its member count, revenue share, internal Theil
    * T_g, and its within/between contributions to the corpus total.
    *
    * Scale shape: ONE pass over the member frame collects the three
    * sufficient moments (n_g, Σx, Σ x·lnx) per group; the global moments
    * are a second aggregate over the |groups|-row frame, broadcast back.
    * No window, no ranking, no second fact scan.
    *
    * Determinism: x·ln(x) terms are rounded to 6dp and summed as
    * decimal(38,6) — the float sum would be ORDER-dependent across
    * partitions, the rounded-then-decimal sum is not (q171's recipe).
    * All downstream arithmetic runs on those exact sums in a fixed
    * operand order. */
  def theilDecomposition(members: DataFrame, groupCol: String,
                         centsCol: String): DataFrame = {
    val g = members
      .filter(col(centsCol) > 0)
      .select(col(groupCol), col(centsCol).as("cents"),
        round(col(centsCol).cast("double") *
          log(col(centsCol).cast("double")), 6).as("xlx"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast("decimal(38,0)")).as("sx"),
        sum(col("xlx").cast("decimal(38,6)")).as("sl"))
    val tot = g.agg(sum(col("n")).as("tn"),
      sum(col("sx")).as("ts"), sum(col("sl")).as("tl"))
    g.crossJoin(broadcast(tot))
      .select(col(groupCol), col("n"),
        (col("sx").cast("double") / col("n")).as("mu_g"),
        (col("ts").cast("double") / col("tn")).as("mu"),
        (col("sx").cast("double") / col("ts").cast("double"))
          .as("share"),
        (col("sl").cast("double") / col("sx").cast("double")).as("lbar"))
      .select(col(groupCol), col("n"),
        round(col("share"), 6).as("revenue_share"),
        round(col("lbar") - log(col("mu_g")), 6).as("theil_g"),
        round(col("share") * (col("lbar") - log(col("mu_g"))), 6)
          .as("within_contrib"),
        round(col("share") * log(col("mu_g") / col("mu")), 6)
          .as("between_contrib"))
      .orderBy(groupCol)
  }

  /** q186 entry: within/between-nation decomposition of customer revenue
    * inequality — the companion readout to q184's per-nation Gini. */
  def q186TheilDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val cust = t(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("cents"))
      .join(t(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(t(spark, dir, "nation")
        .select(col("n_nationkey"), col("n_name"))),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"), col("cents"))
    theilDecomposition(cust, "nation", "cents")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q184_gini_revenue" -> q184GiniRevenue _,
    "q185_daily_acf" -> q185DailyAcf _,
    "q186_theil_decomposition" -> q186TheilDecomposition _,
    "q188_weighted_median" -> q188WeightedMedian _,
    "q192_ship_lag_xcorr" -> q192ShipLagXcorr _,
    "q194_cuped_readout" -> q194CupedReadout _,
    "q198_seasonal_index" -> q198SeasonalIndex _,
    "q180_bootstrap_ci" -> q180BootstrapCi _,
    "q163_exact_median" -> q163ExactMedian _,
    "q146_ks_drift" -> q146KsDrift _,
    "q149_psi_drift" -> q149PsiDrift _,
    "q158_quantile_normalize" -> q158QuantileNormalize _,
    "q82_unpivot_metrics" -> q82UnpivotMetrics _,
    "q83_correlation_matrix" -> q83CorrelationMatrix _,
    "q132_group_regression" -> q132GroupRegression _,
    "q133_chi_square" -> q133ChiSquare _,
    "q136_welch_ttest" -> q136WelchTtest _,
    "q137_mann_whitney" -> q137MannWhitney _,
    "q138_two_proportion_z" -> q138TwoProportionZ _,
    "q84_median_mode" -> q84MedianMode _,
    "q85_char_entropy" -> q85CharEntropy _,
    "q86_group_argmax" -> q86GroupArgmax _,
    "q87_merge_upsert" -> q87MergeUpsert _,
    "q88_decayed_revenue" -> q88DecayedRevenue _,
    "q89_embedding_stats" -> q89EmbeddingStats _,
    "q90_date_spine_gapfill" -> q90DateSpineGapfill _,
    "q91_percent_rank" -> q91PercentRank _,
    "q94_recursive_hierarchy" -> q94RecursiveHierarchy _,
    "q95_locf_gapfill" -> q95LocfGapfill _,
    "q174_linear_interp" -> q174LinearInterp _,
    "q98_full_outer_reconcile" -> q98FullOuterReconcile _,
    "q99_dense_grid" -> q99DenseGrid _)

  val oracle: Map[String, String] = Map(
    // q184: the rank-weighted sum collapses onto the distinct-cents
    // frame exactly as the engine computes it; integers end-to-end, one
    // double divide last.
    "q184_gini_revenue" ->
      """WITH cust AS (
        |  SELECT n_name AS nation, cents
        |  FROM (
        |    SELECT o_custkey,
        |           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |    FROM orders GROUP BY o_custkey) o
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |byv AS (
        |  SELECT nation, cents, COUNT(*) AS c FROM cust GROUP BY 1, 2),
        |rk AS (
        |  SELECT nation, cents, c,
        |         SUM(c) OVER (PARTITION BY nation ORDER BY cents
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c
        |           AS cprev
        |  FROM byv),
        |s AS (
        |  SELECT nation, SUM(c) AS n,
        |         SUM(cents * CAST(c AS DECIMAL(38,0))) AS t,
        |         SUM(cents * CAST(c * cprev + c * (c + 1) // 2
        |                          AS DECIMAL(38,0))) AS xs
        |  FROM rk GROUP BY 1)
        |SELECT nation, CAST(n AS BIGINT) AS n,
        |       round(CAST(t AS DOUBLE) / 100.0, 2) AS total_value,
        |       round(CAST(2 * xs - (n + 1) * t AS DOUBLE) /
        |             CAST(CAST(n AS DECIMAL(38,0)) * t AS DOUBLE), 6)
        |         AS gini
        |FROM s ORDER BY nation""".stripMargin,
    // q185: exact decimal Pearson moments over the daily cents frame;
    // sqrt and the last divide in doubles, same operand order.
    "q185_daily_acf" ->
      """WITH daily AS (
        |  SELECT o_orderdate AS day,
        |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
        |  FROM orders GROUP BY 1),
        |lagged AS (
        |  SELECT x,
        |         [lag(x, 1) OVER w, lag(x, 2) OVER w, lag(x, 3) OVER w,
        |          lag(x, 4) OVER w, lag(x, 5) OVER w, lag(x, 6) OVER w,
        |          lag(x, 7) OVER w] AS ls
        |  FROM daily WINDOW w AS (ORDER BY day)),
        |pairs AS (
        |  SELECT u.k, x, ls[u.k] AS y
        |  FROM lagged, (SELECT unnest(range(1, 8)) AS k) u
        |  WHERE ls[u.k] IS NOT NULL),
        |m AS (
        |  SELECT k, COUNT(*) AS n_pairs,
        |         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
        |         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
        |         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
        |         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
        |         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
        |  FROM pairs GROUP BY k)
        |SELECT CAST(k AS BIGINT) AS k, n_pairs,
        |       round(CAST(n_pairs * sxy - sx * sy AS DOUBLE) /
        |             (sqrt(CAST(n_pairs * sxx - sx * sx AS DOUBLE)) *
        |              sqrt(CAST(n_pairs * syy - sy * sy AS DOUBLE))), 6)
        |         AS acf
        |FROM m ORDER BY k""".stripMargin,
    // q198: explicit lag/lead neighbors (NULL kills edge months exactly
    // as in the engine); integer window sums, one double ratio, 6dp
    // rounding before the exact-decimal mean.
    "q198_seasonal_index" ->
      """WITH monthly AS (
        |  SELECT date_trunc('month', o_orderdate) AS m,
        |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |  FROM orders GROUP BY 1),
        |wv AS (
        |  SELECT m, cents,
        |    lag(cents, 6) OVER w + lead(cents, 6) OVER w +
        |    (cents + lag(cents, 1) OVER w + lag(cents, 2) OVER w +
        |     lag(cents, 3) OVER w + lag(cents, 4) OVER w +
        |     lag(cents, 5) OVER w + lead(cents, 1) OVER w +
        |     lead(cents, 2) OVER w + lead(cents, 3) OVER w +
        |     lead(cents, 4) OVER w + lead(cents, 5) OVER w) * 2 AS s24
        |  FROM monthly WINDOW w AS (ORDER BY m)),
        |r AS (
        |  SELECT month(m) AS month,
        |         round(cents / (CAST(s24 AS DOUBLE) / 24.0), 6) AS ratio
        |  FROM wv WHERE s24 IS NOT NULL)
        |SELECT CAST(month AS BIGINT) AS month, COUNT(*) AS n_years,
        |       round(CAST(SUM(CAST(ratio AS DECIMAL(18,6))) AS DOUBLE)
        |             / COUNT(*), 6) AS seasonal_index
        |FROM r GROUP BY 1 ORDER BY month""".stripMargin,
    // q194: integer-cents moments, cast-before-multiply; theta / rho2 /
    // adjusted means replicated in the engine's operand order.
    "q194_cuped_readout" ->
      """WITH subj AS (
        |  SELECT o_custkey,
        |    SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
        |        THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |        ELSE 0 END) AS x,
        |    SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
        |        THEN CAST(round(o_totalprice * 100) AS BIGINT)
        |        ELSE 0 END) AS y,
        |    CASE WHEN substr(md5(concat('ab:',
        |          CAST(o_custkey AS VARCHAR))), 1, 8) < '80000000'
        |      THEN 'treatment' ELSE 'control' END AS arm
        |  FROM orders GROUP BY o_custkey),
        |pooled AS (
        |  SELECT COUNT(*) AS n,
        |         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
        |         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
        |         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
        |         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
        |         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
        |  FROM subj),
        |pp AS (
        |  SELECT
        |    CAST(n * sxy - sx * sy AS DOUBLE) /
        |      CAST(n * sxx - sx * sx AS DOUBLE) AS theta,
        |    CAST(n * sxy - sx * sy AS DOUBLE) *
        |      CAST(n * sxy - sx * sy AS DOUBLE) /
        |      (CAST(n * sxx - sx * sx AS DOUBLE) *
        |       CAST(n * syy - sy * sy AS DOUBLE)) AS rho2,
        |    CAST(sx AS DOUBLE) / n AS xbar_all
        |  FROM pooled),
        |a AS (
        |  SELECT arm, COUNT(*) AS n,
        |         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
        |         SUM(CAST(y AS DECIMAL(38,0))) AS sy
        |  FROM subj GROUP BY arm)
        |SELECT arm, n,
        |       round(CAST(sx AS DOUBLE) / n / 100.0, 6) AS mean_pre,
        |       round(CAST(sy AS DOUBLE) / n / 100.0, 6) AS mean_post,
        |       round((CAST(sy AS DOUBLE) / n - theta *
        |              (CAST(sx AS DOUBLE) / n - xbar_all)) / 100.0, 6)
        |         AS mean_adjusted,
        |       round(theta, 6) AS theta,
        |       round(rho2, 6) AS var_reduction
        |FROM a, pp ORDER BY arm""".stripMargin,
    // q192: daily cents frames, integer lag alignment by date_add,
    // exact decimal Pearson moments — q185's recipe across two series.
    "q192_ship_lag_xcorr" ->
      """WITH dx AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS x
        |  FROM orders GROUP BY 1),
        |dy AS (
        |  SELECT CAST(l_shipdate AS DATE) AS day,
        |         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS y
        |  FROM lineitem GROUP BY 1),
        |p AS (
        |  SELECT l.lag, dx.x, dy.y
        |  FROM dx, (SELECT unnest(range(0, 15)) AS lag) l
        |  JOIN dy ON dy.day = dx.day + CAST(l.lag AS INT)),
        |m AS (
        |  SELECT lag, COUNT(*) AS n_days,
        |         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
        |         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
        |         SUM(CAST(x AS DECIMAL(38,0)) * y) AS sxy,
        |         SUM(CAST(x AS DECIMAL(38,0)) * x) AS sxx,
        |         SUM(CAST(y AS DECIMAL(38,0)) * y) AS syy
        |  FROM p GROUP BY 1)
        |SELECT CAST(lag AS BIGINT) AS lag, n_days,
        |       round(CAST(n_days * sxy - sx * sy AS DOUBLE) /
        |             (sqrt(CAST(n_days * sxx - sx * sx AS DOUBLE)) *
        |              sqrt(CAST(n_days * syy - sy * sy AS DOUBLE))), 6)
        |         AS xcorr
        |FROM m ORDER BY lag""".stripMargin,
    // q188: the DEFINITIONAL one-sort formulation — the smallest value
    // whose running weight reaches k — which the engine's two-pass
    // binned selection must reproduce exactly.
    "q188_weighted_median" ->
      """WITH base AS (
        |  SELECT l_extendedprice AS v, CAST(l_quantity AS BIGINT) AS w
        |  FROM lineitem WHERE l_quantity > 0),
        |tot AS (
        |  SELECT CAST(SUM(w) AS BIGINT) AS wtot,
        |         greatest(CAST(1 AS BIGINT),
        |           CAST(ceil(0.5 * CAST(SUM(w) AS DOUBLE)) AS BIGINT))
        |           AS k
        |  FROM base),
        |c AS (
        |  SELECT v, SUM(w) OVER (ORDER BY v
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw
        |  FROM base)
        |SELECT tot.wtot, tot.k,
        |       (SELECT min(v) FROM c WHERE cw >= tot.k) AS value
        |FROM tot WHERE tot.wtot IS NOT NULL""".stripMargin,
    // q186: the x·ln(x) terms are rounded to 6dp and summed as exact
    // decimals in BOTH engines (order-independent); every later step is
    // plain double arithmetic in the engine's operand order.
    "q186_theil_decomposition" ->
      """WITH cust AS (
        |  SELECT n_name AS nation, cents
        |  FROM (
        |    SELECT o_custkey,
        |           SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        |    FROM orders GROUP BY o_custkey) o
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  WHERE cents > 0),
        |g AS (
        |  SELECT nation, COUNT(*) AS n,
        |         SUM(CAST(cents AS DECIMAL(38,0))) AS sx,
        |         SUM(CAST(round(CAST(cents AS DOUBLE) *
        |               ln(CAST(cents AS DOUBLE)), 6) AS DECIMAL(38,6)))
        |           AS sl
        |  FROM cust GROUP BY 1),
        |tot AS (
        |  SELECT SUM(n) AS tn, SUM(sx) AS ts, SUM(sl) AS tl FROM g),
        |m AS (
        |  SELECT nation, n,
        |         CAST(sx AS DOUBLE) / n AS mu_g,
        |         CAST(ts AS DOUBLE) / tn AS mu,
        |         CAST(sx AS DOUBLE) / CAST(ts AS DOUBLE) AS share,
        |         CAST(sl AS DOUBLE) / CAST(sx AS DOUBLE) AS lbar
        |  FROM g, tot)
        |SELECT nation, CAST(n AS BIGINT) AS n,
        |       round(share, 6) AS revenue_share,
        |       round(lbar - ln(mu_g), 6) AS theil_g,
        |       round(share * (lbar - ln(mu_g)), 6) AS within_contrib,
        |       round(share * ln(mu_g / mu), 6) AS between_contrib
        |FROM m ORDER BY nation""".stripMargin,
    // q180: the seeded md5 uniform and the LITERAL Poisson CDF ladder are
    // replicated term by term (q178's hex-head recipe); replicate means
    // divide a decimal sum by an integer weight total, and the CI ends
    // are order statistics of one sorted list — no interpolation
    // anywhere.
    "q180_bootstrap_ci" ->
      """WITH base AS (
        |  SELECT o_orderkey AS id, o_totalprice AS v FROM orders),
        |e AS (SELECT id, v, unnest(range(25)) AS b FROM base),
        |h AS (
        |  SELECT id, v, b,
        |         md5(concat('bs', ':', CAST(id AS VARCHAR), ':',
        |                    CAST(b AS VARCHAR))) AS hx
        |  FROM e),
        |l AS (
        |  SELECT v, b * 4 + lane AS r,
        |         substr(hx, 1 + 8 * lane::INT, 8) AS hex8
        |  FROM h, (SELECT unnest(range(4)) AS lane)),
        |d AS (
        |  SELECT r, v,
        |    (CAST(CAST(concat('0x', hex8) AS BIGINT) AS DOUBLE) + 0.5)
        |      / 4294967296.0 AS u
        |  FROM l),
        |w AS (
        |  SELECT r, CAST(round(v * 100) AS BIGINT) AS cents,
        |    CAST(u >= 0.36787944117144233 AS BIGINT)
        |    + CAST(u >= 0.7357588823428847 AS BIGINT)
        |    + CAST(u >= 0.9196986029286058 AS BIGINT)
        |    + CAST(u >= 0.9810118431238463 AS BIGINT)
        |    + CAST(u >= 0.9963401531726563 AS BIGINT)
        |    + CAST(u >= 0.9994058151824183 AS BIGINT) AS w
        |  FROM d),
        |m AS (
        |  SELECT r,
        |    round(CAST(CAST(SUM(w * cents) AS BIGINT) AS DOUBLE)
        |          / SUM(w) / 100.0, 6) AS mean_r
        |  FROM w GROUP BY r),
        |s AS (SELECT list_sort(list(mean_r)) AS ms FROM m),
        |f AS (
        |  SELECT round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
        |               AS DOUBLE) / COUNT(o_totalprice), 6) AS full_mean
        |  FROM orders)
        |SELECT CAST(100 AS BIGINT) AS n_replicates, full_mean,
        |       ms[3] AS ci_lo, ms[98] AS ci_hi
        |FROM s, f""".stripMargin,
    // q163: the oracle is the definitional ORDER BY/OFFSET selection the
    // two-pass plan replaces.
    "q163_exact_median" ->
      """WITH t AS (
        |  SELECT CAST(l_extendedprice AS DOUBLE) AS v FROM lineitem),
        |nk AS (
        |  SELECT COUNT(*) AS n,
        |         greatest(1, CAST(ceil(0.5 * COUNT(*)) AS BIGINT)) AS k
        |  FROM t)
        |SELECT nk.n, nk.k,
        |       (SELECT v FROM t ORDER BY v
        |        LIMIT 1 OFFSET (SELECT k - 1 FROM nk)) AS value
        |FROM nk""".stripMargin,
    // q158: binned within-segment shares mapped to the smallest covering
    // global bin; int/int share divisions are identical IEEE doubles.
    "q158_quantile_normalize" ->
      """WITH b AS (
        |  SELECT source AS g, n_chars AS v,
        |         CAST(floor(CAST(n_chars AS DOUBLE) / 16.0) AS BIGINT)
        |           AS bin
        |  FROM documents),
        |c AS (SELECT g, bin, COUNT(*) AS c FROM b GROUP BY 1, 2),
        |ss AS (
        |  SELECT g, bin,
        |         CAST(SUM(c) OVER (PARTITION BY g ORDER BY bin
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS DOUBLE)
        |         / CAST(SUM(c) OVER (PARTITION BY g) AS DOUBLE) AS share
        |  FROM c),
        |gl AS (SELECT bin, SUM(c) AS cg FROM c GROUP BY bin),
        |gs AS (
        |  SELECT bin AS gbin,
        |         CAST(SUM(cg) OVER (ORDER BY bin
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |              AS DOUBLE)
        |         / CAST(SUM(cg) OVER () AS DOUBLE) AS gshare
        |  FROM gl),
        |m AS (
        |  SELECT ss.g, ss.bin, MIN(gs.gbin) AS target_bin
        |  FROM ss JOIN gs ON gs.gshare >= ss.share
        |  GROUP BY 1, 2)
        |SELECT b.g AS source, (m.target_bin + 1) * 16 - 1 AS norm_v,
        |       COUNT(*) AS n, MIN(b.v) AS raw_lo, MAX(b.v) AS raw_hi
        |FROM b JOIN m ON m.g = b.g AND m.bin = b.bin
        |GROUP BY 1, 2 ORDER BY source, norm_v""".stripMargin,
    // q149: Laplace-smoothed PSI per source vs the global mix; per-term
    // DECIMAL(28,12) rounding before the sum mirrors the engine exactly
    // (q134's ln-parity pattern).
    "q149_psi_drift" ->
      """WITH c AS (
        |  SELECT source AS g,
        |         CAST(floor(CAST(n_chars AS DOUBLE) / 64.0) AS BIGINT)
        |           AS bin,
        |         COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |pg AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_g FROM c GROUP BY g),
        |pb AS (SELECT bin, SUM(c) AS c_ref FROM c GROUP BY bin),
        |tot AS (SELECT SUM(c_ref) AS n_all, COUNT(*) AS n_bins FROM pb),
        |grid AS (
        |  SELECT pg.g, pg.n_g, pb.bin, pb.c_ref,
        |         COALESCE(c.c, 0) AS c, tot.n_all, tot.n_bins
        |  FROM pg CROSS JOIN pb
        |  LEFT JOIN c ON c.g = pg.g AND c.bin = pb.bin
        |  CROSS JOIN tot),
        |terms AS (
        |  SELECT g, n_g,
        |         CAST(((CAST(c AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |               / (CAST(n_g AS DOUBLE)
        |                  + CAST(0.5 AS DOUBLE) * CAST(n_bins AS DOUBLE))
        |             - (CAST(c_ref AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |               / (CAST(n_all AS DOUBLE)
        |                  + CAST(0.5 AS DOUBLE) * CAST(n_bins AS DOUBLE)))
        |           * ln(((CAST(c AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |               / (CAST(n_g AS DOUBLE)
        |                  + CAST(0.5 AS DOUBLE) * CAST(n_bins AS DOUBLE)))
        |              / ((CAST(c_ref AS DOUBLE) + CAST(0.5 AS DOUBLE))
        |               / (CAST(n_all AS DOUBLE)
        |                  + CAST(0.5 AS DOUBLE) * CAST(n_bins AS DOUBLE))))
        |           AS DECIMAL(28,12)) AS term
        |  FROM grid)
        |SELECT g AS source, n_g,
        |       round(CAST(SUM(term) AS DOUBLE), 6) AS psi,
        |       CASE WHEN round(CAST(SUM(term) AS DOUBLE), 6) >= 0.25
        |              THEN 'act'
        |            WHEN round(CAST(SUM(term) AS DOUBLE), 6) >= 0.1
        |              THEN 'watch'
        |            ELSE 'stable' END AS verdict
        |FROM terms GROUP BY g, n_g ORDER BY source""".stripMargin,
    "q146_ks_drift" ->
      """WITH pb AS (
        |  SELECT CAST(floor(CAST(value AS DOUBLE) * 2.0) AS BIGINT) AS bin,
        |         COUNT(*) FILTER (event_type = 'purchase') AS cnt_a,
        |         COUNT(*) FILTER (event_type = 'view') AS cnt_b
        |  FROM events WHERE event_type IN ('purchase', 'view')
        |  GROUP BY 1),
        |cum AS (
        |  SELECT SUM(cnt_a) OVER w AS cum_a, SUM(cnt_b) OVER w AS cum_b
        |  FROM pb
        |  WINDOW w AS (ORDER BY bin
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |tot AS (SELECT SUM(cnt_a) AS n_a, SUM(cnt_b) AS n_b FROM pb),
        |agg AS (
        |  SELECT MAX(ABS(CAST(cum_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        |               - CAST(cum_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        |           AS ks_d,
        |         MAX(n_a) AS n_a, MAX(n_b) AS n_b
        |  FROM cum CROSS JOIN tot)
        |SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
        |       round(ks_d, 6) AS ks_d,
        |       round(CAST(1.358 AS DOUBLE)
        |             * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |                    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))),
        |             6) AS d_crit,
        |       ks_d > CAST(1.358 AS DOUBLE)
        |              * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
        |                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)))
        |         AS drifted
        |FROM agg""".stripMargin,
    "q82_unpivot_metrics" ->
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |         ${dsumSql("l_quantity")} AS sum_qty,
         |         ${dsumSql("l_extendedprice")} AS sum_price,
         |         ${dsumSql("l_discount")} AS sum_disc
         |  FROM lineitem GROUP BY 1)
         |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS mval FROM a
         |UNION ALL
         |SELECT l_returnflag, 'sum_price', sum_price FROM a
         |UNION ALL
         |SELECT l_returnflag, 'sum_disc', sum_disc FROM a
         |ORDER BY l_returnflag, metric""".stripMargin,
    "q83_correlation_matrix" ->
      """WITH m AS (
        |  SELECT COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sq,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sp,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sd,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sqq,
        |    CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS spp,
        |    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sdd,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sqp,
        |    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS sqd,
        |    CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE) AS spd
        |  FROM lineitem)
        |SELECT 'extendedprice' AS var_x, 'discount' AS var_y,
        |       round((n * spd - sp * sd) /
        |         (sqrt(n * spp - sp * sp) * sqrt(n * sdd - sd * sd)), 6)
        |         AS corr_v, n
        |FROM m
        |UNION ALL
        |SELECT 'quantity', 'discount',
        |       round((n * sqd - sq * sd) /
        |         (sqrt(n * sqq - sq * sq) * sqrt(n * sdd - sd * sd)), 6), n
        |FROM m
        |UNION ALL
        |SELECT 'quantity', 'extendedprice',
        |       round((n * sqp - sq * sp) /
        |         (sqrt(n * sqq - sq * sq) * sqrt(n * spp - sp * sp)), 6), n
        |FROM m
        |ORDER BY var_x, var_y""".stripMargin,
    // q132: the slope expression is spelled twice (slope, and inside
    // intercept) with the exact tree the engine builds
    "q132_group_regression" ->
      """WITH m AS (
        |  SELECT l_returnflag, COUNT(*) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sx,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |      AS sy,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))
        |      AS DOUBLE) AS sxx,
        |    CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,6)))
        |      AS DOUBLE) AS sxy
        |  FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, n,
        |       round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6)
        |         AS slope,
        |       round((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx)
        |             / n, 6) AS intercept
        |FROM m ORDER BY l_returnflag""".stripMargin,
    // q133: the statistic's double tree is mirrored token-for-token
    // (expected counts, (O-E)^2/E, decimal term sums); constants that
    // enter double arithmetic are CAST(1 AS DOUBLE) so DuckDB doesn't
    // evaluate them as exact DECIMAL (the q130 lesson).
    "q133_chi_square" ->
      """WITH cells AS (
        |  SELECT o_orderstatus, o_orderpriority, COUNT(*) AS obs
        |  FROM orders GROUP BY 1, 2),
        |rt AS (SELECT o_orderstatus, CAST(SUM(obs) AS BIGINT) AS row_tot
        |       FROM cells GROUP BY 1),
        |ct AS (SELECT o_orderpriority, CAST(SUM(obs) AS BIGINT) AS col_tot
        |       FROM cells GROUP BY 1),
        |tt AS (SELECT CAST(SUM(obs) AS BIGINT) AS n_total,
        |              COUNT(DISTINCT o_orderstatus) AS n_r,
        |              COUNT(DISTINCT o_orderpriority) AS n_c FROM cells),
        |j AS (
        |  SELECT n_total, n_r, n_c,
        |         CAST((CAST(obs AS DOUBLE) -
        |               CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
        |                 / CAST(n_total AS DOUBLE)) *
        |              (CAST(obs AS DOUBLE) -
        |               CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
        |                 / CAST(n_total AS DOUBLE)) /
        |              (CAST(row_tot AS DOUBLE) * CAST(col_tot AS DOUBLE)
        |                 / CAST(n_total AS DOUBLE))
        |              AS DECIMAL(28,12)) AS term
        |  FROM cells
        |  JOIN rt USING (o_orderstatus)
        |  JOIN ct USING (o_orderpriority)
        |  CROSS JOIN tt)
        |SELECT n_total, (n_r - 1) * (n_c - 1) AS dof,
        |       round(CAST(SUM(term) AS DOUBLE), 6) AS chi2,
        |       round(sqrt(CAST(SUM(term) AS DOUBLE) /
        |         (CAST(n_total AS DOUBLE) *
        |          CAST(least(n_r - 1, n_c - 1) AS DOUBLE))), 6)
        |         AS cramers_v
        |FROM j GROUP BY n_total, n_r, n_c""".stripMargin,
    // q137: rank math folded over per-VALUE counts — 2·R1 stays integer
    // (DECIMAL(38,0) sums) until the final halving; the scalar U/z/
    // effect-size trees mirror the engine with CAST(k AS DOUBLE)
    // constants throughout.
    "q137_mann_whitney" ->
      """WITH c AS (
        |  SELECT c_acctbal AS v, c_mktsegment AS g FROM customer
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |pv AS (
        |  SELECT v, COUNT(*) AS cnt,
        |         COUNT(*) FILTER (WHERE g = 'BUILDING') AS cnt_a
        |  FROM c GROUP BY v),
        |cum AS (
        |  SELECT cnt, cnt_a,
        |         COALESCE(SUM(cnt) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           AS cum_before
        |  FROM pv),
        |m AS (
        |  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
        |         CAST(SUM(cnt_a) AS BIGINT) AS n1,
        |         SUM(CAST(cnt_a * (2 * cum_before + cnt + 1)
        |             AS DECIMAL(38,0))) AS r2,
        |         SUM(CAST(cnt * cnt * cnt - cnt AS DECIMAL(38,0))) AS tsum
        |  FROM cum),
        |s AS (
        |  SELECT n1, n - n1 AS n2,
        |         CAST(n1 AS DOUBLE) AS n1d,
        |         CAST(n - n1 AS DOUBLE) AS n2d,
        |         CAST(n AS DOUBLE) AS nd,
        |         CAST(r2 AS DOUBLE) / CAST(2 AS DOUBLE)
        |           - CAST(n1 AS DOUBLE) *
        |             (CAST(n1 AS DOUBLE) + CAST(1 AS DOUBLE))
        |             / CAST(2 AS DOUBLE) AS u1,
        |         CAST(tsum AS DOUBLE) AS tsumd
        |  FROM m)
        |SELECT n1, n2, round(u1, 6) AS u_stat,
        |       round((u1 - n1d * n2d / CAST(2 AS DOUBLE)) /
        |         sqrt(n1d * n2d / CAST(12 AS DOUBLE) *
        |           ((nd + CAST(1 AS DOUBLE)) -
        |            tsumd / (nd * (nd - CAST(1 AS DOUBLE))))), 6)
        |         AS z_stat,
        |       round(CAST(1 AS DOUBLE) -
        |         CAST(2 AS DOUBLE) * u1 / (n1d * n2d), 6)
        |         AS rank_biserial
        |FROM s""".stripMargin,
    // q138: the q52 md5-prefix cohort split reproduced verbatim, then
    // the pooled-SE z tree in mirrored DOUBLE arithmetic.
    "q138_two_proportion_z" ->
      """WITH ev AS (
        |  SELECT CASE WHEN substr(md5(CAST(user_id AS VARCHAR)), 1, 1) < '8'
        |              THEN 'A' ELSE 'B' END AS cohort,
        |         event_type
        |  FROM events),
        |m AS (
        |  SELECT COUNT(*) FILTER (WHERE cohort = 'A') AS n1,
        |         CAST(SUM(CASE WHEN cohort = 'A' AND event_type = 'purchase'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS x1,
        |         COUNT(*) FILTER (WHERE cohort = 'B') AS n2,
        |         CAST(SUM(CASE WHEN cohort = 'B' AND event_type = 'purchase'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS x2
        |  FROM ev),
        |s AS (
        |  SELECT n1, x1, n2, x2,
        |         CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
        |         CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
        |         CAST(x1 + x2 AS DOUBLE) /
        |           (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE)) AS pp
        |  FROM m)
        |SELECT n1, x1, n2, x2,
        |       round(p1, 6) AS rate_a, round(p2, 6) AS rate_b,
        |       round((p1 - p2) /
        |         sqrt(pp * (CAST(1 AS DOUBLE) - pp) *
        |           (CAST(1 AS DOUBLE) / CAST(n1 AS DOUBLE) +
        |            CAST(1 AS DOUBLE) / CAST(n2 AS DOUBLE))), 6) AS z_stat
        |FROM s""".stripMargin,
    // q136: exact decimal moments per arm, then the Welch arithmetic in
    // DOUBLE with the identical tree (v1 term first in every sum).
    "q136_welch_ttest" ->
      """WITH m AS (
        |  SELECT
        |    COUNT(*) FILTER (WHERE c_mktsegment = 'BUILDING') AS n1,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
        |      FILTER (WHERE c_mktsegment = 'BUILDING') AS DOUBLE) AS s1,
        |    CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(28,6)))
        |      FILTER (WHERE c_mktsegment = 'BUILDING') AS DOUBLE) AS ss1,
        |    COUNT(*) FILTER (WHERE c_mktsegment = 'MACHINERY') AS n2,
        |    CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
        |      FILTER (WHERE c_mktsegment = 'MACHINERY') AS DOUBLE) AS s2,
        |    CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(28,6)))
        |      FILTER (WHERE c_mktsegment = 'MACHINERY') AS DOUBLE) AS ss2
        |  FROM customer
        |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
        |v AS (
        |  SELECT n1, n2, s1, s2,
        |    (CAST(n1 AS DOUBLE) * ss1 - s1 * s1) /
        |      (CAST(n1 AS DOUBLE) *
        |       (CAST(n1 AS DOUBLE) - CAST(1 AS DOUBLE))) AS v1,
        |    (CAST(n2 AS DOUBLE) * ss2 - s2 * s2) /
        |      (CAST(n2 AS DOUBLE) *
        |       (CAST(n2 AS DOUBLE) - CAST(1 AS DOUBLE))) AS v2
        |  FROM m),
        |w AS (
        |  SELECT n1, n2, s1, s2, v1, v2,
        |    v1 / CAST(n1 AS DOUBLE) + v2 / CAST(n2 AS DOUBLE) AS se2
        |  FROM v)
        |SELECT n1, n2,
        |  round(s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE), 6)
        |    AS mean_diff,
        |  round((s1 / CAST(n1 AS DOUBLE) - s2 / CAST(n2 AS DOUBLE))
        |        / sqrt(se2), 6) AS t_stat,
        |  round(se2 * se2 /
        |    ((v1 / CAST(n1 AS DOUBLE)) * (v1 / CAST(n1 AS DOUBLE)) /
        |       (CAST(n1 AS DOUBLE) - CAST(1 AS DOUBLE)) +
        |     (v2 / CAST(n2 AS DOUBLE)) * (v2 / CAST(n2 AS DOUBLE)) /
        |       (CAST(n2 AS DOUBLE) - CAST(1 AS DOUBLE))), 6) AS welch_dof
        |FROM w""".stripMargin,
    "q84_median_mode" ->
      """WITH med AS (
        |  SELECT l_returnflag, median(l_quantity) AS median_qty
        |  FROM lineitem GROUP BY 1),
        |c AS (
        |  SELECT l_returnflag, l_linestatus, COUNT(*) AS n
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (
        |  SELECT l_returnflag, l_linestatus, n,
        |         row_number() OVER (PARTITION BY l_returnflag
        |                            ORDER BY n DESC, l_linestatus) AS rn
        |  FROM c)
        |SELECT med.l_returnflag, med.median_qty,
        |       r.l_linestatus AS mode_status, r.n AS mode_n
        |FROM med JOIN r ON med.l_returnflag = r.l_returnflag AND r.rn = 1
        |ORDER BY med.l_returnflag""".stripMargin,
    "q85_char_entropy" ->
      """WITH cs AS (
        |  SELECT doc_id, unnest(string_split(text, '')) AS ch
        |  FROM documents WHERE len(text) > 0),
        |f AS (SELECT doc_id, ch, COUNT(*) AS c FROM cs GROUP BY 1, 2),
        |tot AS (SELECT doc_id, SUM(c) AS n FROM f GROUP BY 1)
        |SELECT f.doc_id, CAST(tot.n AS BIGINT) AS n_chars_t,
        |       round(-SUM((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)),
        |         6) AS entropy
        |FROM f JOIN tot USING (doc_id)
        |GROUP BY f.doc_id, tot.n ORDER BY f.doc_id""".stripMargin,
    "q86_group_argmax" ->
      """SELECT c_mktsegment,
        |       (MIN({'na': -c_acctbal, 'k': c_custkey})).k AS top_custkey,
        |       -((MIN({'na': -c_acctbal, 'k': c_custkey})).na) AS top_acctbal
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q87_merge_upsert" ->
      """WITH ch AS (
        |  SELECT o_orderkey, o_custkey, o_orderstatus,
        |         o_totalprice + 100.0 AS o_totalprice, o_orderdate,
        |         o_orderpriority, 'U' AS op
        |  FROM orders WHERE o_orderkey % 10 = 0 AND o_orderkey % 97 <> 0
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, o_orderpriority, 'D'
        |  FROM orders WHERE o_orderkey % 97 = 0
        |  UNION ALL
        |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
        |         o_totalprice, o_orderdate, o_orderpriority, 'I'
        |  FROM orders WHERE o_orderkey % 13 = 0)
        |SELECT * FROM (
        |  SELECT b.o_orderkey, b.o_custkey, b.o_orderstatus, b.o_totalprice,
        |         b.o_orderdate, b.o_orderpriority
        |  FROM orders b
        |  WHERE NOT EXISTS (SELECT 1 FROM ch WHERE ch.o_orderkey = b.o_orderkey)
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |         o_orderdate, o_orderpriority
        |  FROM ch WHERE op <> 'D')
        |ORDER BY o_orderkey""".stripMargin,
    "q88_decayed_revenue" ->
      s"""WITH d AS (
         |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         |         ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders GROUP BY 1),
         |n AS (
         |  SELECT day, revenue,
         |         date_diff('day', TIMESTAMP '1970-01-01 00:00:00', day)
         |           AS day_num
         |  FROM d),
         |p AS (
         |  SELECT a.day, a.revenue,
         |         CAST(a.day_num - b.day_num AS INTEGER) AS diff,
         |         b.revenue AS val_b
         |  FROM n a JOIN n b
         |    ON b.day_num BETWEEN a.day_num - 29 AND a.day_num)
         |SELECT day, revenue,
         |       round(
         |         CAST(SUM(CAST(val_b / (1::BIGINT << diff)
         |                       AS DECIMAL(38,25))) AS DOUBLE) /
         |         CAST(SUM(CAST(1.0 / (1::BIGINT << diff)
         |                       AS DECIMAL(38,30))) AS DOUBLE), 6)
         |         AS decayed_avg
         |FROM p GROUP BY day, revenue ORDER BY day""".stripMargin,
    "q89_embedding_stats" ->
      """SELECT vec_id, label,
        |       CAST(len(embedding) AS BIGINT) AS dim,
        |       round(sqrt(list_sum(list_transform(embedding,
        |         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS norm,
        |       CAST(list_min(embedding) AS DOUBLE) AS min_c,
        |       CAST(list_max(embedding) AS DOUBLE) AS max_c
        |FROM embeddings ORDER BY vec_id""".stripMargin,
    "q90_date_spine_gapfill" ->
      s"""WITH d AS (
         |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         |         COUNT(*) AS n_orders,
         |         ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders GROUP BY 1),
         |spine AS (
         |  SELECT unnest(generate_series(
         |    (SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d),
         |    INTERVAL 1 DAY)) AS day)
         |SELECT spine.day,
         |       COALESCE(d.n_orders, 0) AS n_orders,
         |       COALESCE(d.revenue, 0.0) AS revenue
         |FROM spine LEFT JOIN d ON spine.day = d.day
         |ORDER BY spine.day""".stripMargin,
    "q98_full_outer_reconcile" ->
      """WITH o AS (SELECT o_custkey AS key, COUNT(*) AS n_orders
        |           FROM orders GROUP BY 1),
        |e AS (SELECT user_id AS key, COUNT(*) AS n_events
        |      FROM events GROUP BY 1)
        |SELECT COALESCE(o.key, e.key) AS key,
        |       COALESCE(n_orders, 0) AS n_orders,
        |       COALESCE(n_events, 0) AS n_events,
        |       CASE WHEN n_orders IS NULL THEN 'events_only'
        |            WHEN n_events IS NULL THEN 'orders_only'
        |            ELSE 'both' END AS presence
        |FROM o FULL OUTER JOIN e ON o.key = e.key
        |ORDER BY key""".stripMargin,
    "q99_dense_grid" ->
      s"""WITH prios AS (SELECT DISTINCT o_orderpriority FROM orders),
         |facts AS (
         |  SELECT n.n_regionkey, o.o_orderpriority,
         |         COUNT(*) AS n_orders,
         |         ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON c.c_nationkey = n.n_nationkey
         |  GROUP BY 1, 2)
         |SELECT r.r_name, p.o_orderpriority,
         |       COALESCE(f.n_orders, 0) AS n_orders,
         |       COALESCE(f.revenue, 0.0) AS revenue
         |FROM region r CROSS JOIN prios p
         |LEFT JOIN facts f ON r.r_regionkey = f.n_regionkey
         |                 AND p.o_orderpriority = f.o_orderpriority
         |ORDER BY r.r_name, p.o_orderpriority""".stripMargin,
    "q94_recursive_hierarchy" ->
      """WITH RECURSIVE h(k, root, depth) AS (
        |  SELECT o_orderkey, o_orderkey, CAST(0 AS BIGINT) FROM orders
        |  WHERE o_orderkey <= 9
        |  UNION ALL
        |  SELECT o.o_orderkey, h.root, h.depth + 1
        |  FROM orders o JOIN h ON o.o_orderkey // 10 = h.k
        |  WHERE o.o_orderkey > 9)
        |SELECT k AS o_orderkey, root AS root_key, CAST(depth AS BIGINT) AS depth
        |FROM h ORDER BY o_orderkey""".stripMargin,
    // q174: the interpolation expression mirrors the engine's fixed
    // operation order term by term (prev + (next−prev) · dayfrac, all
    // DOUBLE); day distances are integer datediffs.
    "q174_linear_interp" ->
      s"""WITH d AS (
         |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         |         ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders GROUP BY 1),
         |spine AS (
         |  SELECT unnest(generate_series(
         |    (SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d),
         |    INTERVAL 1 DAY)) AS day),
         |f AS (
         |  SELECT spine.day, d.revenue,
         |         last_value(d.revenue IGNORE NULLS) OVER wb AS prev_v,
         |         last_value(CASE WHEN d.revenue IS NOT NULL
         |                         THEN spine.day END IGNORE NULLS)
         |           OVER wb AS prev_d,
         |         first_value(d.revenue IGNORE NULLS) OVER wf AS next_v,
         |         first_value(CASE WHEN d.revenue IS NOT NULL
         |                          THEN spine.day END IGNORE NULLS)
         |           OVER wf AS next_d
         |  FROM spine LEFT JOIN d ON spine.day = d.day
         |  WINDOW wb AS (ORDER BY spine.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |  wf AS (ORDER BY spine.day
         |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT day, revenue IS NULL AS is_gap,
         |       round(CASE
         |         WHEN revenue IS NOT NULL THEN revenue
         |         ELSE prev_v + (next_v - prev_v) *
         |           (CAST(date_diff('day', prev_d, day) AS DOUBLE) /
         |            CAST(date_diff('day', prev_d, next_d) AS DOUBLE))
         |         END, 6) AS revenue_interp
         |FROM f ORDER BY day""".stripMargin,
    "q95_locf_gapfill" ->
      s"""WITH d AS (
         |  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         |         ${dsumSql("o_totalprice")} AS revenue
         |  FROM orders GROUP BY 1),
         |spine AS (
         |  SELECT unnest(generate_series(
         |    (SELECT MIN(day) FROM d), (SELECT MAX(day) FROM d),
         |    INTERVAL 1 DAY)) AS day)
         |SELECT spine.day, d.revenue IS NULL AS is_gap,
         |       last_value(d.revenue IGNORE NULLS)
         |         OVER (ORDER BY spine.day
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |         AS revenue_filled
         |FROM spine LEFT JOIN d ON spine.day = d.day
         |ORDER BY spine.day""".stripMargin,
    "q91_percent_rank" ->
      """SELECT c_custkey, c_mktsegment, c_acctbal,
        |       round(percent_rank() OVER (PARTITION BY c_mktsegment
        |                                  ORDER BY c_acctbal), 6) AS pr,
        |       round(cume_dist() OVER (PARTITION BY c_mktsegment
        |                               ORDER BY c_acctbal), 6) AS cd
        |FROM customer ORDER BY c_custkey""".stripMargin)
}
