package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Stats

class StatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("unpivotMetrics reshapes wide aggregates to long") {
    val df = Seq(("A", 1.0, 10.0), ("B", 2.0, 20.0))
      .toDF("grp", "m1", "m2")
    val out = Stats.unpivotMetrics(df, "grp", Seq("m1", "m2"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.toSet == Set(
      ("A", "m1", 1.0), ("A", "m2", 10.0), ("B", "m1", 2.0), ("B", "m2", 20.0)))
  }

  test("charEntropy: uniform two-char string = ln 2; single char = 0") {
    val df = Seq((1L, "abab"), (2L, "aaaa"), (3L, "abcd")).toDF("id", "s")
    val out = df.select(col("id"), graft.functions.charEntropy(col("s")))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(out(1L) - math.log(2)) < 1e-12)
    assert(out(2L) == 0.0)
    assert(math.abs(out(3L) - math.log(4)) < 1e-12)
  }

  test("charEntropy matches the relational char-exploded formulation") {
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents").limit(50)
    val fused = docs.select(col("doc_id"),
      round(graft.functions.charEntropy(col("text")), 6).as("e"))
    val exploded = docs
      .select(col("doc_id"), posexplode(split(col("text"), "(?!^)")))
      // Spark split(limit=-1) keeps the trailing zero-width match as an
      // empty string — drop it; DuckDB's string_split does not emit it
      .filter(col("col") =!= "")
      .groupBy(col("doc_id"), col("col")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .groupBy(col("doc_id"))
      .agg(round(-sum((col("c") / col("n")) *
        log(col("c") / col("n"))), 6).as("e"))
    assert(fused.exceptAll(exploded).isEmpty && exploded.exceptAll(fused).isEmpty)
  }

  test("chiSquare matches the scalar formula on a known 2x2 contingency") {
    // cells: (a,x)=10 (a,y)=20 (b,x)=30 (b,y)=40
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val out = Stats.chiSquare(rows.toDF("g", "h"), "g", "h").collect().head
    val n = 100.0
    val expect = Seq((10.0, 30.0, 40.0), (20.0, 30.0, 60.0),
      (30.0, 70.0, 40.0), (40.0, 70.0, 60.0))
      .map { case (o, rt, ct) =>
        val e = rt * ct / n; (o - e) * (o - e) / e
      }.sum
    assert(out.getAs[Long]("n_total") == 100L)
    assert(out.getAs[Long]("dof") == 1L)
    assert(math.abs(out.getAs[Double]("chi2") - expect) < 1e-6)
    assert(math.abs(out.getAs[Double]("cramers_v") -
      math.sqrt(expect / n)) < 1e-6)
  }

  test("chiSquare is ~zero when the factors are independent") {
    // perfectly proportional table -> expected == observed -> chi2 = 0
    val rows = for {
      (g, gn) <- Seq("a" -> 1, "b" -> 2); (h, hn) <- Seq("x" -> 3, "y" -> 5)
      _ <- 0 until gn * hn
    } yield (g, h)
    val out = Stats.chiSquare(rows.toDF("g", "h"), "g", "h").collect().head
    assert(out.getAs[Double]("chi2") == 0.0)
  }

  test("welchTtest matches the scalar Welch formulas") {
    val xs = Seq(10.0, 12.0, 14.0, 11.0, 13.0)
    val ys = Seq(20.0, 25.0, 30.0)
    val df = (xs.map(("A", _)) ++ ys.map(("B", _))).toDF("arm", "v")
    val out = Stats.welchTtest(df, "v", "arm", "A", "B").collect().head
    def meanVar(s: Seq[Double]): (Double, Double) = {
      val m = s.sum / s.size
      (m, s.map(x => (x - m) * (x - m)).sum / (s.size - 1))
    }
    val (m1, v1) = meanVar(xs); val (m2, v2) = meanVar(ys)
    val se2 = v1 / xs.size + v2 / ys.size
    val t = (m1 - m2) / math.sqrt(se2)
    val dof = se2 * se2 /
      (math.pow(v1 / xs.size, 2) / (xs.size - 1) +
        math.pow(v2 / ys.size, 2) / (ys.size - 1))
    assert(out.getAs[Long]("n1") == 5L && out.getAs[Long]("n2") == 3L)
    assert(math.abs(out.getAs[Double]("mean_diff") - (m1 - m2)) < 1e-6)
    assert(math.abs(out.getAs[Double]("t_stat") - t) < 1e-6)
    assert(math.abs(out.getAs[Double]("welch_dof") - dof) < 1e-6)
  }

  test("mannWhitney matches an independent avg-rank reference, ties included") {
    val a = Seq(1.0, 2.0, 2.0, 5.0)
    val b = Seq(2.0, 3.0, 4.0)
    val df = (a.map(("A", _)) ++ b.map(("B", _))).toDF("arm", "v")
    val out = Stats.mannWhitney(df, "v", "arm", "A", "B").collect().head
    // reference: pooled avg ranks by value
    val pooled = (a.map((_, "A")) ++ b.map((_, "B"))).sortBy(_._1)
    val avgRank = pooled.map(_._1).distinct.map { v =>
      val idx = pooled.zipWithIndex.filter(_._1._1 == v).map(_._2 + 1)
      v -> idx.sum.toDouble / idx.size
    }.toMap
    val r1 = pooled.filter(_._2 == "A").map(p => avgRank(p._1)).sum
    val (n1, n2) = (a.size.toDouble, b.size.toDouble); val n = n1 + n2
    val u1 = r1 - n1 * (n1 + 1) / 2
    val tsum = pooled.groupBy(_._1).values
      .map(g => math.pow(g.size, 3) - g.size).sum
    val sigma = math.sqrt(n1 * n2 / 12 * ((n + 1) - tsum / (n * (n - 1))))
    val z = (u1 - n1 * n2 / 2) / sigma
    assert(out.getAs[Long]("n1") == 4L && out.getAs[Long]("n2") == 3L)
    assert(math.abs(out.getAs[Double]("u_stat") - u1) < 1e-6)
    assert(math.abs(out.getAs[Double]("z_stat") - z) < 1e-6)
    assert(math.abs(out.getAs[Double]("rank_biserial") -
      (1 - 2 * u1 / (n1 * n2))) < 1e-6)
  }

  test("mannWhitney: fully separated arms give U = 0 and rank-biserial 1") {
    val df = (Seq(1.0, 2.0, 3.0).map(("A", _)) ++
      Seq(10.0, 11.0).map(("B", _))).toDF("arm", "v")
    val out = Stats.mannWhitney(df, "v", "arm", "A", "B").collect().head
    assert(out.getAs[Double]("u_stat") == 0.0)
    assert(out.getAs[Double]("rank_biserial") == 1.0)
  }

  test("q138 two-proportion z reconciles with an independent recount") {
    val out = Stats.q138TwoProportionZ(spark, TestSpark.sfDir)
      .collect().head
    val ev = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "events")
      .withColumn("a", substring(md5(col("user_id").cast("string")), 1, 1) < "8")
    val n1 = ev.filter(col("a")).count()
    val x1 = ev.filter(col("a") && col("event_type") === "purchase").count()
    val n2 = ev.filter(!col("a")).count()
    val x2 = ev.filter(!col("a") && col("event_type") === "purchase").count()
    assert(out.getAs[Long]("n1") == n1 && out.getAs[Long]("x1") == x1)
    assert(out.getAs[Long]("n2") == n2 && out.getAs[Long]("x2") == x2)
    val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
    val pp = (x1 + x2).toDouble / (n1 + n2)
    val z = (p1 - p2) /
      math.sqrt(pp * (1 - pp) * (1.0 / n1 + 1.0 / n2))
    assert(math.abs(out.getAs[Double]("z_stat") - z) < 1e-6)
  }

  test("mergeUpsert applies updates, deletes, inserts exactly") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, "c", "D"), (4L, "d", "I"))
      .toDF("k", "v", "op")
    val out = Stats.mergeUpsert(base, changes, "k")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "a", 2L -> "B", 4L -> "d"))
  }

  test("decayedTrailingAvg: constant series is a fixed point; first row is itself") {
    val series = (0L to 9L).map(d => (d, 100.0)).toDF("pos", "v")
    val out = Stats.decayedTrailingAvg(series, "pos", "v", window = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.values.forall(v => math.abs(v - 100.0) < 1e-9))
    val step = Seq((0L, 0.0), (1L, 0.0), (2L, 120.0)).toDF("pos", "v")
    val s = Stats.decayedTrailingAvg(step, "pos", "v", window = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(s(0L) == 0.0)
    // at pos 2: weights 1, 1/2, 1/4 -> 120/(1.75) = 68.571429
    assert(math.abs(s(2L) - 120.0 / 1.75) < 1e-5, s"got ${s(2L)}")
  }

  test("decayedTrailingAvg window cutoff: positions beyond the window drop out") {
    val series = Seq((0L, 1000.0), (40L, 80.0)).toDF("pos", "v")
    val out = Stats.decayedTrailingAvg(series, "pos", "v", window = 30)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(40L) == 80.0, "pos 0 is outside the 30-wide trailing window")
  }

  test("q86 group argmax picks max balance, smallest key on ties") {
    val df = Seq((1L, "S1", 50.0), (2L, "S1", 70.0), (3L, "S1", 70.0),
        (4L, "S2", 10.0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val out = df.groupBy(col("c_mktsegment"))
      .agg(min(struct((-col("c_acctbal")).as("na"),
        col("c_custkey").as("k"))).as("m"))
      .select(col("c_mktsegment"), col("m.k"), (-col("m.na")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(out("S1") == ((2L, 70.0)))
    assert(out("S2") == ((4L, 10.0)))
  }

  test("q90 gap fill emits zero rows for missing days") {
    val out = Stats.q90DateSpineGapfill(spark, TestSpark.sfDir)
    val n = out.count()
    val gaps = out.filter(col("n_orders") === 0)
    val span = out.agg(min(col("day")), max(col("day"))).head()
    val days = java.time.Duration.between(
      span.getTimestamp(0).toLocalDateTime,
      span.getTimestamp(1).toLocalDateTime).toDays + 1
    assert(n == days, s"spine must be continuous: $n rows vs $days days")
    assert(gaps.count() == n - Stats.q90DateSpineGapfill(spark, TestSpark.sfDir)
      .filter(col("n_orders") > 0).count())
    assert(gaps.select(sum(col("revenue"))).head.getDouble(0) == 0.0)
  }

  test("q83 correlation values are in [-1,1] and price~quantity strongly positive") {
    val out = Stats.q83CorrelationMatrix(spark, TestSpark.sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out.values.forall(v => v >= -1.0 && v <= 1.0))
    // synthetic corpus draws price and quantity independently — the exact
    // corr is near zero; the invariant is boundedness + all pairs present
    assert(out.keySet == Set(("quantity", "extendedprice"),
      ("quantity", "discount"), ("extendedprice", "discount")))
  }

  test("q84 median/mode deterministic on the corpus") {
    val out = Stats.q84MedianMode(spark, TestSpark.sfDir).collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getDouble(1) > 0 && !r.isNullAt(2) && r.getLong(3) > 0)
    }
  }

  test("q91 percent_rank spans [0,1] per segment") {
    val out = Stats.q91PercentRank(spark, TestSpark.sfDir)
    val bounds = out.groupBy(col("c_mktsegment"))
      .agg(min(col("pr")).as("mn"), max(col("pr")).as("mx"),
        max(col("cd")).as("cdx"))
      .collect()
    bounds.foreach { r =>
      assert(r.getDouble(1) == 0.0 && r.getDouble(2) == 1.0 &&
        r.getDouble(3) == 1.0)
    }
  }

  test("q87 merge preserves key uniqueness and applies the batch") {
    val out = Stats.q87MergeUpsert(spark, TestSpark.sfDir)
    val total = out.count()
    assert(out.select(col("o_orderkey")).distinct().count() == total)
    // deletes gone, inserts present
    assert(out.filter(col("o_orderkey") % 97 === 0 &&
      col("o_orderkey") < 100000000L).count() == 0)
    assert(out.filter(col("o_orderkey") >= 100000000L).count() > 0)
  }

  test("q95 LOCF: gap days inherit the previous observed revenue") {
    val out = Stats.q95LocfGapfill(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    // after the first day (observed by construction of the spine bounds),
    // every row must be filled
    assert(out.forall(r => !r.isNullAt(2)), "no unfilled rows")
    // every gap row's filled value equals the nearest preceding observed one
    var lastObserved = Double.NaN
    out.foreach { r =>
      val isGap = r.getBoolean(1)
      val filled = r.getDouble(2)
      if (!isGap) lastObserved = filled
      else assert(filled == lastObserved,
        s"gap day ${r.get(0)} must carry $lastObserved, got $filled")
    }
    assert(out.exists(_.getBoolean(1)), "fixture has at least one gap day")
  }

  test("maxConcurrency: overlap counting and midnight split carry-over") {
    import java.sql.Timestamp
    def t(s: String) = Timestamp.valueOf(s)
    val iv = Seq(
      // three overlapping in the evening + one disjoint
      (t("2026-03-01 20:00:00"), t("2026-03-01 21:00:00")),
      (t("2026-03-01 20:30:00"), t("2026-03-01 21:30:00")),
      (t("2026-03-01 20:45:00"), t("2026-03-01 22:00:00")),
      (t("2026-03-01 09:00:00"), t("2026-03-01 09:30:00")),
      // crosses midnight: must count as 1 live at the start of Mar 2
      (t("2026-03-01 23:30:00"), t("2026-03-02 00:30:00")),
      // back-to-back at the same instant: half-open, so never 2 live
      (t("2026-03-03 10:00:00"), t("2026-03-03 11:00:00")),
      (t("2026-03-03 11:00:00"), t("2026-03-03 12:00:00")))
      .toDF("s", "e")
      .select(col("s").cast("timestamp_ntz").as("s"),
        col("e").cast("timestamp_ntz").as("e"))
    val out = graft.ops.Temporal.maxConcurrency(iv, "s", "e")
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    assert(out("2026-03-01") == 3, s"evening triple overlaps: $out")
    assert(out("2026-03-02") == 1, s"midnight carry-over: $out")
    assert(out("2026-03-03") == 1, s"half-open back-to-back: $out")
  }

  test("ksDrift: identical arms D=0, separated arms D=1, mixed matches " +
      "an independent ECDF recompute") {
    def run(rows: Seq[(Double, String)]) =
      Stats.ksDrift(rows.toDF("value", "g"), "value", "g", "A", "B")
        .collect().head
    val same = (1 to 20).flatMap(i =>
      Seq((i.toDouble, "A"), (i.toDouble, "B")))
    val r0 = run(same)
    assert(r0.getDouble(2) == 0.0 && !r0.getBoolean(4), r0.toString)
    val apart = (1 to 10).map(i => (i.toDouble, "A")) ++
      (101 to 110).map(i => (i.toDouble, "B"))
    val r1 = run(apart)
    assert(r1.getDouble(2) == 1.0 && r1.getBoolean(4), r1.toString)
    // mixed: deterministic pseudo-random values, recompute on binned ECDFs
    val mixed = (0 until 60).map { i =>
      val v = (i * 37 % 97) / 3.0
      (v, if (i % 3 == 0) "A" else "B")
    }
    val r = run(mixed)
    val binsOf = mixed.groupBy { case (v, _) => math.floor(v * 2.0).toLong }
    val allBins = binsOf.keys.toSeq.sorted
    val na = mixed.count(_._2 == "A").toDouble
    val nb = mixed.count(_._2 == "B").toDouble
    var ca = 0L; var cb = 0L; var d = 0.0
    allBins.foreach { b =>
      ca += binsOf(b).count(_._2 == "A")
      cb += binsOf(b).count(_._2 == "B")
      d = math.max(d, math.abs(ca / na - cb / nb))
    }
    assert(math.abs(r.getDouble(2) -
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      < 1e-9, s"engine ${r.getDouble(2)} vs recomputed $d")
    assert(r.getLong(0) == na.toLong && r.getLong(1) == nb.toLong)
  }

  test("overlapCounts: bucketed keyless range join ≡ brute force, " +
      "boundary-exact") {
    import java.sql.Timestamp
    // pseudorandom micro offsets from a hash so the case set is dense but
    // deterministic; intervals are the value>=1 events, length 60s
    val base = Timestamp.valueOf("2026-03-01 00:00:00").getTime * 1000L
    val rows = (0L until 200L).map { i =>
      val us = base + (i * 2654435761L) % 7200000000L // within 2h
      (i, us, if (i % 7 == 0) 1.0 else 0.0)
    } ++ Seq(
      // hand-placed boundary cases against interval id=1000 below
      (2000L, base + 600000000L, 0.0), // == interval start: counted
      (2001L, base + 659999999L, 0.0), // last us inside: counted
      (2002L, base + 660000000L, 0.0), // == exclusive end: NOT counted
      (1000L, base + 600000000L, 1.0)) // the interval's own point event
    val ev = rows.toDF("event_id", "us", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("value"))
    val out = graft.ops.Temporal
      .overlapCounts(ev, ev.filter(col("value") >= 1.0), 60000000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force over the same rows
    val ivs = rows.filter(_._3 >= 1.0).map(_._2)
    val expected = rows.map { case (id, us, _) =>
      id -> ivs.count(i => us >= i && us < i + 60000000L).toLong
    }.toMap
    assert(out == expected)
    assert(out(2000L) >= 1L && out(2001L) >= 1L)
    assert(out(2002L) == expected(2002L))
    assert(out(1000L) >= 1L, "an incident's own point is inside its window")
    assert(out.size == rows.size, "left semantics: zero-overlap rows kept")
  }

  test("editDistancePairs finds exactly the distance<=1 pairs") {
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "ab"), (4L, "xyz"),
        (5L, "abc"))
      .toDF("id", "name")
    val out = graft.ops.Dedup.editDistancePairs(df, "name", "id")
      .select("id_a", "id_b", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L),
      (1L, 5L, 0L), (2L, 5L, 1L), (3L, 5L, 1L)), s"got $out")
  }

  test("deletion-neighborhood blocking is COMPLETE for edit distance <= 1: " +
      "blocked pairs equal the brute-force levenshtein join on a " +
      "generated mutation corpus (the q97/q118 oracle independence check)") {
    // since round 8 the q97/q118 DuckDB oracles use the SAME blocking
    // rule (the closure/brute-force forms were infeasible at sf0.1), so
    // THIS is the independent completeness certificate: every
    // substitution / insertion / deletion / equality pair a quadratic
    // scan finds, the blocked form must find too
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1)(i => i)
      for (j <- 1 to b.length) {
        var prev = d(0); d(0) = j
        for (i <- 1 to a.length) {
          val t = d(i)
          d(i) = math.min(math.min(d(i) + 1, d(i - 1) + 1),
            prev + (if (a(i - 1) == b(j - 1)) 0 else 1))
          prev = t
        }
      }
      d(a.length)
    }
    // deterministic mutation corpus: seeds + every mutation class at
    // every position, plus unrelated strings and cross-seed near-misses
    val seeds = Seq("customer01", "customer02", "custommer1", "x", "ab")
    val alphabet = "c1z"
    val mutated = seeds.flatMap { w =>
      val subs = for (i <- w.indices; c <- alphabet)
        yield w.updated(i, c)
      val dels = w.indices.map(i => w.take(i) + w.drop(i + 1))
      val ins = for (i <- 0 to w.length; c <- alphabet)
        yield w.take(i) + c + w.drop(i)
      Seq(w) ++ subs ++ dels ++ ins
    }.distinct
      // the operator (and its oracle's len > 0 mirror) EXCLUDES empty
      // strings by contract — an empty name is within distance 1 of
      // every 1-char name, which is noise, so completeness is claimed
      // for non-empty strings only (deleting the "x" seed makes one)
      .filter(_.nonEmpty)
    val rows = mutated.zipWithIndex.map { case (wrd, i) => (i.toLong, wrd) }
    val blocked = graft.ops.Dedup.editDistancePairs(
        rows.toDF("id", "name"), "name", "id")
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = (for {
      (a, ia) <- rows; (b, ib) <- rows
      if a < b && lev(ia, ib) <= 1
    } yield (a, b)).toSet
    assert(brute.nonEmpty && brute.size > 100, s"fixture too weak: ${brute.size}")
    assert(blocked == brute,
      s"missed=${(brute -- blocked).take(5)} extra=${(blocked -- brute).take(5)}")
  }

  test("q94 recursive hierarchy: depth = digits-1, root = leading digit") {
    val out = Stats.q94RecursiveHierarchy(spark, TestSpark.sfDir).collect()
    // contiguous keys 0..1499: every ancestor exists, so all rows resolve
    assert(out.length == 1500, s"all keys resolve, got ${out.length}")
    out.foreach { r =>
      val k = r.getLong(0); val root = r.getLong(1); val depth = r.getLong(2)
      assert(depth == k.toString.length - 1, s"depth of $k")
      assert(root == k.toString.take(1).toLong, s"root of $k")
    }
  }

  test("q98 full-outer reconcile: presence tags match the zero sides") {
    val out = Stats.q98FullOuterReconcile(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (no, ne, p) = (r.getLong(1), r.getLong(2), r.getString(3))
      p match {
        case "orders_only" => assert(no > 0 && ne == 0)
        case "events_only" => assert(no == 0 && ne > 0)
        case "both" => assert(no > 0 && ne > 0)
      }
    }
    // the corpus has customers without events — the full-outer must keep them
    assert(out.exists(_.getString(3) == "orders_only"))
  }

  test("q99 dense grid covers every (region, priority) cell exactly once") {
    val out = Stats.q99DenseGrid(spark, TestSpark.sfDir)
    val regions = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "region").count()
    val prios = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "orders")
      .select("o_orderpriority").distinct().count()
    assert(out.count() == regions * prios)
    assert(out.select("r_name", "o_orderpriority").distinct().count()
      == regions * prios)
  }

  test("q93 HLL weekly estimates sit inside the sketch error envelope") {
    // the registered query folds the envelope into an est_ok boolean the
    // oracle pins TRUE; assert it here too, plus the RAW estimate
    // envelope at the operator level (hllSketchBuckets/hllRollup)
    val out = graft.ops.Analytics.q93HllWeeklyUsers(spark, TestSpark.sfDir)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2), s"estimate outside the 5% envelope: $r")
    }
    val e = graft.sources.TableCatalog.load(spark, TestSpark.sfDir, "events")
    val weekly = graft.ops.Analytics.hllRollup(
      graft.ops.Analytics.hllSketchBuckets(e,
        date_trunc("day", col("ts")), col("user_id")),
      date_trunc("week", col("bucket")))
    val exact = e.groupBy(date_trunc("week", col("ts")).as("grain"))
      .agg(countDistinct(col("user_id")).as("exact"))
    weekly.join(exact, "grain").collect().foreach { r =>
      val est = r.getLong(1).toDouble
      val ex = r.getLong(2)
      assert(math.abs(est - ex) / math.max(ex, 1L) < 0.1,
        s"HLL estimate outside 10% envelope: $r")
    }
  }

  test("q89 embedding stats: norms are 1 (normalized corpus), min<max") {
    val out = Stats.q89EmbeddingStats(spark, TestSpark.sfDir)
    val bad = out.filter(abs(col("norm") - 1.0) > 1e-3).count()
    assert(bad == 0, s"$bad vectors with non-unit norm")
    assert(out.filter(col("min_c") >= col("max_c")).count() == 0)
  }

  test("grouped regression recovers slope/intercept and matches built-ins") {
    // corpus: agree with Spark's covariance/variance-derived OLS
    val out = Stats.q132GroupRegression(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    val ref = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "lineitem")
      .groupBy("l_returnflag")
      .agg((covar_pop(col("l_quantity"), col("l_extendedprice")) /
        var_pop(col("l_quantity"))).as("slope"),
        avg(col("l_extendedprice")).as("my"),
        avg(col("l_quantity")).as("mx"))
      .collect()
      .map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2) - r.getDouble(1) * r.getDouble(3)))
      .toMap
    out.foreach { r =>
      val (s, i) = ref(r.getString(0))
      assert(math.abs(r.getDouble(2) - s) < 1e-4, s"slope ${r.getString(0)}")
      assert(math.abs(r.getDouble(3) - i) < 1e-2,
        s"intercept ${r.getString(0)}")
    }
  }


  test("exactQuantile == the sort-based selection for several q, " +
      "ties included") {
    val values = ((1 to 400).map(_.toDouble) ++ Seq.fill(80)(250.0) ++
      Seq.fill(40)(17.5)).map(Tuple1(_))
    val df = values.toDF("x")
    val sorted = values.map(_._1).sorted
    for (q <- Seq(0.01, 0.25, 0.5, 0.9, 0.99, 1.0)) {
      val row = graft.ops.Stats.exactQuantile(df, "x", q, 25.0)
        .collect().head
      val n = sorted.length
      val k = math.max(1, math.ceil(q * n).toLong).toInt
      assert(row.getLong(0) == n && row.getLong(1) == k, s"q=$q")
      assert(row.getDouble(2) == sorted(k - 1),
        s"q=$q: ${row.getDouble(2)} vs ${sorted(k - 1)}")
    }
  }


  test("snapshotDiff counts adds/removes/changes with NULL-safe compares") {
    val base = Seq((1L, Some(10.0), "a"), (2L, Some(20.0), "b"),
      (3L, None: Option[Double], "c"), (4L, Some(40.0), "d"))
      .toDF("k", "v", "s")
    val next = Seq((1L, Some(10.0), "a"),     // unchanged
      (2L, Some(25.0), "b"),                  // changed value
      (3L, Some(30.0), "c"),                  // NULL -> value = changed
      (5L, Some(50.0), "e"))                  // added; 4 removed
      .toDF("k", "v", "s")
    val r = graft.ops.Temporal.snapshotDiff(base, next, "k", Seq("v", "s"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((1L, 1L, 2L, 1L)), r.toString)
  }

  test("nearestEvent ≡ brute-force nearest, ties resolve backward") {
    def ts(u: Int, m: Int) = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
      .plusSeconds(m.toLong)
    // deterministic pseudo-random layout incl. an exact tie at u=9:
    // purchase at t=20 with views at 10 and 30 → 'prev' wins
    val rows = (0 until 8).flatMap { u =>
      (0 until 12).map { i =>
        val typ = if ((u * 7 + i * 3) % 4 == 0) "purchase"
          else if ((u + i) % 3 == 0) "view" else "click"
        (u.toLong, ts(u, (i * 17 + u * 5) % 120), (u * 100 + i).toLong, typ)
      }
    } ++ Seq(
      (9L, ts(9, 10), 901L, "view"), (9L, ts(9, 20), 902L, "purchase"),
      (9L, ts(9, 30), 903L, "view"),
      (10L, ts(10, 5), 1001L, "purchase")) // no views at all → 'none'
    val df = rows.toDF("user_id", "ts", "event_id", "event_type")
    val out = graft.ops.Temporal.nearestEvent(df, "purchase", "view")
      .collect().map(r => r.getLong(1) ->
        (r.getString(2), Option(r.get(3)).map(_.asInstanceOf[Long]),
          Option(r.get(4)).map(_.asInstanceOf[Long]))).toMap
    // brute force on the driver
    val byUser = rows.groupBy(_._1)
    val expected = rows.filter(_._4 == "purchase").map { p =>
      val views = byUser(p._1).filter(_._4 == "view")
      if (views.isEmpty) p._3 -> (("none", None, None))
      else {
        def us(t: java.time.LocalDateTime) =
          t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
        val pUs = us(p._2)
        // mirror the window semantics: order by (ts, id); 'prev' is the
        // max (ts,id) struct strictly before the row in that order
        val (before, after) = views.partition(v =>
          us(v._2) < pUs || (us(v._2) == pUs && v._3 < p._3))
        val prev = before.sortBy(v => (us(v._2), v._3)).lastOption
        val next = after.sortBy(v => (us(v._2), v._3)).headOption
        (prev, next) match {
          case (Some(pv), nx) if nx.isEmpty ||
              pUs - us(pv._2) <= us(nx.get._2) - pUs =>
            p._3 -> (("prev", Some(pv._3), Some(pUs - us(pv._2))))
          case (_, Some(nx)) =>
            p._3 -> (("next", Some(nx._3), Some(us(nx._2) - pUs)))
          case _ => p._3 -> (("none", None, None))
        }
      }
    }.toMap
    assert(out == expected,
      out.toSeq.sortBy(_._1).zip(expected.toSeq.sortBy(_._1))
        .filter(p => p._1 != p._2).take(3).toString)
    assert(out(902L) == (("prev", Some(901L), Some(10000000L))))
    assert(out(1001L) == (("none", None, None)))
  }


  test("quantileNormalize aligns disjoint segment distributions onto " +
      "the global quantile grid") {
    // A occupies bins 0-1, B bins 2-3, 50 rows each — after calibration
    // both segments must land on the SAME normalized values {31, 63}
    val rows = (0 until 50).map(i => ("A", 3L)) ++
      (0 until 50).map(i => ("A", 19L)) ++
      (0 until 50).map(i => ("B", 35L)) ++
      (0 until 50).map(i => ("B", 51L))
    val df = rows.toDF("seg", "v")
    val out = graft.ops.Stats.quantileNormalize(df, "v", "seg", 16L)
      .groupBy("g", "norm_v").count()
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap
    assert(out == Map(("A", 31L) -> 50L, ("A", 63L) -> 50L,
      ("B", 31L) -> 50L, ("B", 63L) -> 50L), out.toString)
    // identity: a segment already distributed like the mix keeps its
    // own quantile ladder (maps to in-place bin edges)
    val same = ((0 until 50).map(_ => ("X", 3L)) ++
      (0 until 50).map(_ => ("Y", 3L))).toDF("seg", "v")
    val outSame = graft.ops.Stats.quantileNormalize(same, "v", "seg", 16L)
      .select("norm_v").distinct().collect().map(_.getLong(0)).toSeq
    assert(outSame == Seq(15L), outSame.toString)
  }

  test("psiDrift: mix-like segment ~0, shifted segment large, " +
      "matches a direct computation") {
    // seg "same" mirrors the global mix; seg "shift" sits 100 units away
    val rows = (0 until 400).map { i =>
      ("same", (i % 10) * 10.0)
    } ++ (0 until 400).map { i => ("shift", 100.0 + (i % 10) * 10.0) }
    val df = rows.toDF("seg", "v")
    val out = graft.ops.Stats.psiDrift(df, "v", "seg", 20.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getString(3))).toMap
    // each segment is exactly half the mass of every bin it occupies and
    // zero elsewhere — both drift hard against the pooled reference;
    // check the exact value for one segment against a direct calc
    val bins = 10 // v/20 ∈ {0..4} ∪ {5..9}
    def psi(cnt: Map[Long, Long], n: Long, ref: Map[Long, Long],
            nAll: Long): Double = {
      val b = bins * 0.5
      val terms = (0L until 10L).map { k =>
        val p = (cnt.getOrElse(k, 0L) + 0.5) / (n + b)
        val q = (ref.getOrElse(k, 0L) + 0.5) / (nAll + b)
        BigDecimal((p - q) * math.log(p / q))
          .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      }
      (terms.sum.toDouble * 1e6).round / 1e6
    }
    val same = (0L until 5L).map(k => k -> 80L).toMap
    val shift = (5L until 10L).map(k => k -> 80L).toMap
    val ref = (0L until 10L).map(k => k -> 80L).toMap
    assert(out("same")._1 == psi(same, 400, ref, 800),
      s"${out("same")} vs ${psi(same, 400, ref, 800)}")
    assert(out("shift")._1 == psi(shift, 400, ref, 800))
    assert(out("same")._2 == "act" && out("shift")._2 == "act")
    // a segment drawn AS the mix scores ~0 / stable
    val calm = ((0 until 400).map(i => ("a", (i % 10) * 10.0)) ++
      (0 until 400).map(i => ("b", (i % 10) * 10.0))).toDF("seg", "v")
    val calmOut = graft.ops.Stats.psiDrift(calm, "v", "seg", 20.0)
      .collect().map(r => r.getString(0) ->
        (r.getDouble(2), r.getString(3))).toMap
    assert(calmOut.values.forall(v => v._1 < 0.001 && v._2 == "stable"),
      calmOut.toString)
  }

  test("seasonalAnomalies: 2x spike day flagged; its weekday peers and " +
      "calm days stay quiet; expectation excludes the day itself") {
    val t0 = java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
    var id = 0L
    val rows = (0 until 28).flatMap { d =>
      val n = if (d == 9) 20 else 10 // Jan 10 doubles its Wednesday volume
      (0 until n).map { i =>
        id += 1
        (id, t0.plusDays(d.toLong).plusMinutes(i.toLong), 1L, "a", 0.0)
      }
    }
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = graft.ops.Temporal.seasonalAnomalies(df)
      .collect().map(r => r.getTimestamp(0).toLocalDateTime.getDayOfMonth ->
        (r.getDouble(3), r.getDouble(4), r.getBoolean(5))).toMap
    assert(out.size == 28)
    // spike day: LOO expectation is its three calm Wednesday peers (10)
    assert(out(10) == ((10.0, 2.0, true)), out(10).toString)
    // a calm Wednesday: expectation (10+10+20)/3 — the spike inflates the
    // baseline but not past the 2/3 low gate
    val peer = out(3)
    assert(peer._1 == 13.333333 && !peer._3, peer.toString)
    // every non-Wednesday day: expectation exactly 10, ratio 1, quiet
    assert(out.count(_._2._3) == 1, "exactly one anomaly")
  }

  test("linearInterpDaily: gap days sit on the line between neighbors, " +
      "observed days pass through, LOCF step bias gone") {
    def d(day: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, day, 0, 0))
    // observed days 1, 4, 5, 9 — gaps 2,3 (rising line) and 6,7,8 (falling)
    val daily = Seq((d(1), 100.0), (d(4), 400.0), (d(5), 500.0),
      (d(9), 100.0)).toDF("day", "v")
    val out = graft.ops.Stats.linearInterpDaily(daily, "day", "v")
      .collect().map(r => r.getTimestamp(0).toLocalDateTime.getDayOfMonth ->
        (r.getBoolean(1), r.getDouble(2))).toMap
    assert(out.size == 9)
    assert(out(1) == ((false, 100.0)) && out(4) == ((false, 400.0)) &&
      out(9) == ((false, 100.0)))
    assert(out(2) == ((true, 200.0)) && out(3) == ((true, 300.0)),
      out.toString)
    assert(out(6) == ((true, 400.0)) && out(7) == ((true, 300.0)) &&
      out(8) == ((true, 200.0)))
  }

  test("bootstrapCi: deterministic, ordered band that brackets the " +
      "full-sample mean and stays inside the data range") {
    val df = (1 to 400).map(i => (i.toLong, (i % 50) * 10.0))
      .toDF("id", "v")
    def run() = graft.ops.Stats
      .bootstrapCi(df, col("v"), col("id"), reps = 100).head
    val r1 = run(); val r2 = run()
    assert(r1 == r2, "seeded draw must be reproducible")
    val (lo, hi, mean) = (r1.getDouble(2), r1.getDouble(3),
      r1.getDouble(1))
    assert(r1.getLong(0) == 100L)
    assert(lo <= hi, r1.toString)
    // the 95% band must cover the point estimate of a well-behaved
    // sample and stay strictly inside the data's extremes
    assert(lo <= mean && mean <= hi, r1.toString)
    assert(lo > 0.0 && hi < 490.0, r1.toString)
  }

  test("timeWeightedAvg: duration-weighted by hand; single-event users " +
      "drop; burst of rapid updates does not drag the mean") {
    def ts(s: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusSeconds(s))
    val ev = Seq(
      // user 1: 10 held 10 s, then 20 held 30 s → (100+600)/40 = 17.5
      (1L, 1L, ts(0), "click", 10.0),
      (2L, 1L, ts(10), "click", 20.0),
      (3L, 1L, ts(40), "click", 5.0),
      // user 2: one event — no interval, must not appear
      (4L, 2L, ts(0), "click", 99.0),
      // user 3: value 100 held 99 s, then a 1-s burst of 0s — the row
      // mean would be ~33, the time-weighted mean stays near 100
      (5L, 3L, ts(0), "click", 100.0),
      (6L, 3L, ts(99), "click", 0.0),
      (7L, 3L, ts(100), "click", 0.0)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = graft.ops.Temporal.timeWeightedAvg(ev).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    assert(out.keySet == Set(1L, 3L))
    assert(out(1L) == ((2L, 40000000L, 17.5)), out(1L).toString)
    assert(out(3L) == ((2L, 100000000L, 99.0)), out(3L).toString)
  }

  test("bootstrapCi fails loudly when a replicate draws zero total " +
      "weight instead of silently shifting the order statistics") {
    // n=1: each replicate keeps the row with P = 1 - e^{-1}, so among
    // 100 deterministic hash-driven replicates some draw weight 0
    val one = Seq((1L, 42.0)).toDF("id", "v")
    val e = intercept[Exception] {
      graft.ops.Stats.bootstrapCi(one, col("v"), col("id")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++
        msgs(x.getCause))
    assert(msgs(e).exists(_.contains("zero-weight replicate")),
      e.toString)
  }

  test("timeWeightedAvg: a huge value held across a multi-year gap does " +
      "not wrap (cents cast to decimal BEFORE the duration multiply)") {
    def ts(d: java.time.LocalDateTime) = java.sql.Timestamp.valueOf(d)
    val t0 = java.time.LocalDateTime.of(2020, 1, 1, 0, 0)
    val t1 = t0.plusYears(3) // gap ~9.47e13 µs
    val ev = Seq(
      // 1e9 dollars = 1e11 cents; cents * gap_us ~ 9.5e24 >> 2^63
      (1L, 1L, ts(t0), "click", 1.0e9),
      (2L, 1L, ts(t1), "click", 1.0e9)
    ).toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = graft.ops.Temporal.timeWeightedAvg(ev).collect().head
    val gapUs = java.time.Duration.between(t0, t1).toNanos / 1000L
    assert(r.getLong(2) == gapUs)
    // constant series: the time-weighted mean is exactly the held value
    assert(r.getDouble(3) == 1.0e9, r.toString)
  }

  test("giniByGroup: hand-computed with ties; perfect equality is 0") {
    val df = Seq(
      ("a", 1L), ("a", 1L), ("a", 2L), // G = (2*9 - 4*4)/(3*4) = 1/6
      ("b", 5L), ("b", 5L), ("b", 5L)  // all equal -> 0
    ).toDF("g", "cents")
    val out = Stats.giniByGroup(df, "g", "cents").collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(out("a") == ((3L, 0.166667)), out("a").toString)
    assert(out("b") == ((3L, 0.0)), out("b").toString)
  }

  test("theilDecomposition: equal group has T_g=0; equal group means " +
      "zero the between terms; within_contrib = share * theil_g") {
    val df = Seq(
      ("a", 100L), ("a", 100L),        // T_a = 0
      ("b", 50L), ("b", 150L)          // T_b ~ 0.13081
    ).toDF("g", "cents")
    val rows = Stats.theilDecomposition(df, "g", "cents").collect()
    val m = rows.map(r => r.getString(0) ->
      (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val (shareA, tA, withinA, betweenA) = m("a")
    val (shareB, tB, withinB, betweenB) = m("b")
    assert(tA == 0.0 && withinA == 0.0, m("a").toString)
    // both groups hold 200 of 400 cents at the same mean -> between = 0
    assert(shareA == 0.5 && shareB == 0.5)
    assert(math.abs(betweenA) < 1e-6 && math.abs(betweenB) < 1e-6)
    assert(math.abs(tB - 0.130812) < 1e-4, tB.toString)
    assert(math.abs(withinB - shareB * tB) < 1e-6)
  }

  test("dailyAcf: a linear daily series is perfectly autocorrelated at " +
      "every lag; pair counts shrink by one per lag") {
    def d(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(i.toLong))
    val orders = (0 until 40).map(i =>
      (i.toLong, i.toLong, "O", 100.0 + i, d(i), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
    val out = graft.ops.Stats.dailyAcf(orders).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == (1L to 7L).toSet)
    (1 to 7).foreach { k =>
      assert(out(k.toLong) == (((40 - k).toLong, 1.0)),
        s"k=$k: ${out(k.toLong)}")
    }
  }

  test("weightedQuantile: mass decides, not row count; zero-weight rows " +
      "can never be the answer; unit weights reduce to exactQuantile") {
    val df = Seq((1.0, 1L), (2.0, 1L), (2.5, 0L), (3.0, 10L))
      .toDF("v", "w")
    // W=12, k=6; cum mass 1,2,12 -> the 6th unit sits at v=3
    val r = Stats.weightedQuantile(df, "v", "w", 0.5, 1.0).head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) == ((12L, 6L, 3.0)),
      r.toString)
    // unit weights: weighted k-th = plain k-th order statistic
    val u = Seq(10.0, 20.0, 30.0, 40.0).map((_, 1L)).toDF("v", "w")
    val rw = Stats.weightedQuantile(u, "v", "w", 0.5, 7.0).head
    val re = Stats.exactQuantile(u.select(col("v")), "v", 0.5, 7.0).head
    assert(rw.getDouble(2) == re.getDouble(2) && rw.getDouble(2) == 20.0)
  }

  test("coherentSlice: FK chains stay intact — child keep-counts are " +
      "exact multiples of the sampled roots; root rate lands near 1/16") {
    val cust = (1L to 1000L).toDF("c_custkey")
    val ords = (1L to 1000L).flatMap(c => Seq(c * 10, c * 10 + 1)
      .map(o => (o, c))).toDF("o_orderkey", "o_custkey")
    val li = ords.select(col("o_orderkey")).as[Long].collect()
      .flatMap(o => Seq((o, 1), (o, 2))).toSeq
      .toDF("l_orderkey", "l_linenumber")
    val out = graft.ops.Corpus.coherentSlice(cust, ords, li, 1.0 / 16.0)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val kc = out("customer")._2
    assert(out("customer")._1 == 1000L)
    assert(out("orders") == ((2000L, kc * 2)), out.toString)
    assert(out("lineitem") == ((4000L, kc * 4)), out.toString)
    assert(kc > 20 && kc < 150, s"1/16 of 1000 wildly off: $kc")
  }

  test("property: giniByGroup equals the sorted rank-sum formula, is " +
      "scale-invariant, and stays in [0, 1)") {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(25, Gen.choose(1L, 500L))
    (1 to 5).foreach { seed =>
      val xs = gen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed * 104729L))
        .getOrElse(sys.error("gen failed"))
      def gini(vals: Seq[Long]): Double = {
        val out = Stats.giniByGroup(
          vals.map(("g", _)).toDF("g", "cents"), "g", "cents")
          .collect().head
        out.getDouble(3)
      }
      val g = gini(xs)
      // direct formula on the sorted list, in exact integers up to the
      // same single double divide (ties share values, so any consistent
      // order gives the same sum)
      val s = xs.sorted
      val n = s.size
      val num = s.zipWithIndex.map { case (x, i) =>
        BigInt(2L * (i + 1) - n - 1) * x }.sum
      val den = BigInt(n) * s.sum
      val direct = BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(g == direct, s"seed $seed: $g vs $direct")
      assert(g >= 0.0 && g < 1.0, g.toString)
      assert(gini(xs.map(_ * 7)) == g, "scale invariance")
    }
  }

  test("property: Theil decomposition is additive — within + between " +
      "contributions reconstruct the pooled Theil on random data") {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(30,
      Gen.zip(Gen.oneOf("a", "b", "c"), Gen.choose(1L, 400L)))
    (1 to 5).foreach { seed =>
      val rows = gen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed * 2147483647L))
        .getOrElse(sys.error("gen failed"))
      val out = Stats.theilDecomposition(
        rows.toDF("g", "cents"), "g", "cents").collect()
      val total = out.map(r => r.getDouble(4) + r.getDouble(5)).sum
      // direct pooled Theil T = (1/n) sum (x/mu) ln(x/mu)
      val xs = rows.map(_._2.toDouble)
      val mu = xs.sum / xs.size
      val direct = xs.map(x => (x / mu) * math.log(x / mu)).sum / xs.size
      assert(math.abs(total - direct) < 1e-4,
        s"seed $seed: $total vs $direct")
      // every group's internal Theil is nonnegative (Jensen)
      out.foreach(r => assert(r.getDouble(3) >= -1e-9, r.toString))
    }
  }

  test("property: weightedQuantile equals the brute-force weighted " +
      "order statistic on random data") {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(30,
      Gen.zip(Gen.choose(0, 200), Gen.choose(0L, 5L)))
    (1 to 5).foreach { seed =>
      val rows = gen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed * 15485863L))
        .getOrElse(sys.error("gen failed"))
        .map { case (v, w) => (v.toDouble, w) }
      val wtot = rows.map(_._2).sum
      if (wtot > 0) {
        for (q <- Seq(0.1, 0.5, 0.9)) {
          val r = Stats.weightedQuantile(
            rows.toDF("v", "w"), "v", "w", q, 13.0).head
          val k = math.max(1L, math.ceil(q * wtot).toLong)
          val expect = rows.filter(_._2 > 0).sortBy(_._1)
            .scanLeft((0.0, 0L)) { case ((_, c), (v, w)) => (v, c + w) }
            .drop(1).find(_._2 >= k).get._1
          assert(r.getDouble(2) == expect,
            s"seed $seed q=$q: ${r.getDouble(2)} vs $expect")
        }
      }
    }
  }

  test("cupedReadout: an outcome perfectly predicted by the pre-period " +
      "gives theta=2, full variance reduction, and identical adjusted " +
      "means across arms") {
    def d(s: String) = java.sql.Timestamp.valueOf(s + " 00:00:00")
    val rows = (1L to 200L).flatMap { c =>
      val p = (c % 37 + 1) * 10.0
      Seq((c, d("1995-06-01"), p),      // pre-period
        (c, d("1996-06-01"), 2.0 * p))  // outcome = exactly 2x pre
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = graft.ops.Stats.cupedReadout(rows, "1996-01-01 00:00:00")
      .collect()
    assert(out.length == 2)
    out.foreach { r =>
      assert(r.getDouble(5) == 2.0, s"theta: $r")
      assert(r.getDouble(6) == 1.0, s"rho2: $r")
    }
    // the raw post means differ between arms (different customers), the
    // adjusted means agree exactly: CUPED removed all explained variance
    assert(out(0).getDouble(4) == out(1).getDouble(4),
      out.mkString(", "))
    assert(out(0).getDouble(3) != out(1).getDouble(3),
      "arms should differ pre-adjustment for the test to mean anything")
  }

  test("seasonalIndex: a 12-periodic spike detrends to exact indices — " +
      "the 2x12 MA weighs every calendar month 1/12 at any position") {
    def d(y: Int, m: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(y, m, 15, 0, 0))
    val orders = (for (y <- 2000 to 2002; m <- 1 to 12)
      yield (y.toLong * 100 + m, d(y, m),
        if (m == 12) 24.0 else 12.0))
      .toDF("o_custkey", "o_orderdate", "o_totalprice")
    val out = graft.ops.Stats.seasonalIndex(orders).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out.keySet == (1L to 12L).toSet)
    // MA is exactly (11*1200 + 2400)/12 = 1300 cents at EVERY interior
    // month; Dec ratio 2400/1300, others 1200/1300
    (1L to 11L).foreach(m =>
      assert(out(m) == ((2L, 0.923077)), s"month $m: ${out(m)}"))
    assert(out(12L) == ((2L, 1.846154)), out(12L).toString)
  }

  test("dailyXcorr: a follower that exactly replays the driver 3 days " +
      "late peaks at lag 3 with correlation 1.0") {
    def d(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(i.toLong))
    def v(i: Int) = ((i * 37) % 101 + 1).toDouble
    val driver = (0 until 60).map(i => (d(i), v(i)))
      .toDF("dday", "dval")
    val follower = (3 until 63).map(i => (d(i), v(i - 3)))
      .toDF("fday", "fval")
    val out = graft.ops.Stats.dailyXcorr(
      driver, col("dday"), col("dval"),
      follower, col("fday"), col("fval"), maxLag = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(3L) == 1.0, out.toString)
    (0 to 7).filter(_ != 3).foreach(l =>
      assert(out(l.toLong) < 0.999, s"lag $l: ${out(l.toLong)}"))
  }

  test("cycleTimeHistogram: hand histogram, cumulative shares, and " +
      "rank-threshold percentile marks") {
    def d(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(i.toLong))
    val gaps = Seq(1, 1, 2, 2, 2, 3, 4, 5, 6, 10)
    val orders = Seq((1L, d(0))).toDF("o_orderkey", "o_orderdate")
    val li = gaps.zipWithIndex.map { case (g, i) => (1L, i, d(g)) }
      .toDF("l_orderkey", "l_linenumber", "l_shipdate")
    val out = graft.ops.Insights.cycleTimeHistogram(li, orders).collect()
    val byDay = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2))).toMap
    assert(byDay(1L) == ((2L, 0.2)) && byDay(2L) == ((3L, 0.5)) &&
      byDay(10L) == ((1L, 1.0)), byDay.toString)
    // k50 = 5 -> day 2; k90 = 9 -> day 6; k99 = ceil(9.9) = 10 -> day 10
    val r0 = out.head
    assert((r0.getLong(3), r0.getLong(4), r0.getLong(5)) ==
      ((2L, 6L, 10L)), r0.toString)
  }

  test("purchaseCadence: hand gaps — histogram, cumulative share, MLE " +
      "rate and the exponential readout vs the empirical share") {
    def d(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusDays(i.toLong))
    // customer 1 orders at days 0,10,20 -> gaps 10,10
    // customer 2 orders at days 0,40   -> gap 40
    val orders = Seq((1L, 1L, d(0)), (1L, 2L, d(10)), (1L, 3L, d(20)),
      (2L, 4L, d(0)), (2L, 5L, d(40)))
      .toDF("o_custkey", "o_orderkey", "o_orderdate")
    val out = graft.ops.Temporal.purchaseCadence(orders).collect()
    val m = out.map(r => r.getLong(0) ->
      (r.getLong(1), r.getDouble(2))).toMap
    assert(m(10L) == ((2L, 0.666667)) && m(40L) == ((1L, 1.0)),
      m.toString)
    val r0 = out.head
    // lambda = 3/60 = 0.05; model P(<=30) = 1 - e^-1.5; empirical 2/3
    assert(r0.getDouble(3) == 0.05, r0.toString)
    val expect = BigDecimal(1.0 - math.exp(-30.0 * 0.05))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r0.getDouble(4) == expect, r0.toString)
    assert(r0.getDouble(5) == 0.666667, r0.toString)
  }

  test("property: kaplanMeier matches a direct product-limit " +
      "computation on random lifetime/censoring patterns") {
    import org.scalacheck.Gen
    def d(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2020, 1, 1, 0, 0).plusDays(i.toLong))
    val gen = Gen.listOfN(40, Gen.choose(0, 200))
    (1 to 4).foreach { seed =>
      val lasts = gen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed * 6700417L))
        .getOrElse(sys.error("gen failed"))
      val df = lasts.zipWithIndex.flatMap { case (last, i) =>
        Seq((i.toLong, d(0)), (i.toLong, d(last)))
      }.toDF("k", "ts")
      val out = graft.ops.Temporal.kaplanMeier(df, "k", "ts")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getDouble(4)))
      // direct computation in plain Scala with the same censor rule
      val mx = lasts.max
      val subjects = lasts.map(l => (l.toLong, (mx - l) > 90))
      val byDay = subjects.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (t, xs) =>
          (t, xs.count(_._2).toLong, xs.count(!_._2).toLong) }
      var atRisk = subjects.size.toLong
      var logS = 0.0
      val expect = byDay.flatMap { case (t, dd, cc) =>
        val row = if (dd > 0) {
          logS += math.log((atRisk - dd).toDouble / atRisk)
          val s = BigDecimal(math.exp(logS))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
          Some((t, atRisk, dd, cc, s))
        } else None
        atRisk -= dd + cc
        row
      }
      assert(out.toSeq == expect, s"seed $seed:\n${out.toSeq}\n$expect")
    }
  }

  test("kaplanMeier: hand-computed product-limit curve with censoring") {
    def d(i: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2020, 1, 1, 0, 0).plusDays(i.toLong))
    // A,B churn at lifetime 5, C churns at 8, D runs to the horizon
    // (censored). S(5) = 1 - 2/4 = 0.5; S(8) = 0.5 * (1 - 1/2) = 0.25
    val df = Seq(
      (1L, d(0)), (1L, d(5)),
      (2L, d(2)), (2L, d(7)),
      (3L, d(0)), (3L, d(8)),
      (4L, d(0)), (4L, d(100))
    ).toDF("k", "ts")
    val out = graft.ops.Temporal.kaplanMeier(df, "k", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(out.toSeq == Seq((5L, 4L, 2L, 0L, 0.5), (8L, 2L, 1L, 0L, 0.25)),
      out.mkString(", "))
  }
}
