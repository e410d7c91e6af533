package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, Mining, Multimodal}

class MiningSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- q100 CMS

  test("CMS estimates never under-count and respect the eps*N envelope") {
    // the query itself emits the envelope as cms_ok; re-derive the raw
    // estimates here so the bound is checked against a direct probe too
    val li = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "lineitem")
    val sk = li
      .agg(expr("count_min_sketch(l_partkey, 0.0001d, 0.99d, 42)").as("sk"))
      .head().getAs[Array[Byte]](0)
    val out = Mining.q100CmsHeavyHitters(spark, TestSpark.sfDir)
      .withColumn("cms_est",
        graft.functions.cmsEstimate(sk, col("l_partkey")))
      .collect()
      .map(r => (r.getLong(1), r.getBoolean(2), r.getLong(3)))
    assert(out.length == 20)
    val envelope = math.ceil(1e-4 * li.count()).toLong
    out.foreach { case (exact, ok, est) =>
      assert(est >= exact, s"CMS under-counted: $est < $exact")
      assert(est <= exact + envelope,
        s"CMS over-envelope: $est > $exact + $envelope")
      assert(ok, s"cms_ok false for exact=$exact est=$est")
    }
  }

  test("cmsEstimate probes a hand-built sketch exactly (no collisions)") {
    val df = Seq.fill(7)(42L).map(Tuple1(_)).toDF("k")
      .union(Seq.fill(3)(99L).map(Tuple1(_)).toDF("k"))
    val sk = df.agg(expr("count_min_sketch(k, 0.001d, 0.99d, 1)"))
      .head().getAs[Array[Byte]](0)
    val probed = Seq(42L, 99L, 7L).toDF("k")
      .select(col("k"), graft.functions.cmsEstimate(sk, col("k")).as("est"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(probed(42L) == 7L && probed(99L) == 3L && probed(7L) == 0L)
  }

  // ------------------------------------------- q107 perceptual-hash dedup

  test("byte-substitution edits stay within Hamming budget; banded join finds them") {
    // base payload + a copy with 2 bytes substituted + an unrelated payload
    val base = ("x" * 200).getBytes
    val near = base.clone(); near(10) = 'Y'; near(150) = 'Z'
    val other = Array.tabulate[Byte](200)(i => ((i * 37 + 11) % 251).toByte)
    val media = Seq(
      Multimodal.MediaRow(1L, "image/stub", base.length.toLong, base),
      Multimodal.MediaRow(2L, "image/stub", near.length.toLong, near),
      Multimodal.MediaRow(3L, "image/stub", other.length.toLong, other)
    ).toDS()
    val sigs = Multimodal.decodeSignatures(media).toDF()
    val byId = sigs.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(java.lang.Long.bitCount(byId(1L) ^ byId(2L)) <= 2,
      "2-byte edit must flip at most 2 signature bits")
    val pairs = Dedup.hammingBandPairs(sigs, "asset_id", "phash", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "near-dup pair not found")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "unrelated payload wrongly paired")
  }

  test("hammingBandPairs pigeonhole: distance exactly maxHamming is found") {
    // two signatures differing in 3 bits spread across 3 different bands
    val a = 0L
    val b = (1L << 0) | (1L << 16) | (1L << 32)
    val sigs = Seq((1L, a), (2L, b)).toDF("id", "sig")
    val pairs = Dedup.hammingBandPairs(sigs, "id", "sig", maxHamming = 3)
      .collect()
    assert(pairs.length == 1 && pairs.head.getInt(2) == 3)
    // and distance 4 across all four bands is correctly NOT a candidate
    val c = (1L << 0) | (1L << 16) | (1L << 32) | (1L << 48)
    val sigs2 = Seq((1L, a), (2L, c)).toDF("id", "sig")
    assert(Dedup.hammingBandPairs(sigs2, "id", "sig", 3).isEmpty)
  }

  test("q107 report form is one row per asset with non-negative neardup " +
      "counts; registered envelope pins the planted set") {
    val out = Mining.q107PhashReport(spark, TestSpark.sfDir)
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents").count()
    assert(out.count() == docs)
    assert(out.filter(col("n_neardup") < 0).isEmpty)
    val env = Mining.q107PhashNeardup(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getBoolean(1)))
    assert(env.length == 20 && env.forall(_._2),
      "identical-bytes plants detect deterministically at every SF")
  }

  // -------------------------------------------------- q109 approx top-k

  test("approx_top_k under capacity equals the exact group-by top-k") {
    val approx = Mining.q109ApproxTopk(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val exact = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "lineitem")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("l_suppkey")).limit(10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(approx == exact)
  }

  // ------------------------------------------------------- q101 / q102

  test("bigram familiarity: identical docs score the corpus-max familiarity") {
    val docs = Seq(
      (1L, "the quick brown fox"), (2L, "the quick brown fox"),
      (3L, "entirely novel content here")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")))
    docs.createOrReplaceTempView("t_fam")
    // run the operator body against a temp dir is heavier than needed:
    // recompute via the same public pieces
    val grams = docs.select(col("doc_id"),
      explode(graft.functions.wordNgrams(col("text"), 2)).as("gram"))
    val dfreq = grams.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val fam = grams.join(dfreq, "gram").groupBy(col("doc_id"))
      .agg((sum(col("df")) / count(lit(1))).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(fam(1L) == 2.0 && fam(2L) == 2.0 && fam(3L) == 1.0)
  }

  test("event transitions: shares partition to 1 and counts match pair total") {
    val out = Mining.q102EventTransitions(spark, TestSpark.sfDir)
      .collect()
    val totalShare = out.map(_.getDouble(3)).sum
    assert(math.abs(totalShare - 1.0) < 1e-3,
      s"shares should sum to ~1, got $totalShare")
    val nPairs = out.map(_.getLong(2)).sum
    val events = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "events")
    val users = events.select(col("user_id")).distinct().count()
    assert(nPairs == events.count() - users,
      "per-user chains of length n yield n-1 transitions")
  }

  // ------------------------------------------------- q103 / q104 sanity

  test("MAD outliers: planted extreme value is flagged, center is not") {
    val docs = (1L to 99L).map(i => (i, "en", 100L + (i % 3))) :+
      ((100L, "en", 5000L))
    val df = docs.toDF("doc_id", "lang", "n_chars")
    val med = df.groupBy("lang").agg(expr("median(n_chars)").as("med"))
    val j = df.join(broadcast(med), "lang")
    val mad = j.groupBy("lang")
      .agg(expr("median(abs(n_chars - med))").as("mad"))
    val flagged = j.join(broadcast(mad), "lang")
      .filter(abs(col("n_chars") - col("med")) > lit(3) * col("mad"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged.contains(100L))
    assert(!flagged.contains(1L))
  }

  test("winsorize accounting: clip counts ~5% tails, winsor_total within band sums") {
    val out = Mining.q104Winsorize(spark, TestSpark.sfDir).collect()
    out.foreach { r =>
      val n = r.getLong(1); val lo = r.getLong(2); val hi = r.getLong(3)
      assert(lo <= math.ceil(n * 0.05).toLong + 1)
      assert(hi <= math.ceil(n * 0.05).toLong + 1)
      val p05 = r.getDouble(4); val p95 = r.getDouble(5)
      assert(p05 <= p95)
      val within = r.getDouble(6); val total = r.getDouble(7)
      // winsorized total replaces each clipped row by its clamp value
      assert(total >= within + lo * p05 + hi * p95 - 0.01 &&
        total <= within + lo * p05 + hi * p95 + 0.01)
    }
  }

  // ------------------------------------------------------- q105 / q106

  test("tombstone cascade: deletions are consistent across the FK chain") {
    val rows = Mining.q105TombstoneCascade(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.values.foreach { case (before, del, after) =>
      assert(after == before - del && del >= 0 && after >= 0)
    }
    // cascade monotonicity: deleting a customer cohort deletes at least
    // one order per deleted customer on this fixture only if orders exist;
    // weaker invariant that always holds: if no customers deleted, no
    // orders deleted
    if (rows("customer")._2 == 0) assert(rows("orders")._2 == 0)
  }

  test("partial-agg rollup equals direct weekly aggregation exactly") {
    val rolled = Mining.q106PartialAggRollup(spark, TestSpark.sfDir)
    val li = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "lineitem")
    val direct = li
      .groupBy(date_trunc("week", to_date(col("l_shipdate")))
        .cast("date").as("week"), col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,4)")).cast("double")
          .as("sum_qty"))
    assert(rolled.exceptAll(direct).isEmpty &&
      direct.exceptAll(rolled).isEmpty)
  }

  // ------------------------------------------------------------- q108

  // ------------------------------------------------------ q116 / q117

  test("vocab coverage: rates in [0,1]; every doc audited") {
    val out = Mining.q116VocabCoverage(spark, TestSpark.sfDir)
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents").count()
    assert(out.count() == docs)
    assert(out.filter(col("oov_rate") < 0 || col("oov_rate") > 1).isEmpty)
    assert(out.filter(col("n_oov") > col("n_tokens")).isEmpty)
  }

  test("moments aggregator matches direct covariance on a tiny matrix") {
    val xs = Seq(Array(1.0, 2.0), Array(3.0, 5.0), Array(5.0, 4.0))
    val ds = xs.toDF("e").select(col("e")).as[Array[Double]]
    val s = ds.select(new graft.functions.EmbeddingMoments(2).toColumn)
      .head()
    val cov = graft.functions.EmbeddingMoments.covariance(s, 2)
    // direct: mean = (3, 11/3); population covariance
    val mx = 3.0; val my = 11.0 / 3
    val cxx = xs.map(a => (a(0) - mx) * (a(0) - mx)).sum / 3
    val cxy = xs.map(a => (a(0) - mx) * (a(1) - my)).sum / 3
    assert(math.abs(cov(0)(0) - cxx) < 1e-9)
    assert(math.abs(cov(0)(1) - cxy) < 1e-9)
    assert(cov(0)(1) == cov(1)(0))
  }

  test("power iteration recovers a planted principal direction") {
    // points spread along (1,1)/√2 with small orthogonal noise
    val pts = (0 until 200).map { i =>
      val t = (i - 100) / 10.0
      val noise = ((i * 37 % 11) - 5) / 50.0
      Array(t + noise, t - noise)
    }
    val ds = pts.toDF("e").select(col("e")).as[Array[Double]]
    val s = ds.select(new graft.functions.EmbeddingMoments(2).toColumn)
      .head()
    val cov = graft.functions.EmbeddingMoments.covariance(s, 2)
    val eig = graft.functions.EmbeddingMoments.topEigenvectors(cov, 2)
    val v1 = eig.head._2
    val alignment = math.abs(v1(0) * 1 + v1(1) * 1) / math.sqrt(2)
    assert(alignment > 0.99, s"v1 = ${v1.toSeq}, alignment $alignment")
    assert(eig(0)._1 >= eig(1)._1, "eigenvalues must be ordered")
  }

  test("q117 PCA projection: pc1 variance dominates pc2 (raw form); the " +
      "registered envelope's booleans hold on every row") {
    // the RAW (bench) form carries the coordinates — the independent
    // recomputation of the envelope's var_order claim
    val raw = Mining.q117PcaProjection(spark, TestSpark.sfDir).collect()
    assert(raw.length == 500)
    def varOf(xs: Seq[Double]): Double = {
      val m = xs.sum / xs.size
      xs.map(x => (x - m) * (x - m)).sum / xs.size
    }
    val v1 = varOf(raw.map(_.getDouble(2)).toSeq)
    val v2 = varOf(raw.map(_.getDouble(3)).toSeq)
    assert(v1 >= v2 - 1e-9, s"pc1 var $v1 < pc2 var $v2")
    val env = Mining.q117PcaEmbeddings(spark, TestSpark.sfDir).collect()
    assert(env.length == 500)
    assert(env.forall(r => r.getBoolean(2) && r.getBoolean(3)),
      "var_order_ok/bessel_ok must hold on every row")
  }

  test("theta set algebra in exact mode equals exact distinct-set algebra") {
    val out = Mining.q121ThetaAudienceOverlap(spark, TestSpark.sfDir)
      .collect()
    assert(out.nonEmpty)
    val u = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "events")
      .select(col("event_type"), col("user_id")).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val (ta, tb) = (r.getString(0), r.getString(1))
      val (sa, sb) = (u(ta), u(tb))
      assert(r.getLong(2) == sa.size && r.getLong(3) == sb.size)
      assert(r.getLong(4) == (sa & sb).size, s"intersection $ta/$tb")
      assert(r.getLong(5) == (sa | sb).size, s"union $ta/$tb")
    }
  }

  test("rolling 7-day distinct from theta day-sketches equals exact") {
    val out = Mining.q125RollingDistinct(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    val du = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect().map(r => r.getDate(0).toLocalDate -> r.getLong(1))
    val byDay = du.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      val d = r.getDate(0).toLocalDate
      val window = byDay.view
        .filterKeys(k => !k.isBefore(d.minusDays(6)) && !k.isAfter(d))
        .values.foldLeft(Set.empty[Long])(_ ++ _)
      assert(r.getLong(1) == byDay(d).size, s"n_day at $d")
      assert(r.getLong(2) == window.size, s"n_7d at $d")
      assert(r.getLong(2) >= r.getLong(1))
    }
  }

  test("PMI co-occurrence matches a brute-force recompute") {
    val out = Mining.q126PmiCooccur(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    val docToks = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
      .select("text").collect()
      .map(_.getString(0).toLowerCase.split("\\W+").filter(_.nonEmpty).toSet)
    val nDocs = docToks.length
    val df_ = docToks.flatten.groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val vocab = df_.toSeq.sortBy { case (tok, d) => (-d, tok) }
      .take(40).map(_._1).toSet
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    docToks.foreach { toks =>
      val vt = toks.intersect(vocab).toSeq.sorted
      for (i <- vt.indices; j <- i + 1 until vt.size)
        pairCounts((vt(i), vt(j))) =
          pairCounts.getOrElse((vt(i), vt(j)), 0L) + 1
    }
    assert(out.length == pairCounts.count(_._2 >= 5), "pair completeness")
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(pairCounts((a, b)) == r.getLong(2), s"n_ab for ($a,$b)")
      val pmi = math.log(
        r.getLong(2).toDouble * nDocs / (df_(a).toDouble * df_(b)))
      assert(math.abs(pmi - r.getDouble(3)) < 1e-6, s"pmi for ($a,$b)")
    }
  }

  test("pageRank: ranks are a distribution; sinks and cycles behave") {
    import spark.implicits._
    // symmetric 3-cycle → uniform ranks
    val cyc = Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L))
      .toDF("src", "dst", "w")
    val rc = ops.Mining.pageRank(cyc, "src", "dst", "w")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rc.values.forall(v => math.abs(v - 1.0 / 3) < 1e-9),
      s"cycle must be uniform: $rc")
    // a -> b (b dangling): b must outrank a, ranks sum to ~1
    val chain = Seq(("a", "b", 1L)).toDF("src", "dst", "w")
    val rh = ops.Mining.pageRank(chain, "src", "dst", "w")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rh("b") > rh("a"), s"sink must accumulate rank: $rh")
    assert(math.abs(rh.values.sum - 1.0) < 1e-6,
      s"dangling redistribution must conserve mass: $rh")
    // corpus query: a proper distribution over event types
    val out = Mining.q130EventPagerank(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getDouble(1) > 0))
    assert(math.abs(out.map(_.getDouble(1)).sum - 1.0) < 1e-4)
  }

  test("pageRank local fast path is bit-equal to the distributed loop") {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val edges = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("dst_t"))
      .withColumn("src_t", lag(col("dst_t"), 1).over(w))
      .filter(col("src_t").isNotNull)
      .groupBy(col("src_t"), col("dst_t"))
      .agg(count(lit(1)).as("cnt"))
    val local = ops.Mining.pageRank(edges, "src_t", "dst_t", "cnt")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val dist = ops.Mining
      .pageRank(edges, "src_t", "dst_t", "cnt", driverMaxEdges = 0)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(local.keySet == dist.keySet)
    local.foreach { case (k, v) =>
      assert(v == dist(k), s"path divergence at $k: local $v vs ${dist(k)}")
    }
  }

  test("KLL quantile bands stay inside the rank-error envelope of exact") {
    // the entry's own q±0.05 envelope booleans hold on every row
    val bands = Mining.q122KllQuantileBands(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3))).toMap
    assert(bands.size == 4 && bands.contains("ALL"))
    bands.foreach { case (flag, (a, b, c)) =>
      assert(a && b && c, s"$flag envelope: $a $b $c")
    }
    // and the raw merged-ALL estimates sit within the tighter rank-error
    // bound (KLL default k => eps ~ 1.7%)
    val li = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "lineitem")
    val raw = li
      .agg(expr("kll_sketch_agg_double(l_extendedprice)").as("sk"))
      .select(expr("kll_sketch_get_quantile_double(sk, " +
        "array(0.25D, 0.5D, 0.75D))").as("q"))
      .head.getSeq[Double](0)
    val eps = 0.03
    val n = li.count().toDouble
    for ((q, idx) <- Seq(0.25, 0.5, 0.75).zipWithIndex) {
      val est = raw(idx)
      val rank = li.filter(col("l_extendedprice") <= est).count() / n
      assert(math.abs(rank - q) <= eps, s"ALL p$q: est $est rank $rank")
    }
  }

  test("rewritePartitions replaces touched partitions, preserves the rest") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rewrite").toString
    val base = Seq(("d1", 1L), ("d1", 2L), ("d2", 3L), ("d3", 4L))
      .toDF("day", "id")
    graft.sources.TableCatalog
      .writePartitioned(base, dir, "t", Seq("day"))
    val updates = Seq(("d2", 30L), ("d2", 31L)).toDF("day", "id")
    graft.sources.TableCatalog
      .rewritePartitions(updates, dir, "t", Seq("day"))
    val after = spark.read.parquet(s"$dir/t.parquet")
      .collect().map(r => (r.getAs[String]("day"), r.getAs[Long]("id")))
      .toSet
    assert(after == Set(("d1", 1L), ("d1", 2L), ("d2", 30L), ("d2", 31L),
      ("d3", 4L)), after.toString)
  }

  test("weighted sample: keep rate grows with weight band") {
    val out = Mining.q108WeightedSample(spark, TestSpark.sfDir)
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
    val kept = out.count().toDouble
    assert(kept > 0 && kept < docs.count())
    // documents near the cap (>=499 chars) keep at ~499/500; short docs
    // keep at ~n/500 — verify the aggregate keep rate sits between the
    // min and max per-row rates
    val rates = docs.select(
      (least(col("n_chars"), lit(499)) / 500.0).as("r"))
    val lo = rates.agg(min("r")).head().getDouble(0)
    val hi = rates.agg(max("r")).head().getDouble(0)
    val rate = kept / docs.count()
    assert(rate >= lo - 0.05 && rate <= hi + 0.05)
  }

  test("sourceKl: identical source distributions diverge zero; skew matches hand formula") {
    import spark.implicits._
    // both sources have p = {x: 1/2, y: 1/2} == corpus -> KL = 0 exactly
    val same = Seq(("a", "x y"), ("b", "y x")).toDF("source", "text")
    val kl0 = Mining.sourceKl(same, "source", "text")
      .select("kl_div").as[Double].collect()
    assert(kl0.forall(_ == 0.0))
    // a: {x:3/4, y:1/4}, b: {y:1}; corpus over 8 tokens: {x:3/8, y:5/8}
    val skew = Seq(("a", "x x x y"), ("b", "y y y y")).toDF("source", "text")
    val out = Mining.sourceKl(skew, "source", "text")
      .select("source", "kl_div").as[(String, Double)].collect().toMap
    def kl(ps: Seq[(Double, Double)]): Double =
      ps.map { case (p, q) => p * math.log(p / q) }.sum
    assert(math.abs(out("a") -
      kl(Seq((0.75, 3.0 / 8), (0.25, 5.0 / 8)))) < 1e-6)
    assert(math.abs(out("b") - kl(Seq((1.0, 5.0 / 8)))) < 1e-6)
  }

  test("sourceKl is non-negative across the corpus and totals reconcile") {
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
    val out = Mining.sourceKl(docs, "source", "text").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("kl_div") >= 0.0),
      "KL(source||corpus) must be non-negative")
    val totFromOut = out.map(_.getAs[Long]("n_tokens")).sum
    val totDirect = docs.select(
      sum(size(graft.functions.wordTokens(col("text")))).cast("long"))
      .head().getLong(0)
    assert(totFromOut == totDirect)
  }

  // ------------------------------------------------------------ q141 DSIR

  test("dsirWeights: target-like docs score higher; values match an " +
      "independent recompute") {
    val docs = Seq(
      (0L, "en", "alpha alpha beta gamma"),  // target
      (1L, "en", "alpha beta beta delta"),   // target
      (2L, "de", "omega omega psi chi"),     // raw-only vocabulary
      (3L, "de", "alpha alpha alpha beta"),  // raw doc in target vocab
      (4L, "de", "omega psi psi chi")
    ).toDF("doc_id", "lang", "text")
    val buckets = 64
    val out = graft.ops.Mining
      .dsirWeights(docs, col("lang") === "en", "text", buckets)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    // independent recompute: same md5-prefix bucketing, add-one LLR
    def bucket(tok: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(tok.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 4)
      java.lang.Long.parseLong(hex, 16) % buckets
    }
    val rows = Seq(
      (0L, true, "alpha alpha beta gamma"),
      (1L, true, "alpha beta beta delta"),
      (2L, false, "omega omega psi chi"),
      (3L, false, "alpha alpha alpha beta"),
      (4L, false, "omega psi psi chi"))
    val toks = rows.flatMap { case (id, t, s) =>
      s.split(" ").map(w => (id, t, bucket(w))) }
    val cAll = toks.groupBy(_._3).view.mapValues(_.size).toMap
    val cT = toks.filter(_._2).groupBy(_._3).view.mapValues(_.size).toMap
    val nAll = toks.size
    val nT = toks.count(_._2)
    def llr(b: Long): Double =
      math.log((cT.getOrElse(b, 0) + 1).toDouble / (nT + buckets)) -
        math.log((cAll(b) + 1).toDouble / (nAll + buckets))
    rows.foreach { case (id, _, s) =>
      val ws = s.split(" ").map(w => llr(bucket(w)))
      val expect = BigDecimal(ws.map(BigDecimal(_).setScale(12,
          BigDecimal.RoundingMode.HALF_UP)).sum.toDouble / ws.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (n, w) = out(id)
      assert(n == ws.length)
      assert(math.abs(w - expect) < 2e-6,
        s"doc $id weight $w != recomputed $expect")
    }
    // docs made of target vocabulary outscore raw-only-vocabulary docs,
    // regardless of their own lang label
    assert(out(0L)._2 > out(2L)._2 && out(3L)._2 > out(4L)._2)
  }

  // ----------------------------------------------------- q144 src overlap

  test("sourceOverlap: jaccard over vocabularies, disjoint pairs absent") {
    val docs = Seq(
      ("A", "x y z"), ("A", "x y"),     // vocab {x,y,z}
      ("B", "x y w"),                   // vocab {x,y,w}
      ("C", "p q")                      // vocab {p,q}
    ).toDF("source", "text")
    val out = Mining.sourceOverlap(docs, "source", "text")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // |A∩B|=2, |A∪B|=4 -> 0.5; C overlaps nothing -> no C rows at all
    assert(out == Map(("A", "B") -> ((2L, 0.5))), out.toString)
  }

  // ------------------------------------------------- q145 standardization

  test("standardizeEmbeddings: hand-computed z-scores, zero-variance " +
      "dim maps to 0") {
    val emb = Seq(
      (0L, Array(1.0f, 10.0f, 7.0f)),
      (1L, Array(2.0f, 10.0f, 7.0f)),
      (2L, Array(3.0f, 10.0f, 7.0f))).toDF("vec_id", "embedding")
    val out = graft.ops.Mining.standardizeEmbeddings(emb, "vec_id",
        "embedding")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out.size == 9)
    // dim 0: mean 2, population sd sqrt(2/3)
    val sd = math.sqrt(2.0 / 3.0)
    assert(math.abs(out((0L, 0L)) - (-1.0 / sd)) < 1e-6)
    assert(out((1L, 0L)) == 0.0)
    assert(math.abs(out((2L, 0L)) - (1.0 / sd)) < 1e-6)
    // dims 1 and 2 are constant -> z = 0 everywhere, not NaN
    (0L to 2L).foreach { id =>
      assert(out((id, 1L)) == 0.0 && out((id, 2L)) == 0.0)
    }
  }

  test("standardizeEmbeddings: corpus-wide per-dim moments land at " +
      "mean 0 / sd 1") {
    val emb = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "embeddings")
    val out = graft.ops.Mining.standardizeEmbeddings(emb, "vec_id",
      "embedding")
    val checks = out.groupBy($"pos")
      .agg(avg($"z").as("m"), stddev_pop($"z").as("sd"))
      .collect()
    assert(checks.nonEmpty)
    checks.foreach { r =>
      assert(math.abs(r.getDouble(1)) < 1e-4, s"dim ${r.get(0)} mean off")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-3, s"dim ${r.get(0)} sd off")
    }
  }

  test("embeddingOutliers: symmetric points tie, far point flags, " +
      "zero-variance dim contributes nothing") {
    val emb = Seq(
      (1L, Array(0.0f, 5.0f)), (2L, Array(2.0f, 5.0f)),
      (3L, Array(0.0f, 5.0f)), (4L, Array(2.0f, 5.0f)),
      (5L, Array(40.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    // flagSigma2 = 1.0: with n=5 points a lone outlier's z2 tops out
    // near n-1 < the default 2.0-per-dim threshold over 2 dims
    val out = graft.ops.Mining
      .embeddingOutliers(emb, "vec_id", "embedding", flagSigma2 = 1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getBoolean(3))).toMap
    // dim 1 is constant → sd 0 → contributes 0 to every score
    // dim 0: values 0,2,0,2,40 — direct replication of the engine math
    val xs = Seq(0.0, 2.0, 0.0, 2.0, 40.0)
    val m = xs.sum / 5
    val sd = math.sqrt(xs.map(x => x * x).sum / 5 - m * m)
    def score(x: Double) = {
      val z = (x - m) / sd
      (BigDecimal(z * z).setScale(12, BigDecimal.RoundingMode.HALF_UP)
        .toDouble * 1e6).round / 1e6
    }
    assert(out(1L) == ((2L, score(0.0), score(0.0) > 2.0)), out.toString)
    assert(out(1L) == out(3L) && out(2L) == out(4L))
    assert(out(5L)._2 == score(40.0) && out(5L)._3,
      "the far point must flag")
    assert(out(5L)._2 > out(1L)._2 && out(1L)._2 > out(2L)._2)
  }

  test("cmsCounterFrame: per-row counters conserve mass, buckets bounded") {
    val df = Seq(1L, 1L, 2L, 7L, 7L, 7L).toDF("k")
    val out = graft.ops.Mining.cmsCounterFrame(df, col("k"), depth = 4,
        width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    (0 until 4).foreach { d =>
      assert(out.filter(_._1 == d).map(_._3).sum == 6L,
        s"row $d loses mass")
    }
    assert(out.forall(r => r._2 >= 0 && r._2 < 64))
  }

  test("joinSizeEstimate: single shared key is exact; estimate never " +
      "under-counts on multi-key inputs") {
    // one key on both sides: only its own buckets carry counts, so the
    // inner product is exactly cA·cB in every hash row
    val a1 = Seq(5L, 5L, 5L).toDF("x")
    val b1 = Seq(5L, 5L).toDF("y")
    val r1 = graft.ops.Mining.joinSizeEstimate(a1, col("x"), b1, col("y"))
      .collect().head
    assert(r1.getLong(0) == 6L && r1.getLong(1) == 6L &&
      r1.getLong(2) == 0L && r1.getBoolean(4), r1.toString)
    // multi-key: Σ cA(k)·cB(k) = 2·1 + 1·2 = 4; CMS may over-count on
    // collisions but never under
    val a2 = Seq(1L, 1L, 2L, 3L).toDF("x")
    val b2 = Seq(1L, 2L, 2L, 9L).toDF("y")
    val r2 = graft.ops.Mining.joinSizeEstimate(a2, col("x"), b2, col("y"))
      .collect().head
    assert(r2.getLong(0) == 4L, r2.toString)
    assert(r2.getLong(1) >= 4L && r2.getBoolean(4))
    // disjoint key sets: exact size 0, estimate still >= 0
    val r3 = graft.ops.Mining.joinSizeEstimate(
        Seq(1L).toDF("x"), col("x"), Seq(2L).toDF("y"), col("y"))
      .collect().head
    assert(r3.getLong(0) == 0L && r3.getBoolean(4), r3.toString)
  }

  test("triangleCensus: hand-built graph — one triangle, a pendant " +
      "edge, and a below-support pair that must not become an edge") {
    // orders 1,2 both contain parts {1,2,3} -> edges 12,13,23 (w=2);
    // orders 3,4 contain {3,4} -> edge 34 (w=2);
    // order 5 contains {1,4} once -> below minSupport, no edge.
    val li = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L),
      (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 3L), (3L, 4L),
      (4L, 3L), (4L, 4L),
      (5L, 1L), (5L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val r = Mining.triangleCensus(li).collect().head
    // degrees 1:2 2:2 3:3 4:1 -> wedges 1+1+3+0 = 5; one triangle;
    // transitivity 3*1/5 = 0.6
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((4L, 4L, 5L, 1L, 0.6)), r.toString)
  }

  test("markovHoldout: a deterministic cycle is predicted perfectly on " +
      "the held-out users; every transition is scored exactly once") {
    def ts(s: Long) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusSeconds(s))
    val cycle = Vector("a", "b", "c")
    val ev = (1L to 60L).flatMap { u =>
      (0 until 4).map(i =>
        (u * 10 + i, u, ts(i.toLong), cycle(i % 3), 0.0))
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Mining.markovHoldout(ev).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getDouble(3))).toMap
    // the a->b->c->a rule is learnable from any train subset and holds
    // on every eval pair
    assert(out.nonEmpty)
    out.foreach { case (from, (n, correct, acc)) =>
      assert(n == correct && acc == 1.0, s"$from: $n/$correct")
    }
    // eval side scores every transition of the ~25% held-out users:
    // 3 transitions per user, total divisible by 3
    val totalEval = out.values.map(_._1).sum
    assert(totalEval > 0 && totalEval % 3 == 0, totalEval.toString)
  }

  test("property: triangleCensus matches a brute-force census on random " +
      "incidence sets") {
    import org.scalacheck.Gen
    val gen = Gen.listOfN(40,
      Gen.zip(Gen.choose(1L, 12L), Gen.choose(1L, 8L)))
    (1 to 5).foreach { seed =>
      val inc = gen(Gen.Parameters.default,
        org.scalacheck.rng.Seed(seed * 7919L))
        .getOrElse(sys.error("gen failed")).distinct
      val li = inc.toDF("l_orderkey", "l_partkey")
      val r = Mining.triangleCensus(li).collect().head
      // brute force: same edge rule, then count triangles directly
      val byOrder = inc.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      val pairCount = scala.collection.mutable.Map
        .empty[(Long, Long), Int].withDefaultValue(0)
      byOrder.values.foreach { ps =>
        val s = ps.distinct.sorted
        for (i <- s.indices; j <- i + 1 until s.size)
          pairCount((s(i), s(j))) += 1
      }
      val edges = pairCount.filter(_._2 >= 2).keySet
      val nodes = edges.flatMap(e => Seq(e._1, e._2))
      val deg = nodes.map(n =>
        n -> edges.count(e => e._1 == n || e._2 == n)).toMap
      val wedges = deg.values.map(d => d.toLong * (d - 1) / 2).sum
      val ns = nodes.toSeq.sorted
      val tris = (for {
        i <- ns.indices; j <- i + 1 until ns.size; k <- j + 1 until ns.size
        if edges((ns(i), ns(j))) && edges((ns(j), ns(k))) &&
          edges((ns(i), ns(k)))
      } yield 1).size
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
        ((nodes.size.toLong, edges.size.toLong, wedges, tris.toLong)),
        s"seed $seed: ${r.toString} vs ($nodes, $edges, $wedges, $tris)")
    }
  }

  test("triangleCensus: a 4-clique counts C(4,3)=4 triangles under " +
      "orientation (every wedge closes)") {
    // two orders over the same 4 parts -> complete graph K4 at w=2
    val li = (1L to 2L).flatMap(o => (1L to 4L).map(p => (o, p)))
      .toDF("l_orderkey", "l_partkey")
    val r = Mining.triangleCensus(li).collect().head
    // K4: 6 edges, deg 3 each -> wedges 4*3 = 12, triangles 4,
    // transitivity 3*4/12 = 1.0
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getDouble(4)) == ((4L, 6L, 12L, 4L, 1.0)), r.toString)
  }
}
