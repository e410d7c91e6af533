package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions._
import graft.ops.Similarity
import graft.sources.TableCatalog

class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.99f, 0.1f, 0.0f)), // nearly id 0
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(-1.0f, 0.0f, 0.0f))  // opposite of id 0
  ).toDF("vec_id", "embedding")

  test("cosineSim column helper: orthogonal=0, identical=1, opposite=-1") {
    val out = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"),
        round(cosineSim(col("a.embedding"), col("b.embedding")), 4).as("s"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((0L, 0L)) == 1.0)
    assert(out((0L, 2L)) == 0.0)
    assert(out((0L, 4L)) == -1.0)
  }

  test("brute-force top-k ranks the near-identical vector first") {
    val top = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0),
        "vec_id", "embedding", k = 2)
      .orderBy("rn").as[(Long, Long, Double, Long)].collect()
    assert(top.head._2 == 1L, s"expected neighbor 1 first, got ${top.head}")
  }

  test("int8 quantization: cosine error small, top-k recall high vs exact") {
    // expression-level accuracy on synthetic vectors
    val pairs = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        round(cosineSim(col("a.embedding"), col("b.embedding")), 6).as("f32"),
        round(cosineSimI8(quantizeI8(col("a.embedding")),
          quantizeI8(col("b.embedding"))), 6).as("i8"))
      .as[(Double, Double)].collect()
    pairs.foreach { case (f, q) =>
      assert(math.abs(f - q) < 0.02, s"cosine drift: f32=$f i8=$q") }
    // recall@5 on the real corpus against the exact float path
    val emb = TableCatalog.load(spark, TestSpark.sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val quant = Similarity.quantizedTopK(emb, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val recall = exact.map { case (q, ns) =>
      (ns intersect quant.getOrElse(q, Set.empty)).size.toDouble / ns.size
    }.sum / exact.size
    assert(recall >= 0.8, s"recall@5 $recall below 0.8")
  }

  test("IVF recall on the real corpus: top-1 matches brute force for most queries") {
    val emb = TableCatalog.load(spark, TestSpark.sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val approx = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5)
      .filter($"rn" === 1)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toMap
    val hits = exact.count { case (q, n) => approx.get(q).contains(n) }
    assert(approx.size == 10, "every query should get a candidate")
    // random embeddings have no cluster structure, so stride-sampled
    // "centroids" give weak recall; require it beats nothing at all and
    // that approximate sims never exceed the exact optimum
    assert(hits >= 1, s"IVF found no exact top-1 at all: $hits/10")
    val exactSims = Similarity
      .bruteForceTopK(emb, queries, "vec_id", "embedding", 1)
      .select("query_id", "sim").as[(Long, Double)].collect().toMap
    val approxSims = Similarity.ivfTopK(emb, queries, "vec_id", "embedding", 5)
      .filter($"rn" === 1).select("query_id", "sim")
      .as[(Long, Double)].collect().toMap
    approxSims.foreach { case (q, s) => assert(s <= exactSims(q) + 1e-9) }
  }

  test("banded LSH near-dup: verified pairs are true, candidates sub-quadratic") {
    val emb = TableCatalog.load(spark, TestSpark.sfDir, "embeddings")
    val n = emb.count()
    val base = emb.select(col("vec_id").as("id"), col("embedding").as("emb"))
    val ea = base.select($"id".as("id_a"), $"emb".as("emb_a"))
    val eb = base.select($"id".as("id_b"), $"emb".as("emb_b"))
    // ground truth: every pair at sim >= 0.3, by exact all-pairs scan
    val truth = ea.crossJoin(eb).filter($"id_a" < $"id_b")
      .filter(Similarity.simRounded($"emb_a", $"emb_b") >= 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = Similarity
      .lshNearDupPairs(emb, "vec_id", "embedding", dim = 64, minSim = 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded.subsetOf(truth), "verified pairs must be true pairs")
    val candidates = Similarity
      .lshBandCandidates(emb, "vec_id", "embedding", dim = 64).count()
    val allPairs = n * (n - 1) / 2
    assert(candidates < allPairs / 2,
      s"candidate volume $candidates is not sub-quadratic vs $allPairs")
  }

  test("banded LSH near-dup: auto-sizing finds planted near-dups at the design sim") {
    // the real fixture has NO pairs above sim 0.5 (random 64-dim vectors),
    // so recall at the design similarity needs planted dups: 30 pairs of
    // (v, v + small noise) among 240 random distractors
    val rnd = new scala.util.Random(42)
    def unit(): Array[Double] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val nm = math.sqrt(v.map(x => x * x).sum); v.map(_ / nm)
    }
    val planted = (0 until 30).flatMap { i =>
      val v = unit()
      val w = v.zip(unit()).map { case (a, b) => a + 0.15 * b }
      Seq((i.toLong * 2, v.toSeq), (i.toLong * 2 + 1, w.toSeq))
    }
    val noise = (0 until 240).map(i => ((1000 + i).toLong, unit().toSeq))
    val df = spark.createDataFrame(planted ++ noise)
      .toDF("vec_id", "embedding")
    val found = Similarity
      .lshNearDupPairs(df, "vec_id", "embedding", dim = 64, minSim = 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val hits = (0 until 30).count(i =>
      found.contains((i.toLong * 2, i.toLong * 2 + 1)))
    assert(hits >= 28,
      s"auto-sized banding must recover planted near-dups: $hits/30")
  }

  test("lshAutoSize: bucket count tracks corpus size, recall held, bands bounded") {
    def recall(bands: Int, bits: Int, sim: Double): Double = {
      val p = 1.0 - math.acos(sim) / math.Pi
      1.0 - math.pow(1.0 - math.pow(p, bits), bands)
    }
    for (n <- Seq(100L, 10_000L, 1_000_000L, 100_000_000L)) {
      val (bands, bits) = Similarity.lshAutoSize(n, 0.9)
      assert(bands >= 8 && bands <= 64, s"n=$n bands=$bands")
      assert(bits >= 6 && bits <= 20, s"n=$n bits=$bits")
      // the recall guarantee holds even where the band cap binds and
      // bits back off (e.g. n > 131k at design sim 0.9 needs bits=19)
      assert(recall(bands, bits, 0.9) >= 0.95,
        s"n=$n recall ${recall(bands, bits, 0.9)} with $bands x $bits")
    }
    val (_, bitsSmall) = Similarity.lshAutoSize(100L, 0.9)
    val (_, bitsBig) = Similarity.lshAutoSize(1_000_000L, 0.9)
    assert(bitsBig > bitsSmall, "bits must grow with corpus size")
    // a higher design similarity needs FEWER bands for the same recall
    val (bandsLo, _) = Similarity.lshAutoSize(10_000L, 0.9)
    val (bandsHi, _) = Similarity.lshAutoSize(10_000L, 0.99)
    assert(bandsHi <= bandsLo, s"bands($bandsHi) should not exceed $bandsLo")
  }

  test("banded LSH top-k: candidates for most queries, sims never beat exact") {
    val emb = TableCatalog.load(spark, TestSpark.sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val approx = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
        dim = 64, k = 5)
      .filter($"rn" === 1)
      .select("query_id", "sim").as[(Long, Double)].collect().toMap
    assert(approx.size >= 8,
      s"banded LSH should surface candidates for most queries: ${approx.size}/10")
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 1)
      .select("query_id", "sim").as[(Long, Double)].collect().toMap
    approx.foreach { case (q, s) => assert(s <= exact(q) + 1e-9) }
  }

  test("LSH bucket is deterministic across evaluations") {
    val b1 = vecs.select(Similarity.lshBucket(col("embedding"), 3, 8).as("b"))
      .as[Long].collect().toSeq
    val b2 = vecs.select(Similarity.lshBucket(col("embedding"), 3, 8).as("b"))
      .as[Long].collect().toSeq
    assert(b1 == b2)
  }

  test("trainKMeans: codebook invariants (k rows, unit centroids, full cover)") {
    val emb = TableCatalog.load(spark, TestSpark.sfDir, "embeddings")
    val total = emb.count()
    val cb = Similarity.trainKMeans(emb, "vec_id", "embedding",
      k = 8, iters = 3)
    val rows = cb.collect()
    assert(rows.length == 8)
    assert(rows.map(_.getLong(2)).sum == total,
      "every corpus vector lands in exactly one cell")
    rows.foreach { r =>
      val norm = math.sqrt(r.getSeq[Double](1).map(x => x * x).sum)
      assert(math.abs(norm - 1.0) < 1e-9,
        s"spherical k-means centroids are unit vectors, got $norm")
    }
    assert(rows.count(_.getLong(2) > 0) >= 4,
      "most cells should be populated on a uniform corpus")
  }

  test("trainKMeans recovers well-separated clusters") {
    // 3 tight orthogonal-direction clusters; ids spread so the hash-seeded
    // init is what it would be in production (no cherry-picking)
    val pts = for {
      (axis, base) <- Seq(0, 1, 2).zip(Seq(0L, 100L, 200L))
      i <- 0 until 10
    } yield {
      val v = Array.fill(4)(0.02 * ((i % 3) - 1))
      v(axis) = 1.0
      val n = math.sqrt(v.map(x => x * x).sum)
      (base + i, v.map(_ / n).toSeq)
    }
    val df = spark.createDataFrame(pts).toDF("vec_id", "embedding")
    val cb = Similarity.trainKMeans(df, "vec_id", "embedding",
      k = 3, iters = 6)
    val rows = cb.collect()
    assert(rows.map(_.getLong(2)).sum == 30)
    // each populated centroid must point dominantly along one axis
    rows.filter(_.getLong(2) > 0).foreach { r =>
      val e = r.getSeq[Double](1)
      assert(e.max > 0.95, s"centroid not aligned to a cluster axis: $e")
    }
  }

  test("semDedup: duplicate groups collapse to min-id survivors, " +
      "survivors never near-dup within a cell") {
    // exact duplicates (identical vectors assign to identical cells, so
    // grouping is deterministic regardless of the trained codebook) plus
    // well-separated singletons
    val v1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val v2 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val single = (5 until 10).map { i =>
      val a = new Array[Float](4); a(i % 4) = 1.0f; a((i + 1) % 4) = 0.3f * i
      (i.toLong, a)
    }
    val emb = (Seq((0L, v1), (1L, v1), (2L, v1), (3L, v2), (4L, v2)) ++
      single).toDF("vec_id", "embedding")
    val out = Similarity.semDedup(emb, "vec_id", "embedding",
        threshold = 0.999, nCentroids = 2, iters = 2)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(out.length == 10, "one row per input vector")
    val byId = out.map(t => t._1 -> t).toMap
    // the three copies of v1 share a group rooted at 0; only 0 keeps
    assert(Seq(0L, 1L, 2L).map(byId(_)._3).distinct == Seq(0L))
    assert(byId(0L)._4 && !byId(1L)._4 && !byId(2L)._4)
    // v2 pair roots at 3
    assert(byId(3L)._3 == 3L && byId(4L)._3 == 3L)
    assert(byId(3L)._4 && !byId(4L)._4)
    // keep flag is exactly "id == group_id" and groups keep exactly one
    out.foreach { case (id, _, g, keep) => assert(keep == (id == g)) }
    assert(out.filter(_._4).map(_._3).distinct.length ==
      out.map(_._3).distinct.length)
    // no two SURVIVORS in the same cell are still near-dups
    val kept = out.filter(_._4)
    val vecs = (Seq((0L, v1), (1L, v1), (2L, v1), (3L, v2), (4L, v2)) ++
      single).toMap
    def sim(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    for {
      (ia, ca, _, _) <- kept
      (ib, cb, _, _) <- kept
      if ia < ib && ca == cb
    } assert(sim(vecs(ia), vecs(ib)) < 0.999,
      s"survivors $ia/$ib still near-dup in cell $ca")
  }

  test("trained IVF reaches useful recall vs brute force") {
    val emb = TableCatalog.load(spark, TestSpark.sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id",
        "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val trained = Similarity.ivfTopKTrained(emb, queries, "vec_id",
        "embedding", k = 5, nCentroids = 4, iters = 2, nprobe = 2)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (exact & trained).size.toDouble / exact.size
    assert(recall >= 0.4,
      s"trained-IVF recall vs exact too low: $recall (nprobe=2 of 4 cells)")
  }

  test("hardNegatives: below the dup threshold, no self pairs, the " +
      "planted moderate neighbor surfaces, near-dups never do") {
    import spark.implicits._
    // cluster of 3 near-identical vectors (sim ~1) + one moderately
    // similar outsider (sim ~0.7) + junk
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val base = Array.tabulate(16)(i => if (i < 8) 1.0 else 0.1)
    val nearA = base.clone(); nearA(15) += 0.01
    val nearB = base.clone(); nearB(14) += 0.01
    val moderate = Array.tabulate(16)(i => if (i < 5) 1.0 else 0.35)
    val junk = Array.tabulate(16)(i => if (i % 2 == 0) -1.0 else 1.0)
    val emb = Seq(
      (1L, unit(base)), (2L, unit(nearA)), (3L, unit(nearB)),
      (10L, unit(moderate)), (99L, unit(junk))
    ).toDF("vec_id", "embedding")
    val out = graft.ops.Similarity.hardNegatives(emb, emb, "vec_id",
        "embedding", dim = 16, maxSim = 0.95, k = 2,
        bands = 16, bitsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.forall(_._3 < 0.95), s"dup-threshold violated: ${out.toSeq}")
    assert(out.forall(p => p._1 != p._2), "self pair")
    // near-dups (sim ~1) must never appear as negatives of each other
    val cluster = Set(1L, 2L, 3L)
    assert(!out.exists(p => cluster(p._1) && cluster(p._2)),
      s"near-dup leaked into negatives: ${out.toSeq}")
    // the moderate outsider is the hard negative the cluster should find
    assert(out.exists(p => cluster(p._1) && p._2 == 10L),
      s"planted moderate neighbor missing: ${out.toSeq}")
    // deterministic across runs (seeded hash projections)
    val again = graft.ops.Similarity.hardNegatives(emb, emb, "vec_id",
        "embedding", dim = 16, maxSim = 0.95, k = 2,
        bands = 16, bitsPerBand = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSet == again.toSet)
  }

  test("recallVsExact: hit counting by hand, zero-hit queries kept") {
    import spark.implicits._
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (1L, 14L),
      (2L, 20L), (2L, 21L)).toDF("query_id", "neighbor_id")
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    val out = graft.ops.TrainingData.recallVsExact(exact, approx)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(1L) == ((5L, 2L, 0.4))) // 99 is a miss, not a hit
    assert(out(2L) == ((2L, 0L, 0.0)), "zero-hit query must still appear")
    assert(!out.contains(3L), "approx-only ids are not audited queries")
  }

  test("annRecallAudit on the real corpus: auto-sized LSH recalls most " +
      "of the exact top-10; both indexes bounded and complete") {
    val emb = spark.read.parquet(s"${TestSpark.sfDir}/embeddings.parquet")
    val out = graft.ops.TrainingData.annRecallAudit(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 15),
        "vec_id", "embedding", dim = 64, k = 10)
      .collect().map(r => (r.getString(4), r.getLong(0)) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    val lsh = out.filter(_._1._1 == "lsh").values.toSeq
    val ivf = out.filter(_._1._1 == "ivf").values.toSeq
    assert(lsh.size == 15 && ivf.size == 15, "every query audited per index")
    assert(out.values.forall { case (k10, hits, rec) =>
      k10 == 10L && hits >= 0L && hits <= 10L &&
        rec >= 0.0 && rec <= 1.0 && rec == hits / 10.0
    }, out.toString)
    val lshMean = lsh.map(_._3).sum / lsh.size
    assert(lshMean >= 0.8, s"auto-sized LSH mean recall $lshMean below 0.8")
    // low-cosine neighbor regime: the many-band LSH table must beat the
    // 3-probe IVF here (the audit's whole point is making this visible)
    val ivfMean = ivf.map(_._3).sum / ivf.size
    assert(lshMean > ivfMean, s"lsh $lshMean vs ivf $ivfMean")
  }

  test("sharded IVF: recall tracks single-index IVF on the real corpus, " +
      "exactly k results per query, every shard contributes candidates") {
    val emb = TableCatalog.load(spark, TestSpark.sfDir, "embeddings")
    val queries = emb.filter($"vec_id" < 10)
    val exact = Similarity.bruteForceTopK(emb, queries,
        "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sharded = Similarity.shardedIvfTopK(emb, queries,
        "vec_id", "embedding", k = 5, nShards = 4)
      .collect()
    // exactly k per query with dense ranks
    val byQuery = sharded.groupBy(_.getLong(0))
    assert(byQuery.size == 10)
    byQuery.values.foreach(rs =>
      assert(rs.map(_.getLong(3)).sorted.toSeq == (1L to 5L), rs.toSeq.toString))
    // recall vs brute force: every shard is probed, so sharding must not
    // collapse recall (same useful-recall bar as the single-index IVF spec)
    val hits = sharded.count(r => exact((r.getLong(0), r.getLong(1))))
    assert(hits >= 25, s"recall@5 too low: $hits/50")
    // the global merge really does draw from more than one shard
    val shards = sharded.map(_.getLong(1)).distinct.toSeq.toDF("id")
      .select(pmod(xxhash64($"id"), lit(4)).as("s"))
      .collect().map(_.getLong(0)).toSet
    assert(shards.size > 1, s"all candidates from one shard: $shards")
  }

  test("ivfAutoK tracks sqrt(n) to the 65536 literal-size ceiling") {
    assert(Similarity.ivfAutoK(100) == 16)
    assert(Similarity.ivfAutoK(1000000) == 1000)
    // the old 4096 clamp froze here; k must keep tracking sqrt(n)
    assert(Similarity.ivfAutoK(100000000L) == 10000)
    assert(Similarity.ivfAutoK(5000000000L) == 65536)
  }

  test("two-level nearestCells: probing every coarse cell is bit-identical " +
      "to the flat scan; partial probing keeps high top-1 agreement") {
    // 16 well-separated direction clusters in 8-d, 12 centroids worth of
    // codebook structure: k=48 centroids forced through the hierarchical
    // path (flatMax=0) vs the exact flat scan (flatMax=Int.MaxValue)
    val rnd = new scala.util.Random(7)
    val k = 48
    val centEmbs = Array.tabulate(k) { i =>
      val base = Array.fill(8)(0.05 * (rnd.nextDouble() - 0.5))
      base(i % 8) += (if (i % 16 < 8) 1.0 else -1.0)
      val n = math.sqrt(base.map(x => x * x).sum)
      base.map(_ / n)
    }
    val centIds = Array.tabulate(k)(_.toLong)
    val points = (0 until 300).map { i =>
      val c = centEmbs(i % k)
      (i.toLong, c.map(x => x + 0.02 * (rnd.nextDouble() - 0.5)))
    }.toDF("id", "emb")
    def assign(flatMax: Int, probes: Int) = points
      .select(col("id"), element_at(
        Similarity.nearestCells(col("emb"), centIds, centEmbs, 1,
          flatMax = flatMax, probes = probes), 1).as("cell"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val flat = assign(Int.MaxValue, 1)
    // kc = ceil(sqrt(48)) = 7; probes >= kc covers every coarse cell
    val allProbes = assign(0, 7)
    assert(allProbes == flat, "full-probe hierarchical must equal flat")
    // partial probing (2 of 7 cells) is the approximation — on separated
    // clusters agreement should still be high
    val partial = assign(0, 2)
    val agree = flat.count { case (id, c) => partial(id) == c }
    assert(agree >= 270, s"top-1 agreement $agree/300 under partial probing")
  }

  test("matryoshkaAudit: overlap counts neighbors surviving truncation") {
    // first 2 dims tie all candidates; the tail dims decide the FULL
    // ranking, so truncation to 2 dims reshuffles the head
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // probe (0 mod 50)
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // identical → full rank 1
      (2L, Array(1.0f, 0.0f, 1.0f, 0.0f)), // same prefix, off-axis tail
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))  // orthogonal prefix
    ).toDF("vec_id", "embedding")
    val out = graft.ops.TrainingData.matryoshkaAudit(emb, "vec_id",
        "embedding", prefixDims = 2, k = 2, sampleMod = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // full top-2 of probe 0: {1 (sim 1.0), 2 (sim ≈0.707)};
    // truncated top-2: prefix of 1 AND 2 are both exactly (1,0) → sims
    // 1.0 with id tiebreak → {1, 2} again → overlap 2/2
    assert(out.toSeq == Seq((0L, 2L, 1.0)), out.toSeq.toString)

    // flip: the tail carries all of the probe's signal, so truncation
    // CHANGES the winner — overlap drops to 0
    val emb2 = Seq(
      (0L, Array(1.0f, 0.0f, 1.0f, 0.0f)), // probe
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f)), // full sim 0.5, trunc sim 0
      (2L, Array(1.0f, 0.0f, -1.0f, 0.0f)) // full sim 0,  trunc sim 1
    ).toDF("vec_id", "embedding")
    val o2 = graft.ops.TrainingData.matryoshkaAudit(emb2, "vec_id",
        "embedding", prefixDims = 2, k = 1, sampleMod = 50)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // full top-1 = doc 1 (0.5 beats 0); truncated top-1 = doc 2 → 0/1
    assert(o2.toSeq == Seq((0L, 0L)), o2.toSeq.toString)
  }

  test("int8Calibration: symmetric scale, exact mse, dead-dim guard") {
    // dim0 ∈ {1, -2} → scale 2/127; dim1 all-zero → scale 0 (dead dim)
    val emb = Seq(
      (0L, Array(1.0f, 0.0f)),
      (1L, Array(-2.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.int8Calibration(emb, "vec_id", "embedding")
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2),
        r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    val s = 2.0 / 127.0
    assert(out(0L)._1 == -2.0 && out(0L)._2 == 1.0 && out(0L)._3 == s &&
      out(0L)._4 == 2L, out.toString)
    // v=1: q=round(63.5)=64 (half away from zero) → err (1−64s)²;
    // v=−2: q=−127 reconstructs exactly → err 0; term rounds to 12 dp
    // before the exact mean
    val e = BigDecimal((1.0 - 64 * s) * (1.0 - 64 * s))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble / 2.0
    assert(math.abs(out(0L)._5 - e) < 1e-15, s"mse ${out(0L)._5} vs $e")
    // the dead dimension must not divide by zero: q=0, mse exactly 0
    assert(out(1L)._3 == 0.0 && out(1L)._5 == 0.0, out.toString)
  }
  test("planted envelope floors hold with raw-value margin at the gate " +
      "scale (q35/q166 independence probe)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    val emb = graft.sources.TableCatalog.load(spark, dir, "embeddings")
    val off = 1000000L
    // q35: the scaled plant must be found for EVERY planted id —
    // detection is deterministic by construction (all band keys equal)
    val r35 = Similarity.lshNearDupPairs(
        Similarity.plantScaledDups(emb, "vec_id", "embedding"),
        "vec_id", "embedding", dim = 64, minSim = 0.3)
      .filter(col("id_b") === col("id_a") + off && col("id_a") < 20)
      .select(col("id_a")).distinct().count() / 20.0
    assert(r35 == 1.0, s"q35 scaled-plant recall must be exactly 1.0: $r35")
    // q166: flipped-tail planted negatives retrieved over the floor with
    // margin; the scaled dup NEVER appears (sim 1.0 >= maxSim cut)
    val anchors = emb.filter(col("vec_id") < 20)
    val negatives = anchors
      .withColumn("vec_id", col("vec_id") + off)
      .withColumn("embedding",
        transform(col("embedding"), (x, i) => when(i >= 51, -x).otherwise(x)))
    val dups = anchors
      .withColumn("vec_id", col("vec_id") + 2 * off)
      .withColumn("embedding", transform(col("embedding"), _ * lit(1.5f)))
    val hn = Similarity.hardNegatives(
        emb.unionByName(negatives).unionByName(dups), anchors,
        "vec_id", "embedding", dim = 64, maxSim = 0.8, k = 3)
      .persist()
    val r166 = hn.filter(col("neighbor_id") === col("query_id") + off)
      .select(col("query_id")).distinct().count() / 20.0
    assert(r166 >= 0.4, s"q166 raw recall $r166 must clear floor 0.2 with margin")
    assert(hn.filter(col("neighbor_id") === col("query_id") + 2 * off)
      .count() == 0, "scaled dups must be cut by maxSim")
    assert(hn.filter(col("sim") >= 0.8).count() == 0,
      "no retrieved negative may reach the dup threshold")
    hn.unpersist()
    spark.catalog.clearCache()
  }
  test("q92/q142 envelope claims recomputed from raw outputs " +
      "(independence probe)") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01"
    // q92: raw cluster sizes sum to the corpus count exactly
    val emb = graft.sources.TableCatalog.load(spark, dir, "embeddings")
    val total = emb.count()
    val sizes = graft.ops.TrainingData.q92KmeansCellSizes(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sizes.map(_._2).sum == total,
      s"cluster sizes must partition the corpus: ${sizes.toSeq}")
    assert(sizes.map(_._1).toSet == (0L until 16L).toSet)
    // q142: replay the planted-dup claims from the raw semDedup output
    val off = 1000000L
    val out = Similarity.semDedup(
        Similarity.plantScaledDups(emb, "vec_id", "embedding"),
        "vec_id", "embedding", threshold = 0.3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getBoolean(3))).toMap
    (0L until 20L).foreach { id =>
      val (origGroup, _) = out(id)
      val (plantGroup, plantKeep) = out(id + off)
      assert(plantGroup == origGroup, s"plant $id must group with original")
      assert(!plantKeep, s"plant $id must be pruned (original id is smaller)")
    }
    spark.catalog.clearCache()
  }
}
