package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Dedup

class DedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and then " +
    "runs far away into the deep green forest before nightfall arrives"

  private def docs = Seq(
    (0L, base),
    (1L, base), // exact duplicate of 0
    (2L, base.replace("lazy", "sleepy")), // near-duplicate of 0
    (3L, "completely different content about spark engines and " +
      "distributed query processing at large scale with shuffles"),
    (4L, "yet another unrelated document mentioning parquet files and " +
      "columnar storage formats for analytics workloads")
  ).toDF("doc_id", "text")

  test("exactByHash groups exact duplicates, keeps min id") {
    val out = Dedup.exactByHash(docs, "text", "doc_id").collect()
    assert(out.length == 4) // 5 docs, one exact dup pair
    val dupRow = out.find(_.getAs[Long]("dup_count") == 2).get
    assert(dupRow.getAs[Long]("keep_id") == 0L)
  }

  test("minhash LSH finds exact and near duplicates, not unrelated docs") {
    val pairs = Dedup.minhashNearDupPairs(docs, "text", "doc_id",
        maxDistance = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact dup missed")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      "near dup missed")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc flagged")
  }

  test("native minhash banding finds exact/near dups with exact jaccard") {
    val pairs = Dedup.minhashNativePairs(docs, "text", "doc_id",
        maxDistance = 0.5)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs.get((0L, 1L)).contains(1.0), "exact dup must score 1.0")
    assert(pairs.contains((0L, 2L)) || pairs.contains((1L, 2L)),
      "near dup missed by banding")
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated doc flagged")
  }

  test("simhash signatures: identical docs equal, near docs close") {
    val sigs = Dedup.simhash64(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(0L) == sigs(1L))
    val d02 = java.lang.Long.bitCount(sigs(0L) ^ sigs(2L))
    val d03 = java.lang.Long.bitCount(sigs(0L) ^ sigs(3L))
    assert(d02 < d03, s"near-dup hamming $d02 should beat unrelated $d03")
  }

  test("simhash near-dup pairs include the exact duplicate") {
    val pairs = Dedup.simhashNearDupPairs(docs, "text", "doc_id",
        maxHamming = 6)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
  }

  test("ngram jaccard df-cutoff drops ubiquitous grams from the universe") {
    // docs 2..7 share only a boilerplate prefix whose grams appear in all
    // six of them (df=6); docs 0/1 are an exact-dup pair of rare text
    val corpus = (Seq(
      (0L, "rare unique matching sentence body one two three"),
      (1L, "rare unique matching sentence body one two three")) ++
      (2L to 7L).map(i =>
        (i, s"alpha beta gamma document number word$i extra$i filler$i")))
      .toDF("doc_id", "text")
    val withCut = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
        n = 3, minJaccard = 0.01, maxDocFreq = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(withCut == Set((0L, 1L)),
      s"hot-gram pairs must vanish under the cutoff, got $withCut")
    val noCut = Dedup.ngramJaccardPairs(corpus, "text", "doc_id",
        n = 3, minJaccard = 0.01, maxDocFreq = 1000)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(noCut.contains((2L, 3L)),
      "without the cutoff boilerplate-only pairs are candidates")
  }

  test("connectedComponents resolves chains and keeps singleton pairs apart") {
    // components: {1,2,3,7} via chain 1-2, 2-3, 3-7; {4,5}; {8,9}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 7L), (4L, 5L), (9L, 8L))
      .toDF("id_a", "id_b")
    val roots = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(roots == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 1L,
      4L -> 4L, 5L -> 4L, 8L -> 8L, 9L -> 8L), roots.toString)
  }

  test("connectedComponents converges in O(log diameter) via pointer jumps") {
    // 0-1-2-...-40 chain: plain neighbor propagation needs 40 rounds;
    // pointer jumping must land it within 10. singleTaskEdges=0 forces the
    // distributed loop (the 100 TB path) — the fast path would hide it.
    val chain = (0L until 40L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val roots = Dedup.connectedComponents(chain, maxIter = 10,
        singleTaskEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(roots.size == 41 && roots.values.forall(_ == 0L), roots.toString)
  }

  test("single-task union-find path ≡ distributed label-propagation path") {
    // mixed shapes: a chain, a star, a triangle with a tail, singleton pair
    val pairs = (Seq((1L, 2L), (2L, 3L), (3L, 4L)) ++ // chain
      Seq((10L, 11L), (10L, 12L), (10L, 13L)) ++ // star
      Seq((20L, 21L), (21L, 22L), (22L, 20L), (22L, 23L)) ++ // tri + tail
      Seq((30L, 31L)) ++
      Seq((40L, 40L))).toDF("id_a", "id_b") // degenerate self-pair
    val fast = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    val loop = Dedup.connectedComponents(pairs, singleTaskEdges = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast == loop, s"paths disagree: fast=$fast loop=$loop")
    assert(fast(4L) == 1L && fast(13L) == 10L && fast(23L) == 20L &&
      fast(31L) == 30L)
    assert(fast(40L) == 40L,
      "a self-loop node must survive as its own singleton component")
  }

  test("ngram jaccard: exact dup scores 1.0, near dup high, unrelated low") {
    val pairs = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, minJaccard = 0.0)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((0L, 2L)) > 0.5)
    assert(!pairs.contains((0L, 3L)) || pairs((0L, 3L)) < 0.1)
  }

  test("incremental jaccard: only cross-side pairs, values match full self-join") {
    // fresh = docs 1 (exact dup of corpus 0) and 2 (near dup of corpus 0);
    // 3, 4 stay corpus-side — a fresh-internal 1~2 pair must NOT appear
    val flagged = docs.withColumn("fresh", col("doc_id").isin(1L, 2L))
    val inc = Dedup.incrementalJaccardPairs(flagged, "text", "doc_id",
        "fresh", n = 3, minJaccard = 0.0)
      .collect()
      .map(r => (r.getAs[Long]("corpus_id"), r.getAs[Long]("fresh_id")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(inc((0L, 1L)) == 1.0)
    assert(inc((0L, 2L)) > 0.5)
    assert(inc.keys.forall { case (c, f) =>
      Set(0L, 3L, 4L).contains(c) && Set(1L, 2L).contains(f) },
      s"cross-side only: ${inc.keys}")
    // the measure is IDENTICAL to the full self-join restricted to
    // cross pairs (same kept-gram universe)
    val full = Dedup.ngramJaccardPairs(docs, "text", "doc_id",
        n = 3, minJaccard = 0.0)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    inc.foreach { case ((c, f), j) =>
      val key = if (c < f) (c, f) else (f, c)
      assert(full(key) == j, s"pair $key: incremental $j != full ${full(key)}")
    }
  }

  test("containment probe: planted passage finds its sources, prefix is lossless") {
    // probe = a verbatim slice of doc 0 → contained 1.0 in docs 0 and 1
    // (exact dup) and partially in 2 (one word swapped); unrelated docs
    // never qualify
    val probe = Seq((100L, base.split(" ").slice(2, 14).mkString(" ")))
      .toDF("probe_id", "passage")
    val out = Dedup.containmentProbe(docs, "text", "doc_id",
        probe, "passage", "probe_id", n = 3, minContainment = 0.5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("containment"))
      .toMap
    assert(out(0L) == 1.0 && out(1L) == 1.0, s"parents must hit 1.0: $out")
    assert(!out.contains(3L) && !out.contains(4L), s"unrelated matched: $out")
    // brute-force losslessness on the same inputs: every pair with
    // containment >= t (computed directly from gram sets) is present
    def grams(s: String): Set[String] = {
      val tk = s.toLowerCase.split("\\W+").filter(_.nonEmpty)
      if (tk.isEmpty) Set.empty
      // mirror WordNgrams: below n tokens, ONE whole-text shingle
      else if (tk.length < 3) Set(tk.mkString(" "))
      else tk.sliding(3).map(_.mkString(" ")).toSet
    }
    val pg = grams(base.split(" ").slice(2, 14).mkString(" "))
    docs.collect().foreach { r =>
      val c = grams(r.getString(1)).intersect(pg).size.toDouble / pg.size
      assert((c >= 0.5) == out.contains(r.getLong(0)),
        s"doc ${r.getLong(0)}: brute containment $c vs engine $out")
    }
  }

  test("q127 trigram search equals the brute-force contains scan") {
    val hits = graft.ops.TrainingData
      .q127TrigramSearch(spark, TestSpark.sfDir).collect()
    val brute = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
      .filter(col("text").contains("merge batch"))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(hits.map(_.getLong(0)).sameElements(brute))
    // reported position is the real first occurrence
    hits.foreach(r => assert(r.getLong(1) >= 1))
  }

  test("q131 BM25: scores positive/descending, hits contain a query term") {
    val out = graft.ops.TrainingData
      .q131Bm25Retrieval(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty && out.length <= 20)
    val scores = out.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sortBy(-_)), "descending by score")
    val terms = Set("merge", "batch", "spark")
    val ids = out.map(_.getLong(0)).toSet
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("doc_id", "text").collect()
    docs.foreach { r =>
      val toks = r.getString(1).toLowerCase.split("\\W+").toSet
      assert(toks.intersect(terms).nonEmpty,
        s"doc ${r.getLong(0)} retrieved without any query term")
    }
  }

  test("q205 hybrid RRF: fused score matches the rank formula exactly") {
    val out = graft.ops.TrainingData
      .q205HybridRrf(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty && out.length <= 10)
    val rrfs = out.map(_.getDouble(3))
    assert(rrfs.sameElements(rrfs.sortBy(-_)), "descending by fused score")
    out.foreach { r =>
      val (rLex, rDense, rrf) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(rLex > 0 || rDense > 0, "doc must come from at least one list")
      assert(rLex >= 0 && rLex <= 20 && rDense >= 0 && rDense <= 20)
      val expect =
        (if (rLex > 0) 1.0 / (60 + rLex) else 0.0) +
          (if (rDense > 0) 1.0 / (60 + rDense) else 0.0)
      assert(math.abs(rrf - BigDecimal(expect)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) == 0.0,
        s"rrf mismatch: got $rrf for ranks ($rLex, $rDense)")
    }
    // a doc on BOTH lists must outrank one on a single list at worse rank:
    // the top fused doc is never a rank-20 singleton
    assert(rrfs.head > 1.0 / 80)
  }

  test("q207 duplicated spans: stride-1 guarantee at any alignment") {
    val span = (1 to 20).map(i => s"w$i").mkString(" ") // 20-token span
    val self = (1 to 17).map(i => s"d$i").mkString(" ") // 17-token span
    val planted = Seq(
      (0L, s"f1 f2 f3 $span"),                     // span at offset 3
      (1L, s"$span g1 g2 g3 g4 g5"),               // span at offset 0
      (2L, (1 to 30).map(i => s"u$i").mkString(" ")), // all unique
      (3L, s"$self x1 $self"),                     // self-repetition
      (4L, (1 to 10).map(i => s"s$i").mkString(" ")) // under 16 tokens
    ).toDF("doc_id", "text")
    val out = graft.ops.TrainingData.duplicatedSpans(planted)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    // a 20-token span has 5 full 16-token windows wherever it sits —
    // different offsets in docs 0 and 1 must not break detection
    assert(out(0L) == ((8L, 5L, 0.625)), out.toString) // 23 tok → 8 windows
    assert(out(1L) == ((10L, 5L, 0.5)), out.toString)  // 25 tok → 10
    // within-doc repetition counts: 2 windows per occurrence, both dup
    assert(out(3L) == ((20L, 4L, 0.2)), out.toString)  // 35 tok → 20
    // unique doc and sub-window doc never appear
    assert(!out.contains(2L) && !out.contains(4L), out.toString)
  }

  test("q208 winnowing: W+k-1 detection floor, boilerplate guard") {
    import graft.ops.TrainingData.winnowPairs
    val shared = (1 to 7).map(i => s"c$i").mkString(" ") // = W+k-1 tokens
    val pairDocs = Seq(
      (0L, (1 to 10).map(i => s"a$i").mkString(" ") + " " + shared),
      (1L, shared + " " + (1 to 10).map(i => s"b$i").mkString(" ")),
      (2L, (1 to 20).map(i => s"z$i").mkString(" "))
    ).toDF("doc_id", "text")
    val pairs = winnowPairs(pairDocs, k = 4, window = 4,
        minShared = 1, maxDocFreq = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // the paper's guarantee: a shared span of >= W+k-1 tokens yields at
    // least one shared fingerprint — regardless of alignment
    assert(pairs.contains((0L, 1L)), pairs.toSeq.toString)
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L), "unique doc paired")

    // fingerprints shared by more than maxDocFreq docs are dropped as
    // corpus boilerplate: five identical docs, cap 3 → no pairs at all
    val boiler = (0L to 4L).map(i => (i, "p q r s t u v w x y"))
      .toDF("doc_id", "text")
    assert(winnowPairs(boiler, k = 4, window = 4,
      minShared = 1, maxDocFreq = 3).count() == 0L)
    // raise the cap and all C(5,2)=10 pairs surface
    assert(winnowPairs(boiler, k = 4, window = 4,
      minShared = 1, maxDocFreq = 5).count() == 10L)
  }

  test("q209 chunk dedup rebuild: global first occurrence, clean text") {
    val block = (1 to 8).map(i => s"p$i").mkString(" ") // one full chunk
    val planted = Seq(
      // doc 0 owns the block (pos 0) and a unique chunk
      (0L, s"$block " + (1 to 8).map(i => s"a$i").mkString(" ")),
      // doc 1 repeats the block at pos 1 — loses it, keeps its own two
      (1L, (1 to 8).map(i => s"b$i").mkString(" ") + s" $block " +
        (1 to 8).map(i => s"c$i").mkString(" ")),
      // doc 2 is ONLY the block — every chunk lost → empty clean text
      (2L, block),
      // doc 3 repeats its own first chunk — within-doc dedup applies
      (3L, s"$block".replace("p", "q") + " " + s"$block".replace("p", "q")),
      // doc 4: trailing partial chunk is its own passage
      (4L, (1 to 11).map(i => s"t$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = graft.ops.TrainingData.dedupChunksRebuild(planted)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val a = (1 to 8).map(i => s"a$i").mkString(" ")
    val b = (1 to 8).map(i => s"b$i").mkString(" ")
    val c = (1 to 8).map(i => s"c$i").mkString(" ")
    val q = block.replace("p", "q")
    assert(out(0L) == ((2L, 2L, s"$block $a")), out.toString)
    assert(out(1L) == ((3L, 2L, s"$b $c")), out.toString)
    assert(out(2L) == ((1L, 0L, "")), out.toString)
    assert(out(3L) == ((2L, 1L, q)), out.toString)
    // 11 tokens → chunk at pos 0 (8 toks) + trailing partial (3 toks)
    assert(out(4L)._1 == 2L && out(4L)._2 == 2L &&
      out(4L)._3 == (1 to 11).map(i => s"t$i").mkString(" "), out.toString)
  }

  test("q210 retrieval eval: parent outranks rivals, rank arithmetic") {
    val out = graft.ops.TrainingData
      .q210RetrievalEval(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val nCand = r.getAs[Long]("n_cand")
      val rank = r.getAs[Long]("parent_rank")
      val hit = r.getAs[Long]("hit10")
      val rr = r.getAs[Double]("rr10")
      assert(rank >= 1L && rank <= nCand, r.toString)
      assert(hit == (if (rank <= 10) 1L else 0L), r.toString)
      assert(rr == (if (rank <= 10) 1.0 / rank else 0.0), r.toString)
    }
    // self-retrieval with the parent's own tokens: the head of the
    // probe set must place some parents in the top 10 (sanity that the
    // metric is not degenerate-zero)
    assert(out.map(_.getAs[Long]("hit10")).sum > 0L)
  }

  test("ragContextPack: prefix rule fills the budget in rank order") {
    import graft.ops.TrainingData.ragContextPack
    // docs 0-2 share one length so BM25 ranks them purely by tf; doc 3
    // is short AND lowest-scored (its length boost does not overcome
    // tf=1 — BM25 hand-check: 1.45 vs doc2's 1.51)
    def doc(id: Long, hits: Int, pad: Int) =
      (id, (Seq.fill(hits)("zzz") ++ (1 to pad).map(i => s"p${id}_$i"))
        .mkString(" "))
    val docs = Seq(
      doc(0L, 5, 15), // rank 1, 20 tokens, cum 20
      doc(1L, 4, 16), // rank 2, 20 tokens, cum 40
      doc(2L, 3, 17), // rank 3, 20 tokens, cum 60 > 45 → truncates
      doc(3L, 1, 3)   // rank 4, 4 tokens — would fit, after the cut
    ).toDF("doc_id", "text")
    val out = ragContextPack(docs, Seq("zzz"), k = 10, tokenBudget = 45L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // the prefix rule: ranks 1..2 fit (cum 40), rank 3 overflows and
    // CUTS the context — rank 4 is not considered even though 40+4 ≤ 45
    assert(out.toSeq == Seq((1L, 0L, 20L, 20L), (2L, 1L, 20L, 40L)),
      out.toSeq.toString)
    // budget below the first document → empty context
    assert(ragContextPack(docs, Seq("zzz"), k = 10, tokenBudget = 5L)
      .count() == 0L)
  }

  test("q129 passage containment: every probe matches its parent at 1.0") {
    val out = graft.ops.TrainingData
      .q129PassageContainment(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    val byProbe = out.groupBy(_.getLong(0))
    byProbe.foreach { case (pid, rows) =>
      val parent = rows.find(_.getLong(1) == pid)
      assert(parent.isDefined, s"probe $pid missing its parent doc")
      assert(parent.get.getAs[Double]("containment") == 1.0,
        s"probe $pid parent containment != 1.0")
    }
  }
  test("planted-pair envelope floors hold with raw-recall margin at the " +
      "gate scale (q23/q34/q49/q107 independence probe)") {
    // the registered envelope forms emit hardcoded-TRUE booleans the
    // oracle expects; THIS probe is the independent raw-value check —
    // recall measured here must clear each floor with real margin
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.01" // the driver gate's scale
    val docs = graft.sources.TableCatalog.load(spark, dir, "documents")
    val off = 1000000L
    def recallOf(pairs: org.apache.spark.sql.DataFrame): Double =
      pairs.filter(col("id_b") === col("id_a") + off &&
          col("id_a") < 20)
        .select(col("id_a")).distinct().count() / 20.0
    val planted = graft.ops.Dedup.plantTextDups(docs, "doc_id", "text")
    val r23 = recallOf(graft.ops.Dedup.minhashNearDupPairs(
      planted, "text", "doc_id", 0.6))
    assert(r23 >= 0.9, s"q23 raw recall $r23 must clear floor 0.6 with margin")
    val r49 = recallOf(graft.ops.Dedup.minhashNativePairs(
      planted, "text", "doc_id", 0.6))
    assert(r49 >= 0.9, s"q49 raw recall $r49 must clear floor 0.6 with margin")
    val r34 = recallOf(graft.ops.Dedup.simhashNearDupPairs(
      planted, "text", "doc_id", 3))
    assert(r34 >= 0.6, s"q34 raw recall $r34 must clear floor 0.3 with margin")
    val identical = graft.ops.Dedup.plantTextDups(docs, "doc_id", "text",
      extraToken = None)
    val sigs = graft.ops.Multimodal.decodeSignatures(
      graft.ops.Multimodal.asMediaTable(identical, "doc_id", "text",
        "image/stub")).toDF()
    val r107 = recallOf(graft.ops.Dedup.hammingBandPairs(
      sigs, "asset_id", "phash", 3))
    assert(r107 == 1.0, s"q107 identical-bytes recall must be exactly 1.0, got $r107")
    spark.catalog.clearCache()
  }

  test("plantTextDups: a corpus id reaching the planted offset fails the " +
      "query LOUDLY at execution (lazy in-plan guard, no build-time job)") {
    import spark.implicits._
    val bad = Seq((0L, "alpha beta gamma"), (1000000L, "delta epsilon"))
      .toDF("doc_id", "text")
    // building the frame runs NO job (the guard is a plan branch)...
    val planted = graft.ops.Dedup.plantTextDups(bad, "doc_id", "text")
    // ...but materializing it must throw: the aliasing id would silently
    // false-pass the recall envelope
    val e = intercept[Exception] { planted.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("planted-id offset")), e.toString)
    // a healthy corpus sails through: 2 originals + 2 planted copies
    val ok = Seq((0L, "alpha beta"), (1L, "gamma delta"))
      .toDF("doc_id", "text")
    assert(graft.ops.Dedup.plantTextDups(ok, "doc_id", "text")
      .collect().length == 4)
  }
}
