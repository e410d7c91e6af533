package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Corpus

class CorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("scrubPii replaces emails, urls, phones with typed tokens and counts") {
    val df = Seq(
      (1L, "mail me at jane.doe@example.com or visit https://example.com/x"),
      (2L, "call +1-555-123-4567 or 555 987 6543 today"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = Corpus.scrubPii(df, "text")
      .select("doc_id", "clean_text", "n_email", "n_url", "n_phone")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L)._1 == "mail me at <EMAIL> or visit <URL>")
    assert(out(1L)._2 == 1 && out(1L)._3 == 1)
    assert(out(2L)._4 == 2, s"both phone formats must redact: ${out(2L)}")
    // 3-3-4 matcher: a country-code prefix stays (documented simplification)
    assert(out(2L)._1 == "call +1-<PHONE> or <PHONE> today", out(2L)._1)
    assert(out(3L) == (("nothing sensitive here", 0L, 0L, 0L)))
  }

  test("repetitionStats: repeated text scores low ttr / high dup bigrams") {
    val df = Seq(
      (1L, "spam spam spam spam spam spam"),
      (2L, "all six words here are different")
    ).toDF("doc_id", "text")
    val out = Corpus.repetitionStats(df, "text")
      .select("doc_id", "n_toks", "ttr", "dup_bigram_ratio")
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L)._1 == 6 && out(1L)._2 < 0.2 && out(1L)._3 > 0.7)
    assert(out(2L)._2 == 1.0 && out(2L)._3 == 0.0)
  }

  test("hashSplit is deterministic, content-keyed, and ~14/1/1") {
    val docs = (1L to 400L).map(i => (i, s"document body number $i"))
      .toDF("doc_id", "text")
    val a = Corpus.hashSplit(docs, "text").select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = Corpus.hashSplit(docs.orderBy(rand(7)), "text")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b, "split must not depend on row order")
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.75 && frac < 0.95, s"train fraction $frac")
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("chunkDocuments windows overlap by size-stride, tail truncates") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "solo"),
      (3L, "")
    ).toDF("doc_id", "text")
    val out = Corpus.chunkDocuments(df, "text", "doc_id", size = 4, stride = 3)
      .as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toList).toMap
    // starts 0,3,6,9: windows of 4 tokens, last truncated to 1
    assert(out(1L) == List("t1 t2 t3 t4", "t4 t5 t6 t7", "t7 t8 t9 t10",
      "t10"), out(1L).toString)
    assert(out(2L) == List("solo"))
    assert(!out.contains(3L), "empty text must produce no chunks")
    // overlap property: consecutive chunks share size-stride tokens
    val chunks = out(1L).map(_.split(" ").toList)
    chunks.sliding(2).foreach {
      case List(a, b) => assert(a.takeRight(1) == b.take(1) ||
        a.length < 4, s"$a | $b")
      case _ =>
    }
  }

  test("decontaminateBloom output is bit-identical to the exact variant") {
    // the bloom is a pruning device only: false positives must be removed
    // by the exact verify join, never surface in the output
    val docs = TestSpark.spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val (c, b) =
      (docs.filter(col("doc_id") % 11 =!= 0), docs.filter(col("doc_id") % 11 === 0))
    val exact = Corpus.decontaminate(c, b, "text", "doc_id",
        n = 2, minOverlap = 3, hashGrams = true)
      .select("doc_id", "n_grams", "n_overlap")
      .as[(Long, Long, Long)].collect().toSet
    val bloom = Corpus.decontaminateBloom(c, b, "text", "doc_id",
        n = 2, minOverlap = 3)
      .select("doc_id", "n_grams", "n_overlap")
      .as[(Long, Long, Long)].collect().toSet
    assert(exact.nonEmpty, "fixture must produce overlaps")
    assert(bloom == exact)
  }

  test("decontaminate flags benchmark overlap, hashed and string grams agree") {
    val bench = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (1L, "totally unrelated words about spark query planning engines"),
      (2L, "he said the quick brown fox jumps over whatever it likes"),
      (3L, "the quick brown fox jumps over the lazy dog tonight again"))
      .toDF("doc_id", "text")
    def run(hashed: Boolean) = Corpus.decontaminate(corpus, bench,
        "text", "doc_id", n = 3, minOverlap = 2, hashGrams = hashed)
      .select("doc_id", "n_overlap").as[(Long, Long)].collect().toMap
    val byString = run(false)
    assert(!byString.contains(1L), "clean doc must not flag")
    assert(byString.contains(2L) && byString.contains(3L))
    assert(byString(3L) > byString(2L),
      "near-copy must overlap more than partial quote")
    assert(run(true) == byString,
      "hashed and string gram joins must produce identical counts")
  }

  test("stratifiedSample keeps configured fractions deterministically") {
    val docs = (1L to 2000L)
      .map(i => (i, if (i % 2 == 0) "en" else "de", s"document text $i"))
      .toDF("doc_id", "lang", "text")
    val out = Corpus.stratifiedSample(docs, "text", "lang",
        rates = Map("en" -> 0.25))
      .select("doc_id", "lang").as[(Long, String)].collect()
    val en = out.count(_._2 == "en")
    assert(out.count(_._2 == "de") == 1000, "default rate keeps everything")
    assert(en > 150 && en < 350, s"~25% of 1000 en docs expected, got $en")
    val again = Corpus.stratifiedSample(docs.orderBy(rand(3)), "text", "lang",
        rates = Map("en" -> 0.25))
      .select("doc_id").as[Long].collect().toSet
    assert(again == out.map(_._1).toSet, "sample must be order-independent")
  }

  test("waterfillBudget: exact budget, saturation order, fair remainder") {
    val docs = Seq(
      ("a", 10L), ("b", 100L), ("c", 1000L), ("d", 1000L), ("e", 5000L)
    ).flatMap { case (g, n) => Seq((g, ("x " * n.toInt).trim)) }
      .toDF("lang", "text")
    val out = Corpus.waterfillBudget(docs, "lang",
        size(graft.functions.wordTokens(col("text"))).cast("long"),
        budgetNum = 1L, budgetDen = 2L) // B = 7110/2 = 3555
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    // total=7110, B=3555; levelling e down to c/d's 1000 frees only
    // 4000 of the needed 3555 cut, so a..d all saturate (2110) and e is
    // levelled to the 1445 that spends the budget exactly
    assert(out("a") == ((10L, 10L, true)))
    assert(out("b") == ((100L, 100L, true)))
    assert(out("c") == ((1000L, 1000L, true)))
    assert(out("d") == ((1000L, 1000L, true)))
    assert(out("e") == ((5000L, 1445L, false)))
    assert(out.values.map(_._2).sum == 3555L, "allocations spend B exactly")

    // remainder path: three equal groups, B = 30*2/3 = 20 -> base 6,
    // remainder 2 goes one token each to the first two in (avail, lang)
    // order
    val eq = Seq("p", "q", "r").map(g => (g, "x x x x x x x x x x"))
      .toDF("lang", "text")
    val rem = Corpus.waterfillBudget(eq, "lang",
        size(graft.functions.wordTokens(col("text"))).cast("long"),
        budgetNum = 2L, budgetDen = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(rem == Map("p" -> 7L, "q" -> 7L, "r" -> 6L), rem.toString)

    // budget >= total supply: every group saturates, nothing is cut
    val all = Corpus.waterfillBudget(docs, "lang",
        size(graft.functions.wordTokens(col("text"))).cast("long"),
        budgetNum = 1L, budgetDen = 1L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3)))
    assert(all.forall { case (av, al, sat) => al == av && sat })
  }

  test("temperatureMix: sqrt weights, floor allocation, sampling factor") {
    // token counts 1 / 4 / 16 -> sqrt weights 1 / 2 / 4 -> 1/7, 2/7, 4/7
    val docs = Seq(("a", "x"), ("b", "x x x x"),
      ("c", ("x " * 16).trim)).toDF("lang", "text")
    val out = Corpus.temperatureMix(docs, "lang",
        size(graft.functions.wordTokens(col("text"))).cast("long"),
        budget = 7000L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out("a")._1 == 1L && out("b")._1 == 4L && out("c")._1 == 16L)
    // weights round(1/7), round(2/7), round(4/7) at 6 dp
    assert(out("a")._2 == 0.142857 && out("b")._2 == 0.285714 &&
      out("c")._2 == 0.571429, out.toString)
    // exact allocations: 7000/7, 14000/7, 28000/7
    assert(out("a")._3 == 1000L && out("b")._3 == 2000L &&
      out("c")._3 == 4000L, out.toString)
    // natural shares 1/21, 4/21, 16/21 -> factors 3, 1.5, 0.75:
    // smallest group up-sampled 3x, dominant group down-sampled
    assert(out("a")._4 == 3.0 && out("b")._4 == 1.5 &&
      out("c")._4 == 0.75, out.toString)
  }

  test("naiveBayesClassify: disjoint vocab separates, smoothing covers " +
      "unseen tokens, tie breaks to smaller class") {
    // two classes with disjoint vocabulary: resubstitution is perfect
    val docs = Seq(
      (0L, "aa", "apple banana apple cherry"),
      (1L, "aa", "banana banana cherry apple"),
      (2L, "bb", "dog elephant fox dog"),
      (3L, "bb", "fox dog elephant elephant")
    ).toDF("doc_id", "lang", "text")
    val out = graft.ops.TrainingData.naiveBayesClassify(docs)
      .collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getString(2),
        r.getLong(3)))
      .toMap
    assert(out.size == 4)
    assert(out.forall { case (_, (truth, pred, ok)) =>
      truth == pred && ok == 1L }, out.toString)

    // a token unseen in one class scores there via the Laplace floor
    // (doc 2 contains "right", never seen under aa, yet aa still wins
    // on its heavier "left" mass and larger prior)
    val smoothed = Seq(
      (0L, "aa", "left left"),
      (1L, "bb", "right right"),
      (2L, "aa", "left right")
    ).toDF("doc_id", "lang", "text")
    val s = graft.ops.TrainingData.naiveBayesClassify(smoothed)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s(2L) == "aa", s.toString)

    // exact score tie (fully symmetric classes, equal priors): the
    // argmax min(struct(-score, class)) breaks to the SMALLER class name
    val tied = Seq((0L, "aa", "left"), (1L, "bb", "left"))
      .toDF("doc_id", "lang", "text")
    val t = graft.ops.TrainingData.naiveBayesClassify(tied)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(t == Map(0L -> "aa", 1L -> "aa"), t.toString)
  }

  test("naiveBayes maxVocab cap: binds on an over-vocab corpus (top-V by " +
      "frequency + OOV bucket, hand-computed), no-ops when unbound") {
    import graft.ops.TrainingData
    // vocab {alpha:2, beta:1, delta:2, gamma:1} = 4 types; maxVocab=2
    // keeps {alpha, delta} (tf desc, tok asc), folds beta/gamma to OOV
    val docs = Seq(
      (0L, "aa", "alpha alpha beta"),
      (1L, "bb", "gamma delta delta")
    ).toDF("doc_id", "lang", "text")
    val sc = TrainingData.naiveBayesScores(docs, docs, "text", "doc_id",
        "lang", maxVocab = 2)
      .collect()
      .map(r => (r.getLong(0), r.getString(2)) -> r.getDouble(3)).toMap
    // v = 2 fitted + 1 OOV = 3; per class tot=3 -> den=6; priors ln(1/2)
    // doc0 tokens (alpha, alpha, OOV):
    //   aa: ln(1/2) + 2 ln((2+1)/6) + ln((1+1)/6) = 3 ln(1/2) + ln(1/3)
    //   bb: ln(1/2) + 2 ln((0+1)/6) + ln((1+1)/6)
    val l2 = math.log(0.5); val l3 = math.log(1.0 / 3)
    val l6 = math.log(1.0 / 6)
    assert(math.abs(sc((0L, "aa")) - (3 * l2 + l3)) < 1e-9, sc.toString)
    assert(math.abs(sc((0L, "bb")) - (l2 + 2 * l6 + l3)) < 1e-9,
      sc.toString)
    assert(math.abs(sc((1L, "bb")) - (3 * l2 + l3)) < 1e-9, sc.toString)

    // fit path: the collect is capped — ≤ maxVocab tokens per class,
    // floor = the class OOV-bucket probability ln((oov+1)/den)
    val m = TrainingData.naiveBayesFit(docs, maxVocab = 2)
    assert(m.map(_.name) == Seq("aa", "bb"))
    assert(m.forall(_.logp.size <= 2), m.toString)
    assert(m.forall(_.logp.keySet.subsetOf(Set("alpha", "delta"))))
    assert(m.forall(c => math.abs(c.floor - l3) < 1e-12), m.toString)
    // collected model agrees with the grid path (OOV floor scores beta)
    val pred = docs.select(col("doc_id"),
        TrainingData.nbPredictColumn(m,
          graft.functions.wordTokens(col("text"))).as("p"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(pred == Map(0L -> "aa", 1L -> "bb"), pred.toString)

    // tf tie at the cap boundary breaks token-asc: {aa,bb,cc} all tf=1,
    // maxVocab=2 keeps aa,bb
    val tiedV = Seq((0L, "x", "aa bb cc")).toDF("doc_id", "lang", "text")
    val mt = TrainingData.naiveBayesFit(tiedV, maxVocab = 2)
    assert(mt.head.logp.keySet == Set("aa", "bb"), mt.toString)

    // unbound cap is bit-identical to the (oracle-replayed) uncapped
    // arithmetic: same corpus, generous cap vs default
    val wide = TrainingData.naiveBayesScores(docs, docs, "text",
        "doc_id", "lang", maxVocab = 100)
      .collect()
      .map(r => (r.getLong(0), r.getString(2)) -> r.getDouble(3)).toMap
    val dflt = TrainingData.naiveBayesScores(docs, docs, "text",
        "doc_id", "lang")
      .collect()
      .map(r => (r.getLong(0), r.getString(2)) -> r.getDouble(3)).toMap
    assert(wide == dflt, s"$wide vs $dflt")
    // and the unbound fit keeps the plain Laplace floor ln(1/(tot+V))
    val mu = TrainingData.naiveBayesFit(docs)
    assert(mu.forall(c => math.abs(c.floor - math.log(1.0 / 7)) < 1e-12),
      mu.toString) // den = tot 3 + v 4 = 7, no OOV type
  }

  test("aucFromScores: hand-computed AUC with ties, perfect and inverted") {
    import graft.ops.TrainingData.aucFromScores
    // class x: positives {0.9, 0.5}, negatives {0.5, 0.1}
    // ranks asc: 0.1→1, tie(0.5,0.5)→avg 2.5, 0.9→4
    // AUC = (2.5 + 4 − 2·3/2) / (2·2) = 0.875
    val sc = Seq(
      (0L, "x", "x", 0.9), (1L, "x", "x", 0.5),
      (2L, "y", "x", 0.5), (3L, "y", "x", 0.1),
      // class y: perfect separation → 1.0
      (2L, "y", "y", 0.8), (3L, "y", "y", 0.7),
      (0L, "x", "y", 0.2), (1L, "x", "y", 0.1),
      // class z: inverted ranking → 0.0 (z-positive scored lowest)
      (4L, "z", "z", 0.1), (0L, "x", "z", 0.5), (1L, "x", "z", 0.9)
    ).toDF("doc_id", "truth", "clazz", "score")
    val out = aucFromScores(sc).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("x") == ((2L, 2L, 0.875)), out.toString)
    assert(out("y") == ((2L, 2L, 1.0)), out.toString)
    assert(out("z") == ((1L, 2L, 0.0)), out.toString)

    // a class with no negatives in the frame is excluded (AUC undefined)
    val onlyPos = Seq((0L, "w", "w", 0.5)).toDF("doc_id", "truth",
      "clazz", "score")
    assert(aucFromScores(onlyPos).count() == 0L)
  }

  test("curriculumBands: hand-computed bands and cumulative share") {
    // corpus: "a a" and "b" → p(a)=2/3, p(b)=1/3
    // xent(doc0) = -ln(2/3) ≈ 0.405465 → band 40
    // xent(doc1) = -ln(1/3) ≈ 1.098612 → band 109
    val docs = Seq((0L, "a a"), (1L, "b")).toDF("doc_id", "text")
    val out = graft.ops.TrainingData.curriculumBands(docs)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out == Map(
      40L -> ((1L, 2L, 0.666667)),  // 2 of 3 tokens by band 40
      109L -> ((1L, 1L, 1.0))), out.toString)
  }

  test("passageFilterRebuild: rare-token passages drop, docs rebuild") {
    // c appears 32× (p=32/40, surprisal ≈0.223); each r_i once
    // (≈3.689 > the 3.45 bar) — doc 0's second chunk is dropped
    val common = Seq.fill(8)("c").mkString(" ")
    val rare = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = (Seq((0L, s"$common $rare")) ++
      (1L to 3L).map(i => (i, common))).toDF("doc_id", "text")
    val out = graft.ops.TrainingData.passageFilterRebuild(docs)
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(0L) == ((2L, 1L, common)), out.toString)
    (1L to 3L).foreach(i => assert(out(i) == ((1L, 1L, common))))

    // tighten the bar below even the common chunk: everything drops,
    // documents survive as empty shells (the q209 all-lost contract)
    val none = graft.ops.TrainingData.passageFilterRebuild(docs,
        maxXent = 0.1)
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(none.forall(p => p._1 == 0L && p._2 == ""), none.toSeq.toString)
  }

  test("mixWithPriority keeps the highest-priority copy of each content") {
    val curated = Seq((10L, "shared body one"), (11L, "curated only"))
      .toDF("doc_id", "text")
    val web = Seq((20L, "shared body one"), (21L, "web only"),
      (22L, "web only")) // 21/22 same content: id breaks the tie
      .toDF("doc_id", "text")
    val out = Corpus.mixWithPriority(Seq(curated, web), "text", "doc_id")
      .select("doc_id", "src").as[(Long, Int)].collect().toSet
    assert(out == Set((10L, 0), (11L, 0), (21L, 1)), out.toString)
  }

  test("packSequences: shards cut at the token budget, grouped mode partitions") {
    val df = Seq((1L, 1000L), (2L, 1000L), (3L, 1000L), (4L, 100L))
      .toDF("doc_id", "n_tokens")
    val out = Corpus.packSequences(df, "doc_id", "n_tokens", budget = 2048)
      .select("doc_id", "shard").as[(Long, Long)].collect().toMap
    // offsets 0,1000,2000,3000 → shards 0,0,0 (starts<2048? 2000<2048 yes),1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 1L), out.toString)
    val grouped = Corpus.packSequences(
      Seq(("a", 1L, 3000L), ("a", 2L, 100L), ("b", 3L, 100L))
        .toDF("grp", "doc_id", "n_tokens"),
      "doc_id", "n_tokens", budget = 2048, groupCol = Some("grp"))
      .select("grp", "doc_id", "shard").as[(String, Long, Long)]
      .collect().toSet
    assert(grouped == Set(("a", 1L, 0L), ("a", 2L, 1L), ("b", 3L, 0L)))
  }

  test("encodeIds: frequency-ranked ids, lexicographic ties, OOV zero") {
    // counts: b=3, a=2, c=1, z=1 -> ids b=1, a=2, c=3 (vocabSize 3); z OOV
    val docs = Seq((1L, "a b c"), (2L, "b a z b")).toDF("doc_id", "text")
    val out = Corpus.encodeIds(docs, "text", "doc_id", vocabSize = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getSeq[Long](2).toList))).toMap
    assert(out(1L) == ((3L, List(2L, 1L, 3L))))
    assert(out(2L) == ((4L, List(1L, 2L, 0L, 1L))))
  }

  test("encodeIds round-trips in-vocab tokens through the id map") {
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents").limit(100)
    val enc = Corpus.encodeIds(docs, "text", "doc_id", vocabSize = 64)
    val rows = enc.collect()
    assert(rows.nonEmpty)
    // every id is within [0, 64]; n_tokens matches the id sequence length
    assert(rows.forall { r =>
      val ids = r.getSeq[Long](2)
      ids.size == r.getLong(1) && ids.forall(i => i >= 0L && i <= 64L)
    })
    // id frequencies are consistent with rank: id 1 is at least as
    // frequent corpus-wide as id 2 (frequency-ordered vocabulary)
    val freq = rows.flatMap(_.getSeq[Long](2)).filter(_ > 0)
      .groupBy(identity).map { case (k, v) => k -> v.size }
    assert(freq.getOrElse(1L, 0) >= freq.getOrElse(2L, 0))
  }

  test("boilerplatePassages flags cross-doc shared passages, counts partial chunks") {
    // 8-token passages: P1 is shared by docs 1 and 2; every other passage
    // is unique. Doc 3 has 12 tokens -> one full + one partial chunk.
    val p1 = (1 to 8).map(i => s"w$i").mkString(" ")
    val uniq = (n: Int) => (1 to 8).map(i => s"u${n}t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$p1 ${uniq(1)}"),         // P1 + unique        -> 1/2 boiler
      (2L, s"${uniq(2)} $p1"),         // unique + P1        -> 1/2 boiler
      (3L, s"${uniq(3)} x1 x2 x3 x4")) // unique + 4-tok tail-> 0/2 boiler
      .toDF("doc_id", "text")
    val out = graft.ops.TrainingData.boilerplatePassages(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getAs[Long]("n_passages"), r.getAs[Long]("n_boiler"),
          r.getAs[Double]("boiler_frac")))).toMap
    assert(out(1L) == ((2L, 1L, 0.5)))
    assert(out(2L) == ((2L, 1L, 0.5)))
    assert(out(3L) == ((2L, 0L, 0.0)))
  }

  test("boilerplatePassages: a passage repeated only within one doc is not boilerplate") {
    val p = (1 to 8).map(i => s"r$i").mkString(" ")
    val docs = Seq((1L, s"$p $p"), (2L, (1 to 8).map("z" + _).mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.ops.TrainingData.boilerplatePassages(docs)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("n_boiler")).toMap
    // doc 1 repeats p twice, but no OTHER doc carries it -> pdf = 1
    assert(out(1L) == 0L && out(2L) == 0L)
  }

  test("c4QualityFilter: each rule fires on exactly its crafted doc") {
    // 40 varied tokens incl. stopwords -> passes everything
    val good = ((1 to 38).map(i => s"word$i") ++ Seq("the", "of"))
      .mkString(" ")
    val short = "only five tokens right here"
    // 20x the same token out of 40 (plus 'the' to satisfy stop rule)
    val repetitive = (Seq.fill(20)("spam") ++
      (1 to 19).map(i => s"word$i") ++ Seq("the")).mkString(" ")
    // 35 distinct 2-char tokens incl. 2-char stopwords -> only word_len
    val shortWords = ((0 until 33).map(i =>
      "" + ('a' + i / 26).toChar + ('a' + i % 26).toChar) ++
      Seq("in", "is")).mkString(" ")
    val noStops = (1 to 40).map(i => s"token$i").mkString(" ")
    val docs = Seq((0L, good), (1L, short), (2L, repetitive),
      (3L, shortWords), (4L, noStops)).toDF("doc_id", "text")
    val out = Corpus.c4QualityFilter(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5),
          r.getBoolean(6))).toMap
    assert(out(0L) == (false, false, false, false, true), s"good: ${out(0L)}")
    assert(out(1L)._1, "short doc fails too_short")
    assert(out(2L) == (false, false, true, false, false),
      s"repetitive: ${out(2L)}")
    assert(out(3L)._2 && !out(3L)._3 && !out(3L)._4 && !out(3L)._5,
      s"short-words: ${out(3L)}")
    assert(out(4L) == (false, false, false, true, false),
      s"no-stopwords: ${out(4L)}")
  }

  test("capPerDomain keeps exactly min(cap, |domain|) docs, a subset, " +
      "deterministically") {
    val docs = (0L until 40L).map(i =>
      (i, s"dom${i % 3}", s"text body number $i")).toDF("doc_id", "source",
      "text")
    val out = Corpus.capPerDomain(docs, "source", "doc_id", "text", 5)
    val perDom = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // 40 docs over 3 domains (14/13/13) — every domain caps at 5
    assert(perDom == Map("dom0" -> 5L, "dom1" -> 5L, "dom2" -> 5L), perDom)
    // a small domain is kept whole (keep-all sentinel path)
    val tiny = (0L until 3L).map(i => (i, "only", s"t $i"))
      .toDF("doc_id", "source", "text")
    assert(Corpus.capPerDomain(tiny, "source", "doc_id", "text", 5)
      .count() == 3)
    // selection is a subset of the input and stable across runs
    val ids1 = out.select("doc_id").collect().map(_.getLong(0)).sorted
    val ids2 = Corpus.capPerDomain(docs, "source", "doc_id", "text", 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(ids1.sameElements(ids2))
    assert(ids1.forall(_ < 40L))
  }

  test("capPerDomain threshold ≡ the row_number window it replaces") {
    val docs = (0L until 60L).map(i =>
      (i, s"d${i % 4}", s"document $i payload")).toDF("doc_id", "source",
      "text")
    val fast = Corpus.capPerDomain(docs, "source", "doc_id", "text", 7)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(md5(concat(col("text"), lit(":"), col("doc_id"))))
    val naive = docs
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 7)
      .select("source", "doc_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(fast == naive)
  }

  test("tokenSetDedup collapses reordered / repeated-token variants only") {
    val docs = Seq(
      (10L, "alpha beta gamma"),
      (11L, "gamma beta alpha alpha"), // same token SET as 10
      (12L, "alpha beta gamma delta"), // superset — different set
      (13L, "alpha  beta   gamma")     // whitespace noise, same set as 10
    ).toDF("doc_id", "text")
    val out = Corpus.tokenSetDedup(docs, "doc_id", "text")
      .collect().map(r =>
        r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(10L) == ((3L, true)), out(10L)) // canonical = min doc_id
    assert(out(11L) == ((3L, false)))
    assert(out(13L) == ((3L, false)))
    assert(out(12L) == ((1L, true)))
  }

  test("unigramSurprisal matches a hand computation; common text scores " +
      "lower than rare text") {
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = graft.ops.TrainingData.unigramSurprisal(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    def s(c: Int) = BigDecimal(-math.log(c / 5.0))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // counts: a=2, b=2, c=1 over 5 tokens
    assert(out(1L)._1 == 3L)
    assert(out(1L)._2 == r6(BigDecimal((s(2) * 2 + s(2)).toDouble / 3)),
      out.toString)
    assert(out(2L)._2 == r6(BigDecimal((s(2) + s(1)).toDouble / 2)))
    assert(out(2L)._2 > out(1L)._2, "rare token must raise surprisal")
  }

  test("tokenBudgetSelect ≡ the naive global cumulative window") {
    // 60 docs, scores spread over many bins, budget splits inside a bin
    val docs = (0L until 60L).map { i =>
      val uniq = (1 + (i % 7)).toInt // distinct tokens per doc
      val reps = (1 + (i % 3)).toInt
      val toks = (0 until uniq).flatMap(k => Seq.fill(reps)(s"w${i}_$k"))
      (i, toks.mkString(" "))
    }.toDF("doc_id", "text")
    val budget = 150L
    val fast = graft.ops.TrainingData
      .tokenBudgetSelect(docs, "doc_id", "text", budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc, col("doc_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, 0)
    val naive = docs.select(col("doc_id"),
        size(graft.functions.wordTokens(col("text"))).cast("long")
          .as("n_tokens"),
        size(graft.functions.wordNgrams(col("text"), 1)).cast("long")
          .as("n_distinct"))
      .filter(col("n_tokens") > 0)
      .withColumn("score", round(col("n_distinct").cast("double") /
        col("n_tokens").cast("double"), 6))
      .withColumn("run", sum(col("n_tokens")).over(w))
      .filter(col("run") <= budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(fast == naive, s"fast=$fast naive=$naive")
    assert(fast.nonEmpty && fast.size < 60, s"budget must bite: $fast")
  }

  test("q156 survivorship: one keep per cluster, survivor is the " +
      "longest member, clusters agree with q55") {
    val out = Corpus.q156ClusterSurvivor(TestSpark.spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3)))
    assert(out.nonEmpty, "fixture must form clusters")
    val byCluster = out.groupBy(_._2)
    byCluster.foreach { case (root, rows) =>
      assert(rows.count(_._4) == 1, s"cluster $root keep count")
      val sid = rows.head._3
      assert(rows.forall(_._3 == sid), s"cluster $root survivor differs")
      assert(rows.exists(_._1 == sid), s"survivor $sid outside cluster")
    }
    val nchars = TestSpark.spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    byCluster.foreach { case (root, rows) =>
      val best = rows.map(r => (-nchars(r._1), r._1)).min._2
      assert(rows.head._3 == best, s"cluster $root: wrong survivor")
    }
    val q55 = Corpus.q55DedupClusters(TestSpark.spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.map(r => r._1 -> r._2).toMap == q55,
      "cluster membership must match q55")
  }

  test("q159 leakage matrix: totals reconcile with the raw pair set, " +
      "matrix is upper-triangular") {
    val spark = TestSpark.spark
    val out = Corpus.q159SourceLeakage(spark, TestSpark.sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(out.nonEmpty, "fixture must produce near-dup pairs")
    assert(out.forall(r => r._1 <= r._2), "least/greatest normalization")
    val docs = spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet")
    val nPairs = graft.ops.Dedup.ngramJaccardPairs(docs, "text", "doc_id",
      n = 3, minJaccard = 0.05).count()
    assert(out.map(_._3).sum == nPairs, "every pair lands in one cell")
  }

  test("q160 cluster split: near-dup clusters never straddle splits, " +
      "every doc assigned") {
    val spark = TestSpark.spark
    val out = Corpus.q160ClusterSplit(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val nDocs = spark.read
      .parquet(s"${TestSpark.sfDir}/documents.parquet").count()
    assert(out.length == nDocs, "every document gets a split")
    assert(out.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    out.groupBy(_._2).foreach { case (root, rows) =>
      assert(rows.map(_._3).distinct.length == 1,
        s"cluster $root straddles splits: ${rows.toSeq}")
    }
    // the fixture must actually exercise the property on a real cluster
    assert(out.groupBy(_._2).exists(_._2.length > 1),
      "fixture must contain at least one multi-doc cluster")
  }

  test("q161 yield funnel: monotone per source, cap respected, " +
      "stage counts reconcile") {
    val spark = TestSpark.spark
    val out = Corpus.q161PipelineYield(spark, TestSpark.sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out.nonEmpty)
    out.foreach { case (s, (t, q, d, f)) =>
      assert(t >= q && q >= d && d >= f, s"$s not monotone: $t $q $d $f")
      assert(f <= 10, s"$s exceeds the cap: $f")
    }
    val qTotal = Corpus.c4QualityFilter(
      spark.read.parquet(s"${TestSpark.sfDir}/documents.parquet"),
      "doc_id", "text").filter(col("keep")).count()
    assert(out.values.map(_._2).sum == qTotal,
      "per-source quality counts must sum to the corpus-level count")
  }

  test("embargoSplitAudit: zone counters partition each user's events; " +
      "boundaries land cutoff→embargo and cutoff+gap→test") {
    def ts(day: Int, h: Int) =
      java.time.LocalDateTime.of(2024, 1, day, h, 0)
    val ev = Seq(
      (1L, 1L, ts(18, 0)), (2L, 1L, ts(19, 23)),  // train
      (3L, 1L, ts(20, 0)),                        // == cutoff → embargo
      (4L, 1L, ts(22, 0)), (5L, 1L, ts(22, 1)), (6L, 1L, ts(25, 0)), // test
      (7L, 2L, ts(10, 0)), (8L, 2L, ts(15, 0)),   // train only
      (9L, 3L, ts(21, 12))                        // embargo only
    ).toDF("event_id", "user_id", "ts")
    val out = Corpus.embargoSplitAudit(ev, "2024-01-20 00:00:00", 2)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(out(1L) == ((2L, 1L, 3L, true)), out(1L).toString)
    assert(out(2L) == ((2L, 0L, 0L, false)))
    assert(out(3L) == ((0L, 1L, 0L, false)))
    // the three zones partition the event set
    assert(out.values.map(v => v._1 + v._2 + v._3).sum == ev.count())
  }

  test("bigramCrossEntropy matches a hand computation; corpus-typical " +
      "pairs score lower than novel pairs") {
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = graft.ops.TrainingData
      .bigramCrossEntropy(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // unigrams: a=3, b=2, c=1, N=6; bigrams: "a b"=2, "b a"=1, "a c"=1
    def s(c2: Int, cPrev: Int, cCur: Int) = BigDecimal(
        -math.log(0.7 * (c2.toDouble / cPrev) +
          (1.0 - 0.7) * (cCur.toDouble / 6.0)))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    def r6(x: BigDecimal) =
      x.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val sAB = s(2, 3, 2); val sBA = s(1, 2, 3); val sAC = s(1, 3, 1)
    assert(out(1L)._1 == 3L && out(2L)._1 == 1L)
    assert(out(1L)._2 == r6(BigDecimal((sAB * 2 + sBA).toDouble / 3)),
      out.toString)
    assert(out(2L)._2 == r6(BigDecimal(sAC.toDouble / 1)))
    assert(out(2L)._2 > out(1L)._2,
      "novel pair must out-surprise the corpus-typical pairs")
  }

  test("bpeFit: deterministic merges by hand — most frequent pair first, " +
      "lexicographic ties, stop when no pair repeats") {
    // words: ab x3, abc x1. pairs: (a,b)=4 > (b,</w>)=3 > rest
    val docs = Seq((1L, "ab ab"), (2L, "ab abc")).toDF("doc_id", "text")
    val m = Corpus.bpeFit(docs, "text", numMerges = 10)
    assert(m.merges == Seq(("a", "b"), ("ab", "</w>")), m.merges.toString)
    // alphabet a,b,c + </w> + the two merged symbols, ids from 1
    assert(m.vocab.keySet ==
      Set("a", "b", "c", "</w>", "ab", "ab</w>"), m.vocab.toString)
    assert(!m.vocab.values.exists(_ == 0L), "id 0 is reserved for unknown")
    // encode: "ab" collapses to ONE symbol, "abc" to three
    val enc = Seq((1L, "ab abc")).toDF("doc_id", "text")
      .select(graft.functions.bpeEncode(
        graft.functions.wordTokens(col("text")), m.merges, m.vocab).as("ids"))
      .head.getSeq[Long](0)
    assert(enc.length == 4, enc.toString) // [ab</w>] + [ab, c, </w>]
    assert(enc.head == m.vocab("ab</w>"))
    assert(enc.drop(1) ==
      Seq(m.vocab("ab"), m.vocab("c"), m.vocab("</w>")))
  }

  test("q202 BPE: lossless round-trip and per-word bounds hold on the " +
      "real corpus; compression is real (fewer symbols than characters)") {
    val out = Corpus.q202BpeEncode(spark, TestSpark.sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2), s"bounds violated at doc ${r.getLong(0)}")
      assert(r.getBoolean(3), s"round-trip failed at doc ${r.getLong(0)}")
    }
    // the fitted merges actually compress: total subword count across
    // the corpus is strictly below character count (chars + markers)
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
    val model = Corpus.bpeFit(docs, "text")
    val tk = graft.functions.wordTokens(col("text"))
    val sums = docs.select(
        size(graft.functions.bpeEncode(tk, model.merges, model.vocab))
          .cast("long").as("n_bpe"),
        (size(tk) + aggregate(tk, lit(0), (a, w) => a + length(w)))
          .cast("long").as("n_chars_marked"))
      .agg(sum(col("n_bpe")), sum(col("n_chars_marked"))).head
    assert(sums.getLong(0) < sums.getLong(1),
      s"no compression: ${sums.getLong(0)} vs ${sums.getLong(1)}")
  }

  test("BPE encode of a character outside the fitted alphabet yields the " +
      "unknown id and a round-trip that visibly fails") {
    val fitDocs = Seq((1L, "alpha beta gamma alpha beta"))
      .toDF("doc_id", "text")
    val m = Corpus.bpeFit(fitDocs, "text", numMerges = 20)
    val enc = Seq((1L, "alpha x7")).toDF("doc_id", "text")
      .select(graft.functions.bpeEncode(
        graft.functions.wordTokens(col("text")), m.merges, m.vocab).as("ids"))
    val ids = enc.head.getSeq[Long](0)
    assert(ids.contains(0L), s"digit 7 is outside the alphabet: $ids")
    val decoded = enc
      .select(graft.functions.bpeDecode(col("ids"), m.idToSymbol))
      .head.getString(0)
    assert(decoded.contains("�"),
      s"unknown must decode to the replacement char: $decoded")
    assert(decoded != "alpha x7")
  }

  test("epochShuffle: positions are a 1..size permutation per shard, " +
      "replays are identical, re-seeding reorders") {
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
    val a = Corpus.epochShuffle(docs, "doc_id", "epoch-0", 64, 2).collect()
    assert(a.length == 500)
    a.groupBy(_.getLong(1)).foreach { case (shard, rows) =>
      val ps = rows.map(_.getLong(2)).sorted
      assert(ps.toSeq == (1L to rows.length).toSeq,
        s"shard $shard positions not 1..n: ${ps.take(5).toSeq}")
    }
    val b = Corpus.epochShuffle(docs, "doc_id", "epoch-0", 64, 2).collect()
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq,
      "same seed must replay byte-identically")
    val c = Corpus.epochShuffle(docs, "doc_id", "epoch-1", 64, 2)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val moved = a.count(r =>
      c(r.getLong(0)) != ((r.getLong(1), r.getLong(2))))
    assert(moved > 400, s"re-seeding must reshuffle; only $moved moved")
  }

  test("epochShuffle: shard-space headroom guard binds") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Corpus.epochShuffle(docs, "doc_id", "s", nShards = 100, hexDigits = 1)
    }
    assert(e.getMessage.contains("cannot spread"), e.getMessage)
  }

  test("shardManifest: offsets telescope, totals reconcile with q212's " +
      "token count, balance is tight under md5 sharding") {
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
    val m = Corpus.shardManifest(docs, "doc_id", "text", "epoch-0", 64, 2)
      .collect()
    assert(m.map(_.getLong(1)).sum == 500)
    // offset(k) = offset(k-1) + tokens(k-1) exactly, first offset 0
    assert(m.head.getLong(3) == 0L)
    m.sliding(2).foreach { case Array(p, n) =>
      assert(n.getLong(3) == p.getLong(3) + p.getLong(2),
        s"offset break at shard ${n.getLong(0)}")
    }
    val total = m.map(_.getLong(2)).sum
    val exp = docs.select(
      sum(size(graft.functions.wordTokens(col("text"))).cast("long")))
      .head.getLong(0)
    assert(total == exp, s"token total $total != corpus $exp")
    // no empty or >3x-mean shard on this corpus
    assert(m.forall(r => r.getDouble(4) > 0 && r.getDouble(4) < 3.0),
      m.map(_.getDouble(4)).mkString(","))
  }

  test("heapsLaw: cumulative columns are monotone per source, the final " +
      "checkpoint covers the whole source, beta in (0,1]") {
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
    val rows = Corpus.heapsLaw(docs, "text", "source", "doc_id").collect()
    assert(rows.length == 200, s"20 sources x 10 checkpoints: ${rows.length}")
    rows.groupBy(_.getString(0)).foreach { case (src, rs) =>
      val byK = rs.sortBy(_.getLong(1))
      Seq(2, 3, 4).foreach { i => // docs_cum, tokens_cum, vocab_cum
        val v = byK.map(_.getLong(i))
        assert(v.zip(v.tail).forall { case (x, y) => x <= y },
          s"$src col$i not monotone: ${v.toSeq}")
      }
      // a saturated source (full vocab by the first checkpoint) fits a
      // legitimate slope of 0; monotone points can never fit negative
      val beta = byK.head.getDouble(5)
      assert(beta >= 0 && beta <= 1.0, s"$src beta=$beta")
      val nDocs = docs.filter(col("source") === src).count()
      assert(byK.last.getLong(2) == nDocs,
        s"$src k=10 must cover all $nDocs docs")
    }
  }

  test("charCoverage: thresholds nest (cover_999 <= distinct), top-32 " +
      "share in (0,1], totals reconcile with text length") {
    val docs = graft.sources.TableCatalog
      .load(spark, TestSpark.sfDir, "documents")
    val rows = Corpus.charCoverage(docs, "text", "lang").collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getLong(3) <= r.getLong(2),
        s"${r.getString(0)}: cover_999 ${r.getLong(3)} > distinct")
      assert(r.getDouble(4) > 0 && r.getDouble(4) <= 1.0, r.toString)
    }
    val total = rows.map(_.getLong(1)).sum
    val exp = docs.select(sum(length(col("text")).cast("long")))
      .head.getLong(0)
    assert(total == exp, s"char total $total != corpus $exp")
  }

  test("ngramNovelty: first doc fully novel, exact duplicate fully " +
      "stale, sub-n docs carry one truncated gram (q33's contract)") {
    import graft.ops.TrainingData
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "eta theta iota kappa lambda"),          // disjoint
      (4L, "tiny doc"),                             // < 5 tokens
      (5L, "")                                      // no tokens: drops
    ).toDF("doc_id", "text")
    val out = TrainingData.ngramNovelty(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L), out.toString)
    assert(out(1L) == ((2L, 2L, 1.0)), out.toString) // 2 distinct 5-grams
    assert(out(2L) == ((2L, 0L, 0.0)), out.toString)
    assert(out(3L) == ((1L, 1L, 1.0)), out.toString)
    assert(out(4L) == ((1L, 1L, 1.0)), out.toString) // whole-doc gram
  }

  test("packingAudit: hand-computed splits, crossings and pad waste at " +
      "L=4 over a 3-doc layout") {
    // n = [3, 4, 2] -> cum = [3, 7, 9]; intervals [0,3) [3,7) [7,9)
    val toks = Seq((1L, 3L), (2L, 4L), (3L, 2L), (4L, 0L))
      .toDF("doc_id", "n_tokens") // the 0-token doc must drop
    val r = Corpus.packingAudit(toks, "doc_id", "n_tokens", Seq(4))
      .collect()
    assert(r.length == 1)
    val m = r.head
    assert(m.getLong(1) == 3, s"n_docs: $m")
    assert(m.getLong(2) == 9, s"total: $m")
    assert(m.getLong(3) == 3, s"n_seq = ceil(9/4): $m")
    assert(m.getLong(4) == 2, s"docs 2,3 split: $m")
    assert(m.getDouble(5) == 0.666667, s"frac split: $m")
    assert(m.getLong(6) == 2, s"crossings: $m")
    assert(m.getLong(7) == 3, s"pad waste 1+0+2: $m")
    assert(m.getDouble(8) == 0.25, s"3/(3+9): $m")
  }

  test("contaminationReport: leaky item attributed to the worst " +
      "offender (ties to smaller id), clean item reports zero") {
    val five = "alpha beta gamma delta epsilon"
    val corpus = Seq(
      (1L, five + " one two three"),    // shares the 5-gram with bench 10
      (2L, five + " four five six"),    // same overlap as doc 1 -> tie
      (3L, "unrelated words only here entirely")
    ).toDF("doc_id", "text")
    val bench = Seq(
      (10L, five + " zeta eta"),
      (20L, "pristine evaluation item nothing shared")
    ).toDF("doc_id", "text")
    val out = Corpus.contaminationReport(corpus, bench, "text", "doc_id",
        n = 5, minOverlap = 1)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(10L).getLong(1) == 2, out(10L).toString) // docs 1 and 2
    assert(out(10L).getLong(2) == 1, out(10L).toString) // 1 shared gram
    assert(out(10L).getLong(3) == 1L,
      s"tie must resolve to the smaller corpus id: ${out(10L)}")
    assert(out(20L).getLong(1) == 0, out(20L).toString)
    assert(out(20L).isNullAt(2) && out(20L).isNullAt(3),
      s"clean item carries null overlap/offender: ${out(20L)}")
  }

  test("prefixCacheShare: shared prefix counted once per extra doc, " +
      "short docs only in totals") {
    import graft.ops.TrainingData
    val docs = Seq(
      (1L, "s", "a b x"), (2L, "s", "a b y"),   // share the 2-token prefix
      (3L, "s", "c d"), (4L, "s", "e")          // lone prefix; sub-k doc
    ).toDF("doc_id", "source", "text")
    val r = TrainingData.prefixCacheShare(docs, "text", "doc_id",
      "source", k = 2).collect()
    assert(r.length == 1)
    val m = r.head
    assert(m.getLong(1) == 4 && m.getLong(2) == 9, m.toString)
    assert(m.getLong(3) == 2, s"prefixes 'a b' and 'c d': $m")
    assert(m.getLong(4) == 1 && m.getLong(5) == 2, m.toString)
    assert(m.getDouble(6) == 0.222222, m.toString)
  }
}
