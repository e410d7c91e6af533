package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Text

class TextSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq(
      ("hello world", 2, 2),
      ("it's 2026, folks!", 3, 7), // it ' s 2026 , folks !
      ("a  b", 2, 2)               // double space
    ).toDF("text", "ws", "bpe")
    df.select(
        Text.tokenCountWs($"text").as("cws"),
        Text.tokenCountBpe($"text").as("cbpe"),
        $"ws", $"bpe")
      .collect().foreach { r =>
        assert(r.getInt(0) == r.getInt(2), s"ws mismatch: $r")
        assert(r.getInt(1) == r.getInt(3), s"bpe mismatch: $r")
      }
  }

  test("language ID picks the right language on curated strings") {
    val df = Seq(
      ("the cat sat on the mat and it was happy", "en"),
      ("der hund ist nicht mit der katze und das ist gut", "de"),
      ("el perro es grande y la casa es blanca en la calle", "es"),
      ("le chien est dans la maison et la porte est grande", "fr"),
      ("你好世界这是中文文本", "zh")
    ).toDF("text", "expected")
    val out = df.select(Text.langIdGuess($"text").as("guess"), $"expected")
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1),
      s"guessed ${r.getString(0)}, expected ${r.getString(1)}"))
  }

  test("quality score: real prose beats junk") {
    val df = Seq(
      ("This is a well formed paragraph of english text that goes on " +
        "for a while and contains the usual mixture of common words, " +
        "so it should score highly in the quality model.", "good"),
      ("@@@@ #### !!!! 1234 %%%% ^^^^ &&&&", "junk")
    ).toDF("text", "kind")
    val scores = df.select($"kind", Text.qualityScore($"text").as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("good") > scores("junk"),
      s"good=${scores("good")} junk=${scores("junk")}")
    assert(scores.values.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("fused WordTokens/WordNgrams/MinHashes are byte-identical to the HOF forms") {
    import graft.functions._
    import graft.sources.TableCatalog
    val docs = TableCatalog.load(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", $"text")
    // plus curated edge cases: empty, separators-only, shorter than n,
    // unicode separators, underscores and digits
    val edge = Seq((9001L, ""), (9002L, " .,;!? "), (9003L, "one two"),
      (9004L, "Hello, WORLD_42 — déjà vu 漢字 test"), (9005L, "single"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(edge)
    val hofToks = filter(split(lower($"text"), "\\W+"), t => length(t) > 0)
    val tokDiff = all.select(wordTokens($"text").as("a"), hofToks.as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(tokDiff == 0, "WordTokens must equal filter(split(lower))")
    val toks = hofToks
    def hofNgrams(n: Int) = array_distinct(filter(transform(
      sequence(lit(0), greatest(size(toks) - n, lit(0))),
      i => concat_ws(" ", slice(toks, i + 1, lit(n)))),
      g => length(g) > 0))
    Seq(2, 3, 8).foreach { n =>
      val d = all.select(wordNgrams($"text", n).as("a"), hofNgrams(n).as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(d == 0, s"WordNgrams($n) must equal the HOF shingle pipeline")
    }
    val sh = all.select(wordNgrams($"text", 3).as("s"))
      .filter(size($"s") > 0)
    val hofMins = array((0 until 4).map { s =>
      array_min(transform($"s", g => xxhash64(lit(s), g)))
    }: _*)
    val mh = sh.select(minHashes($"s", 4).as("a"), hofMins.as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(mh == 0, "MinHashes must equal the seeded xxhash64 minima")
    val hofFp = array_min(transform($"s", g => xxhash64(g)))
    val fp = sh.select(
        element_at(minHashes($"s", 1, seedIndexed = false), 1).as("a"),
        hofFp.as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(fp == 0, "unseeded MinHashes must equal xxhash64 minima")
  }

  test("fused CharNgrams is byte-identical to the HOF substring form") {
    import graft.functions._
    import graft.sources.TableCatalog
    val docs = TableCatalog.load(spark, TestSpark.sfDir, "documents")
      .select($"text")
    val edge = Seq("", "ab", "abc", "abcd", "aaaaaa", "x y z",
      "Hello, WORLD_42 — déjà vu 漢字 test",
      // astral plane: windows must count code points, not UTF-16 units
      "a😀bcd", "😀😁😂xy")
      .toDF("text")
    val all = docs.unionByName(edge)
    Seq(2, 3, 5).foreach { n =>
      // guarded: sequence(1, 0) would count DOWN, so the HOF reference
      // needs an explicit short-string branch
      val hof = when(length($"text") >= n, array_distinct(transform(
        sequence(lit(1), length($"text") - (n - 1)),
        i => $"text".substr(i, lit(n)))))
        .otherwise(array().cast("array<string>"))
      val d = all.select(charNgrams($"text", n).as("a"), hof.as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(d == 0, s"CharNgrams($n) must equal the HOF substring form")
    }
  }

  test("property: fused expressions equal HOF forms on random unicode strings") {
    import graft.functions._
    import org.scalacheck.{Arbitrary, Gen}
    val strs = Gen.listOfN(250, Arbitrary.arbitrary[String])
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(987654321L))
      .getOrElse(sys.error("gen failed"))
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "text")
    val hofToks = filter(split(lower($"text"), "\\W+"), t => length(t) > 0)
    def hofNgrams(n: Int) = array_distinct(filter(transform(
      sequence(lit(0), greatest(size(hofToks) - n, lit(0))),
      i => concat_ws(" ", slice(hofToks, i + 1, lit(n)))),
      g => length(g) > 0))
    val hofChar3 = when(length($"text") >= 3, array_distinct(transform(
      sequence(lit(1), length($"text") - 2),
      i => $"text".substr(i, lit(3)))))
      .otherwise(array().cast("array<string>"))
    val diffs = df.select(
        (not(wordTokens($"text") <=> hofToks)).cast("int").as("d1"),
        (not(wordNgrams($"text", 2) <=> hofNgrams(2))).cast("int").as("d2"),
        (not(wordNgrams($"text", 5) <=> hofNgrams(5))).cast("int").as("d3"),
        (not(charNgrams($"text", 3) <=> hofChar3)).cast("int").as("d4"))
      .agg(sum($"d1"), sum($"d2"), sum($"d3"), sum($"d4")).head()
    assert((0 to 3).forall(i => diffs.getLong(i) == 0), diffs.toString)
  }

  test("VocabEncode is byte-identical to the literal-map element_at form") {
    import graft.functions._
    import graft.sources.TableCatalog
    val docs = TableCatalog.load(spark, TestSpark.sfDir, "documents")
      .select($"doc_id", $"text")
    val edge = Seq((9001L, ""), (9002L, "zz yy zz"), (9003L, "only oov"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(edge)
    val vocab = Map("zz" -> 1L, "table" -> 2L, "key" -> 3L, "a" -> 4L)
    val vocabMap = typedlit(vocab)
    val toks = wordTokens($"text")
    val d = all.select(
        vocabEncode(toks, vocab).as("fused"),
        transform(toks, t => coalesce(element_at(vocabMap, t), lit(0L)))
          .as("hof"))
      .filter(not($"fused" <=> $"hof")).count()
    assert(d == 0, "VocabEncode must equal the literal-map HOF form")
    // spot values: hits map to their ids, OOV to 0, empty stays empty
    val enc = edge.select($"doc_id", vocabEncode(wordTokens($"text"), vocab))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(enc(9001L).isEmpty)
    assert(enc(9002L) == Seq(1L, 0L, 1L))
    assert(enc(9003L) == Seq(0L, 0L))
  }

  test("property: deletion neighbors are distinct, distance<=1, identity-first") {
    import org.scalacheck.{Arbitrary, Gen}
    val strs = Gen.listOfN(150, Arbitrary.arbitrary[String])
      .apply(Gen.Parameters.default, org.scalacheck.rng.Seed(13572468L))
      .getOrElse(sys.error("gen failed"))
      .filter(_.nonEmpty)
    val df = strs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
      .toDF("id", "s")
    val out = df.select($"s",
        graft.functions.deletionNeighbors($"s").as("v"))
      .select($"s", explode($"v").as("variant"),
        levenshtein($"s", col("variant")).as("d"))
    // every variant is within edit distance 1 of the source
    assert(out.filter($"d" > 1).isEmpty)
    // distinctness + identity membership
    val per = df.select($"s",
        graft.functions.deletionNeighbors($"s").as("v"))
      .select($"s", size($"v").as("n"),
        size(array_distinct($"v")).as("nd"),
        element_at($"v", 1).as("first"))
    assert(per.filter($"n" =!= $"nd").isEmpty, "variants must be distinct")
    assert(per.filter($"first" =!= $"s").isEmpty, "identity comes first")
  }

  test("fingerprint is deterministic and shared by identical docs") {
    val df = Seq((0L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (2L, "one two three four five six seven eight nine"))
      .toDF("doc_id", "text")
    val fp = Text.fingerprint(df, "text", "doc_id", w = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L))
    assert(fp(0L) != fp(2L))
  }

  test("DeletionNeighbors ≡ the composable substring-splice HOF form") {
    import org.apache.spark.sql.functions._
    val df = Seq("abc", "a", "aa", "Customer#000000001", "ab£d", "")
      .toDF("s").filter(length(col("s")) > 0)
    val fused = df.select(col("s"),
      graft.functions.deletionNeighbors(col("s")).as("v"))
    val hof = df.select(col("s"), array_distinct(concat(
      array(col("s")),
      transform(sequence(lit(1), length(col("s"))),
        i => concat(col("s").substr(lit(1), i - 1),
          col("s").substr(i + 1, length(col("s")) - i))))).as("v"))
    assert(fused.exceptAll(hof).isEmpty && hof.exceptAll(fused).isEmpty)
    val abc = fused.filter(col("s") === "abc").head.getSeq[String](1)
    assert(abc == Seq("abc", "bc", "ac", "ab"))
  }

}
