package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass tokenization/shingling helpers shared by interpreted eval and
  * generated code.
  *
  * Why these exist: the composable formulations —
  * `filter(split(lower(text), "\\W+"), t -> length(t) > 0)` and the
  * shingle pipeline `array_distinct(filter(transform(sequence(...),
  * i -> concat_ws(" ", slice(toks, i, n)))))` — are built on higher-order
  * functions, which are CodegenFallback in Spark: the whole projection
  * drops out of whole-stage codegen into boxed per-lambda interpretation.
  * Measured on the 5k-document sf0.1 corpus that made *tokenization* the
  * dominant cost of every dedup/text query (~2-6 s per pass). One fused
  * scan per document removes the per-element lambda dispatch and all
  * intermediate arrays while reproducing the composable semantics exactly
  * (same token runs, same edge cases, same ordering), so the DuckDB
  * oracles keep matching bit-for-bit.
  *
  * Tokenization contract (mirrors `split(lower(text), "\\W+")` + non-empty
  * filter, which both Spark and the DuckDB oracle implement identically):
  * lowercase first (full UTF8String lowercase, like `lower()`), then take
  * maximal runs of ASCII word chars `[a-z0-9_]` (Java/RE2 `\w` is ASCII
  * without Unicode flags); everything else separates.
  */
object NgramUtil {

  private def isWordChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9') || c == '_' ||
      (c >= 'A' && c <= 'Z')

  private def tokenStrings(text: UTF8String): mutable.ArrayBuffer[String] = {
    val s = text.toLowerCase.toString
    val toks = new mutable.ArrayBuffer[String]()
    var i = 0
    val len = s.length
    while (i < len) {
      if (isWordChar(s.charAt(i))) {
        val start = i
        while (i < len && isWordChar(s.charAt(i))) i += 1
        toks += s.substring(start, i)
      } else i += 1
    }
    toks
  }

  /** Lowercased word tokens as ArrayData (codegen entry point). */
  def tokens(text: UTF8String): ArrayData = {
    val toks = tokenStrings(text)
    new GenericArrayData(toks.map(UTF8String.fromString).toArray[Any])
  }

  /** Identity + every single-codepoint deletion, first-occurrence-distinct
    * (codegen entry point for [[DeletionNeighbors]]). Codepoint-based to
    * match Spark's substring semantics on non-BMP text. */
  def deletionNeighbors(s: UTF8String): ArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val seen = new java.util.LinkedHashSet[String]()
    seen.add(str)
    var i = 0
    while (i < cps.length) {
      val sb = new java.lang.StringBuilder(str.length)
      var j = 0
      while (j < cps.length) {
        if (j != i) sb.appendCodePoint(cps(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** k seeded xxhash64 minima over a shingle array (codegen entry point
    * for [[MinHashes]]); null on empty input, matching array_min. */
  def minHashes(shingles: ArrayData, k: Int, seedIndexed: Boolean): ArrayData = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(Long.MaxValue)
    val seeds = Array.tabulate(k) { s =>
      if (seedIndexed) XXH64.hashInt(s, 42L) else 42L
    }
    var i = 0
    while (i < n) {
      val g = shingles.getUTF8String(i)
      var s = 0
      while (s < k) {
        // null element: Spark's hash expressions skip null inputs, leaving
        // the running hash at the seed — replicate instead of NPEing
        val h =
          if (g == null) seeds(s)
          else XXH64.hashUnsafeBytes(
            g.getBaseObject, g.getBaseOffset, g.numBytes, seeds(s))
        if (h < mins(s)) mins(s) = h
        s += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash over a token multiset (codegen entry point for
    * [[SimHash64]]): per-bit ±1 votes weighted by each token's xxhash64
    * bit, bit set when the vote sum is positive. */
  def simhash64(tokens: ArrayData): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val n = tokens.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      // null token hashes to the bare seed (Spark hash expressions skip
      // null inputs), never NPEs
      val h =
        if (t == null) 42L
        else XXH64.hashUnsafeBytes(
          t.getBaseObject, t.getBaseOffset, t.numBytes, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Overlapping token-window chunks as ArrayData (codegen entry point for
    * [[WordChunks]]): windows of `size` tokens starting every `stride`
    * tokens, space-joined; the tail window may be shorter; empty text →
    * empty array. */
  def chunks(text: UTF8String, size: Int, stride: Int): ArrayData = {
    val toks = tokenStrings(text)
    val len = toks.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val out = new mutable.ArrayBuffer[UTF8String]((len + stride - 1) / stride)
    var start = 0
    while (start < len) {
      val end = math.min(start + size, len)
      val sb = new java.lang.StringBuilder()
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out += UTF8String.fromString(sb.toString)
      start += stride
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Word n-gram shingles as ArrayData (codegen entry point). Edge cases
    * replicate the composable form: empty text → empty array; fewer than
    * `n` tokens → one shingle of all tokens; `distinct` keeps first
    * occurrences in order (array_distinct semantics). */
  def ngrams(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = tokenStrings(text)
    val len = toks.length
    if (len == 0) return new GenericArrayData(Array.empty[Any])
    val upper = math.max(len - n, 0)
    val out = new mutable.ArrayBuffer[UTF8String](upper + 1)
    val seen = if (distinct) new mutable.HashSet[String]() else null
    var i = 0
    while (i <= upper) {
      val end = math.min(i + n, len)
      val sb = new java.lang.StringBuilder()
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      val gram = sb.toString
      if (seen == null || seen.add(gram)) out += UTF8String.fromString(gram)
      i += 1
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** Distinct character n-grams, first-occurrence order (codegen entry
    * point for [[CharNgrams]]) — the substring-index shingle. Matches
    * `array_distinct(transform(sequence(1, len-n+1), i -> substr(s,i,n)))`
    * exactly: windows count CODE POINTS, like Spark's substr/length —
    * a UTF-16-unit window would split surrogate pairs and emit mangled
    * grams on astral-plane text. Empty below n code points. */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val len = s.length
    // surrogate-free fast path (the overwhelming case): code points ==
    // UTF-16 units, so window directly without the offset table — keeps
    // this hot fused-scan path allocation-free per character
    var hasSurrogate = false
    var k = 0
    while (k < len && !hasSurrogate) {
      if (Character.isHighSurrogate(s.charAt(k))) hasSurrogate = true
      k += 1
    }
    val seen = new mutable.LinkedHashSet[String]()
    if (!hasSurrogate) {
      if (len < n) return new GenericArrayData(Array.empty[Any])
      var i = 0
      while (i + n <= len) {
        seen.add(s.substring(i, i + n))
        i += 1
      }
    } else {
      // code-point start offsets (UTF-16 indices of each code point)
      val starts = new Array[Int](len + 1)
      var cp = 0
      var i = 0
      while (i < len) {
        starts(cp) = i
        cp += 1
        i += Character.charCount(s.codePointAt(i))
      }
      if (cp < n) return new GenericArrayData(Array.empty[Any])
      starts(cp) = len // sentinel: end offset of the final window
      var w = 0
      while (w + n <= cp) {
        seen.add(s.substring(starts(w), starts(w + n)))
        w += 1
      }
    }
    new GenericArrayData(
      seen.iterator.map(UTF8String.fromString).toArray[Any])
  }

  /** Shannon entropy (nats) over the UTF-16 characters of a string
    * (codegen entry point for [[CharEntropy]]); 0.0 for the empty string.
    * Distinct characters are folded in ascending char order so the
    * double summation order is deterministic run-to-run. */
  def charEntropy(text: UTF8String): Double = {
    val s = text.toString
    val n = s.length
    if (n == 0) return 0.0
    val counts = new mutable.HashMap[Char, Int]()
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      counts.update(c, counts.getOrElse(c, 0) + 1)
      i += 1
    }
    val keys = counts.keysIterator.toArray
    java.util.Arrays.sort(keys)
    var h = 0.0
    var k = 0
    while (k < keys.length) {
      val p = counts(keys(k)).toDouble / n
      h -= p * math.log(p)
      k += 1
    }
    h
  }
}

/** Fused lowercased word tokenizer (see [[NgramUtil]] scaladoc). */
case class WordTokens(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_tokens"

  override def nullSafeEval(input: Any): Any =
    NgramUtil.tokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NgramUtil.tokens($x);")

  override protected def withNewChildInternal(
      newChild: Expression): WordTokens = copy(child = newChild)
}

/** Deletion neighborhood of a string in one pass: the identity plus every
  * single-codepoint deletion, first-occurrence-distinct — byte-identical
  * to the composable `array_distinct(concat(array(s),
  * transform(sequence(1, length(s)), i → substr-splice)))` form, whose
  * per-element HOF interpretation made it the hot loop of edit-distance
  * blocking ([[graft.ops.Dedup.editDistancePairs]]). One compiled loop
  * over the codepoints; generated code calls the same method (string
  * assembly dominates, so interpreted-vs-codegen call overhead is
  * immaterial — the win is replacing len interpreted Catalyst substring
  * trees per row with one tight Java loop). */
case class DeletionNeighbors(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_deletion_neighbors"

  override def nullSafeEval(input: Any): Any =
    NgramUtil.deletionNeighbors(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NgramUtil.deletionNeighbors($x);")

  override protected def withNewChildInternal(
      newChild: Expression): DeletionNeighbors = copy(child = newChild)
}

/** k seeded MinHash minima of a shingle set in one pass.
  *
  * Byte-identical to the composable form
  * `array((0 until k).map(s => array_min(transform(shingles,
  * g => xxhash64(lit(s), g)))))` — Spark's XxHash64 chains its arguments,
  * so hash(s, g) = XXH64(gram bytes, seed = XXH64(int s, seed = 42)) —
  * but computed in a single scan over the shingle array instead of k
  * interpreted HOF passes (transform/array_min are CodegenFallback).
  * `seedIndexed = false` reproduces the unseeded single-hash form
  * `xxhash64(g)` used by document fingerprints. Null on empty input
  * (array_min of an empty array is null). */
case class MinHashes(child: Expression, numHashes: Int,
                     seedIndexed: Boolean = true)
    extends UnaryExpression {

  require(numHashes >= 1, "numHashes must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $t")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def nullable: Boolean = true

  override def prettyName: String = "graft_minhashes"

  override def nullSafeEval(input: Any): Any =
    NgramUtil.minHashes(input.asInstanceOf[ArrayData], numHashes, seedIndexed)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, x =>
      s"""
         |${ev.value} =
         |  graft.functions.NgramUtil.minHashes($x, $numHashes, $seedIndexed);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
    code
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashes = copy(child = newChild)
}

/** 64-bit SimHash of a token array in one pass.
  *
  * SimHash is per-document math — every bit's ±1 vote sum ranges over one
  * document's tokens — so it belongs in a projection, not in the
  * explode(tokens) × explode(64 bits) → groupBy shuffle a relational
  * formulation needs (that shape shuffles 64·|tokens| rows per corpus at
  * scale; this one shuffles nothing). Bit b of the signature is set iff
  * Σ_tokens (bit b of xxhash64(token) ? +1 : −1) > 0, byte-identical to
  * the exploded form. */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $t")
  }

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def prettyName: String = "graft_simhash64"

  override def nullSafeEval(input: Any): Any =
    NgramUtil.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NgramUtil.simhash64($x);")

  override protected def withNewChildInternal(
      newChild: Expression): SimHash64 = copy(child = newChild)
}

/** Overlapping token-window chunker — the context-window prep step of a
  * training/RAG pipeline (documents → model-sized pieces with overlap so
  * no boundary context is lost). Same fused-tokenizer contract as the
  * other text expressions; one scan per document, codegen'd. */
case class WordChunks(child: Expression, size: Int, stride: Int)
    extends UnaryExpression {

  require(size >= 1, "size must be >= 1")
  require(stride >= 1, "stride must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_chunks"

  override def nullSafeEval(input: Any): Any =
    NgramUtil.chunks(input.asInstanceOf[UTF8String], size, stride)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NgramUtil.chunks($x, $size, $stride);")

  override protected def withNewChildInternal(
      newChild: Expression): WordChunks = copy(child = newChild)
}

/** Fused word n-gram shingler (see [[NgramUtil]] scaladoc). */
case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_word_ngrams"

  override def nullSafeEval(input: Any): Any =
    NgramUtil.ngrams(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NgramUtil.ngrams($x, $n, $distinct);")

  override protected def withNewChildInternal(
      newChild: Expression): WordNgrams = copy(child = newChild)
}

/** Distinct character n-gram shingles — the trigram-index building block
  * (substring search, q127). One fused loop per row with a reused window
  * buffer; the HOF form (`transform` over `sequence` + per-position
  * `substr`) is CodegenFallback and allocates a Column-sized array of
  * boxed positions per row before distincting. */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "graft_char_ngrams"

  override def nullSafeEval(input: Any): Any =
    NgramUtil.charNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NgramUtil.charNgrams($x, $n);")

  override protected def withNewChildInternal(
      newChild: Expression): CharNgrams = copy(child = newChild)
}

/** Per-document character-entropy (nats) — the classic cheap detector of
  * degenerate/garbage text (base64 blobs, key-mash, repeated filler all
  * sit far from natural-language entropy). Per-document math, so it runs
  * as ONE fused projection over the scan — zero shuffle — where the
  * relational formulation (explode per character → two keyed aggregates)
  * would shuffle |corpus in characters| rows at 100 TB. The DuckDB oracle
  * uses exactly that relational form, checking the fused loop
  * bit-for-bit (modulo the round(6) both sides apply). */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got $t")
  }

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def prettyName: String = "graft_char_entropy"

  override def nullSafeEval(input: Any): Any =
    NgramUtil.charEntropy(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.NgramUtil.charEntropy($x);")

  override protected def withNewChildInternal(
      newChild: Expression): CharEntropy = copy(child = newChild)
}

/** Fitted-vocabulary token encoding: array<string> → array<bigint> via an
  * O(1) hash lookup per token, OOV → 0 — semantics identical to
  * `transform(toks, t -> coalesce(element_at(<literal map>, t), 0L))`.
  *
  * Why it exists: Catalyst's literal-map `element_at` backs onto
  * `ArrayBasedMapData`, whose lookup is a LINEAR SCAN of all K entries
  * with string equality per probe — and a vocabulary MISS (the common
  * case on fresh corpora) always pays the full K compares. That made the
  * q139 encode pass O(tokens·K·token_len): measured ~11 s at the sf1 tier
  * (3M tokens × 256-entry vocab, ~90% OOV) for what is one hash probe per
  * token. This expression holds the fitted vocabulary in a real HashMap
  * (rebuilt once per executor via the transient-lazy fitted-model
  * pattern) and encodes the whole token array in one compiled loop.
  * The vocabulary is runtime-fitted data, so there is no SQL-function
  * registration — construct via [[graft.functions.vocabEncode]]. */
case class VocabEncode(child: Expression,
                       vocab: Map[String, Long]) extends UnaryExpression {

  @transient private lazy val lookup: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](
      math.max(8, vocab.size * 2))
    vocab.foreach { case (k, v) =>
      m.put(UTF8String.fromString(k), java.lang.Long.valueOf(v)) }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> input, got $t")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def prettyName: String = "graft_vocab_encode"

  /** One pass over the token array; called from both eval and codegen. */
  def encode(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      val id = lookup.get(arr.getUTF8String(i))
      out(i) = if (id == null) 0L else id.longValue()
      i += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    encode(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabEncode", this,
      classOf[VocabEncode].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.encode($x);")
  }

  override protected def withNewChildInternal(
      newChild: Expression): VocabEncode = copy(child = newChild)
}
