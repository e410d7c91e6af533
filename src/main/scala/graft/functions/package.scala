package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level helpers shared by operators.
  *
  * Cross-engine determinism: the driver hash-compares our parquet output
  * against DuckDB executing the same SQL. Floating-point SUMs are
  * order-dependent in the last bits, so any aggregate over doubles goes
  * through an exact decimal: each input value is cast to DECIMAL (per-value
  * cast is deterministic — exact decimal ties are not representable in
  * binary doubles at scale 4), summed exactly, then cast back to double
  * (correctly-rounded in both engines). Mirror the same casts in oracle SQL.
  */
package object functions {

  /** Order-independent, cross-engine-exact sum of a double column. */
  def dsum(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(s"decimal($precision,$scale)")).cast("double")

  /** Matching exact average: exact decimal sum / count. */
  def davg(c: Column, precision: Int = 18, scale: Int = 4): Column =
    sum(c.cast(s"decimal($precision,$scale)")).cast("double") / count(c)

  /** DuckDB oracle fragment equivalent to [[dsum]]. */
  def dsumSql(col: String, precision: Int = 18, scale: Int = 4): String =
    s"CAST(SUM(CAST($col AS DECIMAL($precision,$scale))) AS DOUBLE)"

  /** DuckDB oracle fragment equivalent to [[davg]]. */
  def davgSql(col: String, precision: Int = 18, scale: Int = 4): String =
    s"CAST(SUM(CAST($col AS DECIMAL($precision,$scale))) AS DOUBLE) / COUNT($col)"

  // ---------------------------------------------------------------------
  // Embedding vector helpers over ArrayType columns. Built on codegen'd
  // higher-order functions (zip_with/aggregate) — no UDF, no deserialization
  // to Scala objects; elements are widened float→double before accumulating
  // so results are stable and match DuckDB's double arithmetic.
  // ---------------------------------------------------------------------

  /** Dot product of two array<float|double> columns, accumulated in double
    * in element order. Backed by the native codegen [[DotProduct]]
    * expression (fused loop, no intermediate array — see its scaladoc);
    * byte-identical to the higher-order-function formulation
    * `aggregate(zip_with(a,b,_*_), 0.0, _+_)` kept in [[dotHof]]. */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a.cast("array<double>")),
      GraftSqlBridge.expression(b.cast("array<double>"))))
  }

  /** Reference HOF formulation of [[dot]] (kept for equivalence testing). */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a.cast("array<double>"), b.cast("array<double>"), (x, y) => x * y),
      lit(0.0), (acc, x) => acc + x)

  /** Deterministic ±1 hyperplane weights, generated driver-side (splitmix-
    * style integer hash of (plane,dim)) and shipped to executors — zero
    * per-row hashing, reproducible across runs/executors. */
  def planeWeights(plane: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      var z = (plane.toLong * 1024 + d) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      if (((z ^ (z >>> 31)) & 1L) == 0L) -1.0 else 1.0
    }

  /** `bands` sign-LSH band keys of an embedding as `array<long>`, computed
    * by the fused [[LshBandKeys]] expression (single cast, single loop). */
  def lshBandKeys(emb: Column, dim: Int, bands: Int, bitsPerBand: Int,
                  planeOffset: Int = 0): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    val w = (0 until bands * bitsPerBand)
      .flatMap(p => planeWeights(planeOffset + p, dim).toSeq)
    GraftSqlBridge.column(LshBandKeys(
      GraftSqlBridge.expression(emb.cast("array<double>")),
      w, dim, bands, bitsPerBand))
  }

  /** Lowercased word tokens via the fused [[WordTokens]] expression —
    * byte-identical to `filter(split(lower(text), "\\W+"), len > 0)` (the
    * HOF form is CodegenFallback; see [[NgramUtil]]). */
  def wordTokens(text: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(WordTokens(GraftSqlBridge.expression(text)))
  }

  /** Word n-gram shingles via the fused [[WordNgrams]] expression. */
  def wordNgrams(text: Column, n: Int, distinct: Boolean = true): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(WordNgrams(GraftSqlBridge.expression(text), n,
      distinct))
  }

  /** Distinct character n-grams via the fused [[CharNgrams]] expression. */
  def charNgrams(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(CharNgrams(GraftSqlBridge.expression(text), n))
  }

  /** Bloom-filter aggregate over a bigint column (Spark's runtime-filter
    * BloomFilterAggregate): one binary value sized for `expectedItems`.
    * Undersizing saturates the filter and turns downstream probes into
    * no-ops, so the capacity is an explicit parameter, not a conf
    * default. */
  def bloomAgg(c: Column, expectedItems: Long): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(GraftSqlBridge.expression(c), expectedItems)
        .toAggregateExpression())
  }

  /** Probe a bloom binary (must be a literal/foldable value — materialize
    * the aggregate first) against a bigint column. */
  def mightContain(bloom: Column, v: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(
      org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
        GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(v)))
  }

  /** Overlapping token-window chunks via the fused [[WordChunks]]
    * expression (size-token windows every stride tokens, space-joined). */
  def wordChunks(text: Column, size: Int, stride: Int): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(WordChunks(GraftSqlBridge.expression(text), size,
      stride))
  }

  /** One-pass 64-bit SimHash via the [[SimHash64]] expression. */
  def simHash64(tokens: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))
  }

  /** One-pass character Shannon entropy via [[CharEntropy]]. */
  def charEntropy(text: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(CharEntropy(GraftSqlBridge.expression(text)))
  }

  /** Fitted-vocabulary token-id encoding (array<string> → array<bigint>,
    * OOV → 0): one O(1) hash probe per token instead of `element_at`'s
    * O(K) literal-map scan. See [[VocabEncode]]. */
  def vocabEncode(tokens: Column, vocab: Map[String, Long]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(VocabEncode(GraftSqlBridge.expression(tokens),
      vocab))
  }

  /** Fitted-BPE subword encoding (array<string> tokens → array<bigint>
    * subword ids); see [[BpeEncode]]. */
  def bpeEncode(tokens: Column, merges: Seq[(String, String)],
                vocab: Map[String, Long]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(BpeEncode(GraftSqlBridge.expression(tokens),
      merges, vocab))
  }

  /** Fitted-BPE decode (array<bigint> subword ids → the space-joined
    * token string); see [[BpeDecode]]. */
  def bpeDecode(ids: Column, idToSymbol: Map[Long, String]): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(BpeDecode(GraftSqlBridge.expression(ids),
      idToSymbol))
  }

  /** k seeded MinHash minima via the fused [[MinHashes]] expression. */
  def minHashes(shingles: Column, k: Int,
                seedIndexed: Boolean = true): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(MinHashes(GraftSqlBridge.expression(shingles), k,
      seedIndexed))
  }

  /** Symmetric per-vector int8 quantization via [[QuantizeI8]]. */
  def quantizeI8(emb: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(QuantizeI8(
      GraftSqlBridge.expression(emb.cast("array<double>"))))
  }

  /** Integer dot product over two int8 vectors via [[DotI8]]. */
  def dotI8(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(DotI8(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
  }

  /** Quantized cosine similarity: per-vector scales cancel, so the whole
    * computation runs over int8 arrays with integer accumulation. */
  def cosineSimI8(qa: Column, qb: Column): Column =
    dotI8(qa, qb).cast("double") /
      sqrt(dotI8(qa, qa).cast("double") * dotI8(qb, qb).cast("double"))

  /** Identity + single-deletion variants via the fused
    * [[DeletionNeighbors]] expression. */
  def deletionNeighbors(s: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    GraftSqlBridge.column(DeletionNeighbors(GraftSqlBridge.expression(s)))
  }

  /** Probe a serialized Count-Min sketch (must be a literal — collect the
    * `count_min_sketch` aggregate first) for a bigint item's estimated
    * count. See [[CmsEstimate]]. */
  def cmsEstimate(sketchBytes: Array[Byte], item: Column): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.BinaryType
    GraftSqlBridge.column(CmsEstimate(Literal(sketchBytes, BinaryType),
      GraftSqlBridge.expression(item)))
  }

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two embedding columns. */
  def cosineSim(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))
}
