package graft.ops

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * The reference has only storage-level dedup (SELECT DISTINCT,
  * /root/reference/services/jcap_pa_etl_service.py:208-213); these operators
  * extend that to the document-dedup family a 100 TB text corpus needs.
  * All are pure `DataFrame → DataFrame` transforms: hash-partitioned
  * group-bys and bucket-joins, no driver-side loops.
  *
  * Cache lifecycle: the near-dup operators persist their shared shingle
  * intermediate (consumed by 2-3 subplans each — Spark re-executes common
  * subplans otherwise). The returned DataFrames are lazy, so an operator
  * cannot unpersist before its consumer's action runs; the contract is
  * that the HARNESS releases caches once a result is consumed — Bench and
  * Verify both `spark.catalog.clearCache()` after every query, so no
  * query runs under another's memory pressure. At 100 TB the persisted
  * intermediates are the narrow forms (8-byte gram hashes, (id, tf)
  * pairs), never raw text; a corpus where even those exceed cluster
  * memory+disk should checkpoint the postings to parquet instead.
  */
object Dedup {

  /** Exact dedup at scale: group on a 256-bit content hash instead of the
    * raw text so the shuffle carries 64 hex chars per row, not whole
    * documents. Keeps the smallest id as the canonical representative
    * (deterministic winner). */
  def exactByHash(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("content_sha"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("dup_count"))

  /** Lowercased word tokens (non-word runs as separators, empties dropped)
    * — fused native expression, see [[graft.functions.NgramUtil]]. */
  private def tokensOf(textCol: String) =
    graft.functions.wordTokens(col(textCol))

  /** Distinct word n-gram shingles of a document. Shingling (vs raw
    * unigrams) is what makes MinHash discriminative on natural text: with a
    * small vocabulary every document's unigram set converges to the whole
    * vocabulary and all Jaccard distances collapse toward 0. One fused
    * scan per document ([[graft.functions.WordNgrams]]) — the
    * HOF-composed form dropped every dedup query out of codegen. */
  def shingles(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    df.withColumn("shingles",
      graft.functions.wordNgrams(col(textCol), n))

  /** Shingle → term-frequency vectors for hashing-based dedup; 2^18 feature
    * space keeps hash collisions rare while bounding vector width. */
  def tfVectors(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    new HashingTF()
      .setInputCol("shingles").setOutputCol("tf")
      .setNumFeatures(1 << 18)
      .transform(shingles(df, textCol, n))

  /** Near-duplicate pairs via MinHash LSH (spark-mllib): shingle→minhash→
    * band→bucket-join. `approxSimilarityJoin` only compares items sharing a
    * band bucket, so the candidate set stays near-linear at 100 TB instead
    * of the O(n²) cross join. Seeded for reproducibility. Returns pairs
    * (id_a < id_b) with Jaccard distance below `maxDistance`. */
  def minhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          maxDistance: Double = 0.6,
                          numHashTables: Int = 3): DataFrame = {
    // persist: the shingle+TF pipeline feeds the LSH fit AND both sides of
    // the self-join — without it Spark recomputes the tokenization 3x.
    // Narrowed to (id, tf) so the cache doesn't carry text + shingles.
    val tf = tfVectors(df, textCol)
      // MinHashLSH requires at least one non-zero entry
      .filter(size(col("shingles")) > 0)
      .select(col(idCol), col("tf"))
      .persist()
    val lsh = new MinHashLSH()
      .setInputCol("tf").setOutputCol("minhash")
      .setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(tf)
    val joined = model.approxSimilarityJoin(tf, tf, maxDistance, "jaccard_dist")
    joined
      .select(
        col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        col("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
  }

  /** Native MinHash near-dup pairs — shingle → k minhashes → band →
    * bucket-join → exact-Jaccard verify, entirely in codegen'd expressions
    * (no MLlib vectors, no per-table explode-join of hash tables). Each
    * document carries `numHashes` 64-bit minima of seeded xxhash64 over its
    * distinct shingles; minima are grouped into `bands` band keys; only
    * documents sharing a band key become candidates, and candidates are
    * verified with the exact Jaccard over their shingle sets. Returns
    * (id_a < id_b, jaccard) with jaccard ≥ 1 − maxDistance. */
  def minhashNativePairs(df: DataFrame, textCol: String, idCol: String,
                         maxDistance: Double = 0.6, numHashes: Int = 8,
                         bands: Int = 4): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    // persist: shingle sets feed the minhash computation and both sides of
    // the candidate verification rejoin
    val sh = shingles(df, textCol)
      .filter(size(col("shingles")) > 0)
      .select(col(idCol), col("shingles"))
      .persist()
    // k minima in one fused scan (byte-identical to the k-pass HOF form —
    // see graft.functions.MinHashes)
    val withMins = sh.withColumn("mins",
      graft.functions.minHashes(col("shingles"), numHashes))
    // band join over (id, band_key) only — shingle arrays would bloat the
    // shuffle; they are joined back onto the (much smaller) candidate pairs
    val banded = withMins.select(
      col(idCol),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("mins"), b * rowsPerBand + 1, rowsPerBand))
            .as("band_key"))
      }: _*)).as("bk"))
      .select(col(idCol),
        col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val a = banded.select(col(idCol).as("id_a"), col("band"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col("band"), col("band_key"))
    val candidates = a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val shA = sh.select(col(idCol).as("id_a"), col("shingles").as("sh_a"))
    val shB = sh.select(col(idCol).as("id_b"), col("shingles").as("sh_b"))
    candidates
      .join(shA, "id_a")
      .join(shB, "id_b")
      .withColumn("common",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("jaccard", col("common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("common")))
      .filter(col("jaccard") >= 1.0 - maxDistance)
      .select("id_a", "id_b", "jaccard")
  }

  /** 64-bit SimHash per document: for each of the 64 bit positions, sum
    * +1/-1 votes weighted by each token's xxhash64 bit, then collapse to a
    * bit vector. SimHash is per-document math, so it runs as ONE fused
    * projection over the scan ([[graft.functions.SimHash64]]) — zero
    * shuffle, vs the 64·|tokens|-row explode→groupBy a relational
    * formulation would shuffle at corpus scale. Tokenless documents are
    * excluded (the exploded form never produced rows for them). */
  def simhash64(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.select(col(idCol), tokensOf(textCol).as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col(idCol),
        graft.functions.simHash64(col("toks")).as("simhash"))

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: org.apache.spark.sql.Column,
                b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: band the 64-bit signature into four 16-bit
    * chunks and bucket-join on any matching chunk (pigeonhole: distance ≤ 3
    * guarantees one identical chunk), then verify by exact Hamming distance.
    * Avoids the O(n²) cross join the naive formulation needs. */
  def simhashNearDupPairs(df: DataFrame, textCol: String, idCol: String,
                          maxHamming: Int = 3): DataFrame =
    hammingBandPairs(simhash64(df, textCol, idCol), idCol, "simhash",
      maxHamming)

  /** Banded Hamming self-join over ANY 64-bit signature column (SimHash,
    * perceptual hash, quantized sketch): signatures are split into
    * `64/bandBits` chunks, candidates share at least one chunk (pigeonhole:
    * Hamming ≤ chunks−1 guarantees a match), and survivors verify by exact
    * [[hamming64]]. The join ships only (id, band, band_key) triples —
    * near-linear candidate volume instead of the O(n²) cross join, same
    * scale shape as the MinHash band join. The chunk count must exceed
    * `maxHamming` for the pigeonhole completeness argument to hold, so by
    * default (`bandBits = 0`) the band width auto-sizes to the WIDEST
    * chunk that still guarantees it — wider chunks mean fewer, more
    * selective buckets, i.e. fewer false candidates; an explicit width
    * that breaks the guarantee is rejected, never silently weakened.
    *
    * Scale contract: unlike sign-LSH (whose bucket count is a free knob,
    * `Similarity.lshAutoSize`), the bucket universe here is FIXED by the
    * completeness guarantee — at most 2^(64/(maxHamming+1)) keys per band
    * (65,536 at maxHamming 3). Random-collision candidates therefore grow
    * ~n²/2^bandBits once n approaches the key space (~10⁵–10⁶ uniform
    * signatures at 16-bit bands; measured linear through the 50k-doc sf1
    * tier). Past that, collapse exact-duplicate signatures to one
    * representative first (identical docs dominate real corpora and are
    * Hamming-0 pairs by definition), or relax maxHamming to widen chunks. */
  def hammingBandPairs(sig: DataFrame, idCol: String, sigCol: String,
                       maxHamming: Int = 3, bandBits: Int = 0): DataFrame = {
    require(maxHamming < 64, s"maxHamming=$maxHamming must be < 64")
    val chosenBits =
      if (bandBits != 0) bandBits
      else Seq(32, 16, 8, 4, 2, 1).find(b => 64 / b > maxHamming).get
    require(64 % chosenBits == 0,
      s"bandBits must divide 64, got $chosenBits")
    val bands = 64 / chosenBits
    require(maxHamming < bands,
      s"maxHamming=$maxHamming needs >$maxHamming bands; " +
        s"bandBits=$chosenBits gives only $bands (pigeonhole fails)")
    val mask = if (chosenBits == 64) -1L else (1L << chosenBits) - 1
    val banded = sig.select(
      col(idCol), col(sigCol),
      explode(sequence(lit(0), lit(bands - 1))).as("band"))
      .withColumn("band_key",
        call_function("shiftright", col(sigCol), col("band") * chosenBits)
          .bitwiseAND(mask))
    val a = banded.select(col(idCol).as("id_a"), col(sigCol).as("sig_a"),
      col("band"), col("band_key"))
    val b = banded.select(col(idCol).as("id_b"), col(sigCol).as("sig_b"),
      col("band"), col("band_key"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Connected components over a near-dup pair list by iterative min-label
    * propagation: every document adopts the smallest id reachable through
    * the pair graph, so each duplicate cluster resolves to one canonical
    * representative — the endgame of every dedup pipeline (pairs alone
    * don't say which doc to keep when A~B and B~C but not A~C).
    *
    * Scale design: each round combines neighbor propagation (join + min
    * aggregate over the edge list) with pointer jumping — every node also
    * adopts its label's own label (label(label(id))). Plain neighbor
    * propagation needs O(graph diameter) rounds; the pointer-jumping term
    * halves chain depth every round, so convergence is O(log diameter) —
    * at corpus scale that's the difference between ~6 and ~40 shuffle
    * barriers on a chain-shaped cluster. Each round truncates lineage via
    * localCheckpoint (an iterative DataFrame loop otherwise compounds the
    * plan each round); the convergence probe rides the checkpointed frame
    * so it costs one cheap aggregate, not a recompute. For adversarial
    * web-scale graphs swap in large-star/small-star; contract unchanged.
    *
    * Single-task fast path: near-dup edge lists are usually MUCH smaller
    * than the corpus that produced them (the expensive part is pair
    * GENERATION; the surviving graph is the dup fraction only). When the
    * materialized edge count is below `singleTaskEdges`, the component
    * problem fits one executor task, so it is solved there with a
    * path-compressed union-find (`coalesce(1).mapPartitions` — data stays
    * on executors, nothing collects to the driver) instead of paying
    * O(log diameter) shuffle-barrier rounds of fixed scheduler cost.
    * Identical output by construction (union-by-min ⇒ min reachable id);
    * the spec runs both paths over the same graph and asserts equality.
    * Above the threshold the distributed loop runs unchanged — THAT is
    * the 100 TB path; the threshold only removes the small-graph tax. */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25,
                          singleTaskEdges: Long = 4_000_000L): DataFrame = {
    // both orientations from ONE pass over the (possibly expensive) pair
    // subplan — a self-union would execute it twice
    val edges = pairs.select(explode(array(
        struct(col("id_a").as("src"), col("id_b").as("dst")),
        struct(col("id_b").as("src"), col("id_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist()
    // materializes the persist — the same work round 1 would do anyway
    val edgeCount = edges.count()
    if (edgeCount <= singleTaskEdges) {
      val spark = pairs.sparkSession
      import spark.implicits._
      // <= not <: a degenerate self-pair (id_a == id_b) must still emit
      // its node as (id, id) — the distributed path's least(src, min(dst))
      // does, so the fast path keeps the (a,a) tuple (an idempotent union)
      // rather than silently dropping the node
      val out = edges.filter(col("src") <= col("dst"))
        .as[(Long, Long)]
        .coalesce(1)
        .mapPartitions { it =>
          val parent = scala.collection.mutable.LongMap.empty[Long]
          def find(x: Long): Long = {
            var r = x
            while (parent.getOrElse(r, r) != r) r = parent(r)
            var c = x // path compression
            while (parent.getOrElse(c, c) != c) {
              val n = parent(c); parent(c) = r; c = n
            }
            r
          }
          val seen = scala.collection.mutable.LongMap.empty[Unit]
          it.foreach { case (a, b) =>
            seen(a) = (); seen(b) = ()
            val ra = find(a); val rb = find(b)
            if (ra != rb) { // union by min: the root IS the smallest id
              if (ra < rb) parent(rb) = ra else parent(ra) = rb
            }
          }
          seen.keysIterator.map(n => (n, find(n)))
        }
        .toDF("id", "cluster_root")
        .localCheckpoint(true)
      edges.unpersist()
      return out
    }
    // seed labels one propagation step ahead: label₀ = min(id, min
    // neighbor) comes out of the same aggregate that would otherwise
    // just dedup the node list, saving a full join round on every graph
    var labels = edges.groupBy(col("src"))
      .agg(least(col("src"), min(col("dst"))).as("label"))
      .select(col("src").as("id"), col("label"))
      .localCheckpoint(true)
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "src"), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("label")).as("nlabel"))
      // pointer jumping: label(label(id)). Labels are node ids, so every
      // label value is itself a key in `labels`; left join + coalesce only
      // guards the already-converged self-label case.
      val jumped = labels.join(
          labels.select(col("id").as("label"), col("label").as("plabel")),
          Seq("label"), "left")
        .select(col("id"), col("label"),
          coalesce(col("plabel"), col("label")).as("plabel"))
      // the moved flag rides the same plan, so convergence costs one cheap
      // aggregate over the checkpointed frame instead of an extra join
      val next = jumped.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("label"),
            coalesce(col("nlabel"), col("label")), col("plabel"))
            .as("new_label"),
          (col("nlabel") < col("label") || col("plabel") < col("label"))
            .cast("long").as("moved"))
        .localCheckpoint(true)
      changed = next.agg(sum(col("moved"))).head match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0)
      }
      labels = next.select(col("id"), col("new_label").as("label"))
      iter += 1
    }
    edges.unpersist()
    // fail loudly: silently returning partial labels would split one true
    // component into several "clusters" with no signal to the caller
    if (changed > 0) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds " +
        s"($changed labels still changing) — the graph diameter exceeds " +
        "maxIter; raise it")
    labels.withColumnRenamed("label", "cluster_root")
  }

  /** Edit-distance-≤1 pairs via deletion-neighborhood blocking — fuzzy
    * matching of short strings (names, codes, titles) without the O(n²)
    * cross join a naive levenshtein filter needs. Completeness argument:
    * two strings at distance ≤ 1 ALWAYS share a member of each other's
    * {identity + single-deletion} variant set (substitution → delete the
    * differing position from both; insert/delete → the shorter string IS
    * a deletion variant of the longer; equality → identity), so the
    * variant equi-join loses nothing and the exact levenshtein verify
    * trims the false candidates. Output is therefore bit-identical to the
    * brute-force formulation, which is exactly what the oracle runs.
    *
    * Scale: |variants| = len+1 per string, the join ships (id, variant),
    * and the verify join touches only candidates. Neighborhood generation
    * is the fused [[graft.functions.DeletionNeighbors]] expression — one
    * compiled loop per row instead of len interpreted Catalyst substring
    * trees (the round-4 profile had the HOF form as q97's hot loop).
    * Skewed variant blocks (a deletion neighborhood shared by many
    * strings) concentrate the join the same way hot grams do in
    * [[ngramJaccardPairs]]; a df-cutoff there would make results
    * approximate, so it is deliberately NOT applied. */
  def editDistancePairs(df: DataFrame, textCol: String,
                        idCol: String): DataFrame = {
    val base = df.filter(length(col(textCol)) > 0)
      .select(col(idCol).as("id"), col(textCol).as("s"))
    val variants = base.select(col("id"),
      explode(graft.functions.deletionNeighbors(col("s"))).as("v"))
    val a = variants.select(col("id").as("id_a"), col("v"))
    val b = variants.select(col("id").as("id_b"), col("v"))
    val cand = a.join(b, "v").filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    val na = base.select(col("id").as("id_a"), col("s").as("name_a"))
    val nb = base.select(col("id").as("id_b"), col("s").as("name_b"))
    cand.join(na, "id_a").join(nb, "id_b")
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select("id_a", "id_b", "name_a", "name_b", "dist")
  }

  /** Word n-gram Jaccard near-dup pairs, pure relational formulation:
    * explode each document into its distinct n-gram shingles, self-join on
    * shingle (inverted index — only documents sharing a shingle ever meet),
    * count intersections, then Jaccard = |∩| / (|A|+|B|-|∩|).
    *
    * `maxDocFreq` is the 100 TB hot-key guard: a gram present in d
    * documents contributes d² candidate pairs to the self-join, so on real
    * text the few ubiquitous grams dominate the join while discriminating
    * least (a shingle shared by everyone says nothing about any pair).
    * Grams with document frequency > maxDocFreq are dropped from the gram
    * universe — Jaccard is computed over the kept grams on BOTH the
    * intersection and the set sizes, so the measure stays internally
    * consistent (and the oracle mirrors the same cutoff). */
  def ngramJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                        n: Int = 3, minJaccard: Double = 0.8,
                        maxDocFreq: Int = 1000): DataFrame = {
    // join on a 64-bit hash of the shingle, not the string: the inverted-
    // index shuffle then carries 8 bytes per posting instead of the gram
    // text (collision odds are ~n²/2⁶⁴ — immaterial to Jaccard counts)
    val postings = shingles(df, textCol, n)
      .select(col(idCol), explode(col("shingles")).as("gram"))
      .select(col(idCol), xxhash64(col("gram")).as("gram_h"))
    // document-frequency annotation via a count window: one shuffle on
    // gram_h, whose hash partitioning the a/b self-join below then reuses
    val dfWindow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("gram_h"))
    val shingled = postings
      .withColumn("gram_df", count(lit(1)).over(dfWindow))
      .filter(col("gram_df") <= maxDocFreq)
      // persist: kept postings feed the per-doc sizes AND both join sides
      .persist()
    val sizes = shingled.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
    val sa = sizes.select(col(idCol).as("id_a"), col("n_grams").as("size_a"))
    val sb = sizes.select(col(idCol).as("id_b"), col("n_grams").as("size_b"))
    // singleton grams (df=1) count toward set sizes but can never produce
    // a pair — dropping them from the join sides shrinks the inverted
    // index to just the shared-gram postings (most of a natural corpus's
    // gram universe is singletons)
    val joinable = shingled.filter(col("gram_df") >= 2)
    val a = joinable.select(col(idCol).as("id_a"), col("gram_h"))
    val b = joinable.select(col(idCol).as("id_b"), col("gram_h"))
    a.join(b, "gram_h")
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("common"))
      .join(sa, "id_a")
      .join(sb, "id_b")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("size_a") + col("size_b") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")
  }

  /** INCREMENTAL n-gram Jaccard dedup: near-dup pairs between a fresh
    * increment (rows where `freshCol` is true) and the existing corpus —
    * the daily-ingest shape of corpus dedup. A full self-join re-pays the
    * whole corpus every day; here the gram join is fresh×corpus only, so
    * candidate volume scales with the INCREMENT (×df), not the corpus².
    * At warehouse scale the corpus postings are a maintained table
    * (bucketed by gram hash via [[graft.sources.TableCatalog
    * .writeBucketed]]), so the daily job shuffles only the increment's
    * postings into the corpus's bucketing; fresh-internal duplicates are
    * the NEXT increment's corpus-side problem (or one tiny self-join over
    * the increment), keeping each run linear in new data.
    *
    * Document frequency (the hot-gram cutoff) is computed over corpus ∪
    * increment so the kept-gram universe — and therefore the Jaccard
    * measure — is identical to what the full self-join ([[
    * ngramJaccardPairs]]) uses; the oracle mirrors the same split. */
  def incrementalJaccardPairs(df: DataFrame, textCol: String, idCol: String,
                              freshCol: String, n: Int = 3,
                              minJaccard: Double = 0.8,
                              maxDocFreq: Int = 1000): DataFrame = {
    val postings = shingles(df, textCol, n)
      .select(col(idCol), col(freshCol).as("fresh"),
        explode(col("shingles")).as("gram"))
      .select(col(idCol), col("fresh"), xxhash64(col("gram")).as("gram_h"))
    val dfWindow = org.apache.spark.sql.expressions.Window
      .partitionBy(col("gram_h"))
    val shingled = postings
      .withColumn("gram_df", count(lit(1)).over(dfWindow))
      .filter(col("gram_df") <= maxDocFreq)
      .persist()
    val sizes = shingled.groupBy(col(idCol), col("fresh"))
      .agg(count(lit(1)).as("n_grams"))
    val sa = sizes.filter(!col("fresh"))
      .select(col(idCol).as("corpus_id"), col("n_grams").as("size_corpus"))
    val sb = sizes.filter(col("fresh"))
      .select(col(idCol).as("fresh_id"), col("n_grams").as("size_fresh"))
    val joinable = shingled.filter(col("gram_df") >= 2)
    val corpusSide = joinable.filter(!col("fresh"))
      .select(col(idCol).as("corpus_id"), col("gram_h"))
    val freshSide = joinable.filter(col("fresh"))
      .select(col(idCol).as("fresh_id"), col("gram_h"))
    corpusSide.join(freshSide, "gram_h")
      .groupBy("corpus_id", "fresh_id")
      .agg(count(lit(1)).as("common"))
      .join(sa, "corpus_id")
      .join(sb, "fresh_id")
      .withColumn("jaccard",
        col("common").cast("double") /
          (col("size_corpus") + col("size_fresh") - col("common")))
      .filter(col("jaccard") >= minJaccard)
      .select("corpus_id", "fresh_id", "common", "size_corpus",
        "size_fresh", "jaccard")
  }

  /** Passage→corpus containment probe with ASYMMETRIC PREFIX FILTERING
    * (AllPairs/PPJoin family, Bayardo et al. WWW'07): which corpus
    * documents contain ≥ `minContainment` of a probe passage's n-gram
    * shingles — the passage-level decontamination / attribution lookup.
    *
    * The exactness argument: fix any global total order on grams (here:
    * ascending 64-bit gram hash). If C(p,d) = |p∩d|/|p| ≥ t, the
    * intersection has ≥ ⌈t·|p|⌉ grams; were ALL of them outside the
    * probe's prefix (its first |p| − ⌈t·|p|⌉ + 1 grams in that order),
    * they would have to fit in the remaining ⌈t·|p|⌉ − 1 suffix slots —
    * contradiction. So every qualifying pair shares a PREFIX gram of the
    * probe, and joining probe prefixes against FULL corpus postings loses
    * nothing; exact verification on the candidates makes the output
    * identical to the brute-force inverted join (which is what the
    * DuckDB oracle runs). At t=0.8 only ~20% of each probe's grams enter
    * the join — a 5× cut in probe-side shuffle volume, and the corpus
    * side is the inverted index a production pipeline already maintains
    * (bucketed by gram hash → the probe shuffles only its prefix
    * postings into that bucketing). Gram identity is the 64-bit hash, as
    * everywhere in this family (8-byte postings; collision odds
    * immaterial — see [[ngramJaccardPairs]]). */
  def containmentProbe(corpus: DataFrame, corpusText: String,
                       corpusId: String, probes: DataFrame,
                       probeText: String, probeId: String, n: Int = 3,
                       minContainment: Double = 0.8): DataFrame = {
    def gramSet(c: Column): Column =
      sort_array(array_distinct(
        transform(graft.functions.wordNgrams(c, n), g => xxhash64(g))))
    val cg = corpus
      .select(col(corpusId), gramSet(col(corpusText)).as("grams_d"))
      .persist()
    val pg = probes
      .select(col(probeId), gramSet(col(probeText)).as("grams_p"))
      .withColumn("size_p", size(col("grams_p")))
      .filter(col("size_p") > 0)
      // prefix over the hash-sorted grams: |p| - ceil(t*|p|) + 1 elements
      .withColumn("prefix", slice(col("grams_p"), lit(1),
        (col("size_p") - ceil(lit(minContainment) * col("size_p")) +
          lit(1)).cast("int")))
      .persist()
    val cand = pg.select(col(probeId), explode(col("prefix")).as("gram_h"))
      .join(cg.select(col(corpusId), explode(col("grams_d")).as("gram_h")),
        "gram_h")
      .select(col(probeId), col(corpusId)).distinct()
    cand
      .join(pg.select(col(probeId), col("grams_p"), col("size_p")), probeId)
      .join(cg, corpusId)
      .withColumn("common",
        size(array_intersect(col("grams_p"), col("grams_d"))).cast("long"))
      .withColumn("containment",
        col("common").cast("double") / col("size_p"))
      .filter(col("containment") >= minContainment)
      .select(col(probeId), col(corpusId), col("common"),
        col("size_p").cast("long").as("size_p"),
        round(col("containment"), 6).as("containment"))
  }

  /** Plant near-duplicate copies of the first `nPlant` documents (by id)
    * into the corpus: copy id = original + `offset`, text perturbed by
    * appending `extraToken` (None = byte-identical copy). The planted-pair
    * recall envelope is how the approximate near-dup operators go under a
    * SQL oracle (the q40/q172 ANN pattern applied to dedup): raw pair
    * lists are hash-seeded and engine-specific, but "a planted known
    * near-dup cluster is recalled above a measured floor" is a pinned
    * cross-engine claim. A harness, not data (q228's synthetic-fixture
    * contract): the plant is bounded (`nPlant` rows at ANY corpus scale)
    * and id-keyed, so the probe cost never grows with the corpus. */
  def plantTextDups(docs: DataFrame, idCol: String, textCol: String,
                    nPlant: Int = 20, offset: Long = 1000000L,
                    extraToken: Option[String] = Some("zqj")): DataFrame = {
    // the envelope identifies planted pairs by id_b == id_a + offset;
    // a corpus id at or past `offset` would alias real pairs into the
    // planted set and silently weaken (false-pass) the recall claim —
    // enforce the no-collision precondition IN the plan (lazy: the guard
    // branch's pushed-down id >= offset filter prunes every row group on
    // a healthy corpus, costs ~nothing, runs no job at build time), so
    // a violating corpus fails the query loudly at execution
    val guard = docs.filter(col(idCol).cast("long") >= offset)
      .withColumn(textCol,
        assert_true(col(idCol).cast("long") < offset,
          concat(lit(s"plantTextDups: corpus $idCol "),
            col(idCol).cast("string"),
            lit(s" reaches the planted-id offset $offset — planted " +
              "pairs would alias real ids; raise offset")))
          .cast("string"))
    val copies = docs.filter(col(idCol) < nPlant)
      .withColumn(idCol, col(idCol) + offset)
    docs.unionByName(extraToken.fold(copies)(t =>
        copies.withColumn(textCol, concat(col(textCol), lit(" " + t)))))
      .unionByName(guard)
  }

  /** The oracle SQL for a [[plantedPairEnvelope]] registration — ONE
    * source for the plant count / offset constants, so changing
    * [[plantTextDups]]'s defaults cannot desynchronize the oracles that
    * pin them. */
  def plantedEnvelopeOracle(table: String, idCol: String): String =
    s"""SELECT $idCol + 1000000 AS planted_id, TRUE AS recall_ok
       |FROM $table WHERE $idCol < 20 ORDER BY planted_id""".stripMargin

  /** The planted-pair recall envelope over any (id_a < id_b) pair list:
    * one row per planted id, with ONE boolean — the fraction of planted
    * (original, original+offset) pairs the detector recovered is at or
    * above `floor` — that the oracle expects TRUE. Floors are measured
    * per query and set with >=2x margin (all detectors are hash-seeded,
    * so recall is exactly reproducible for a given corpus). No corpus id
    * reaches `offset`, so id_b == id_a + offset identifies planted pairs
    * unambiguously. */
  def plantedPairEnvelope(pairs: DataFrame, plantedIds: DataFrame,
                          offset: Long, floor: Double): DataFrame = {
    val found = pairs
      .filter(col("id_b") === col("id_a") + offset)
      .select(col("id_b").as("planted_id"), lit(1L).as("hit"))
      .distinct()
    plantedIds
      .join(found, Seq("planted_id"), "left")
      .select(col("planted_id"), coalesce(col("hit"), lit(0L)).as("hit"))
      .withColumn("recall_ok",
        avg(col("hit")).over(
          org.apache.spark.sql.expressions.Window.partitionBy()) >= floor)
      .select(col("planted_id"), col("recall_ok"))
      .orderBy("planted_id")
  }
}
