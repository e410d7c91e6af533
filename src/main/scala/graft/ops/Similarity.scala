package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Not in the reference (it has no vector data); required
  * by the training-data-pipeline tier.
  *
  * Design for 100 TB: the exact path broadcasts the (small) query set and
  * scans the corpus once — no shuffle of the corpus at all; the approximate
  * paths bucket the corpus (sign-LSH or IVF) so each query only meets a
  * small candidate set, turning the O(|Q|·|C|) scan into a bucket join.
  */
object Similarity {

  /** Cosine similarity rounded for cross-engine comparison: sums of ~64
    * double products can differ in the last ulp between engines; ranking on
    * a 6-decimal rounding with an id tiebreak is stable. */
  def simRounded(a: Column, b: Column): Column = round(cosineSim(a, b), 6)

  /** Exact brute-force top-k: corpus scanned once, query set broadcast.
    * Output: (query_id, neighbor_id, sim, rn). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     embCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", simRounded(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "sim", "rn")
  }

  /** Deterministic ±1 hyperplane weights, generated driver-side (splitmix-
    * style integer hash of (plane,dim)) and shipped to executors as literal
    * arrays — zero per-row hashing, reproducible across runs/executors. */
  private def planeWeights(plane: Int, dim: Int): Array[Double] =
    Array.tabulate(dim) { d =>
      var z = (plane.toLong * 1024 + d) + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      if (((z ^ (z >>> 31)) & 1L) == 0L) -1.0 else 1.0
    }

  /** Sign-LSH bucket id: `nBits` random-hyperplane signs packed into a long.
    * Vectors with the same bucket are likely neighbors (cosine LSH). Each
    * bit is one codegen'd dot product against a constant weight array. */
  def lshBucket(embCol: Column, dim: Int, nBits: Int = 16): Column =
    (0 until nBits).map { p =>
      when(graft.functions.dot(embCol, typedlit(planeWeights(p, dim))) > 0,
        lit(1L << p)).otherwise(0L)
    }.reduce(_ + _)

  /** Approximate top-k via sign-LSH bucketing: corpus and queries are
    * bucketed; candidates = corpus rows sharing the query's bucket. Scale
    * path for when the query set is itself huge (self-join ANN): the bucket
    * join shuffles by bucket id instead of broadcasting anything. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, dim: Int, k: Int,
              nBits: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb"),
      lshBucket(col(embCol), dim, nBits).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb"),
      lshBucket(col(embCol), dim, nBits).as("bucket"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", simRounded(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "sim", "rn")
  }

  /** IVF (inverted-file) approximate top-k. Centroids are a deterministic
    * corpus sample (every `centroidStride`-th id — stands in for k-means,
    * which would be fit offline at scale). Every corpus vector is assigned
    * to its nearest centroid once; a query probes its `nprobe` nearest
    * centroid cells and ranks only those candidates. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              embCol: String, k: Int, centroidStride: Int = 50,
              nprobe: Int = 3): DataFrame = {
    val cents = corpus
      .filter(col(idCol) % centroidStride === 0)
      .select(col(idCol).as("cent_id"), col(embCol).as("cent_emb"))
    def nearestCells(df: DataFrame, id: String, emb: String, n: Int,
                     out: String): DataFrame = {
      val w = Window.partitionBy(col(id)).orderBy(
        col("cent_sim").desc, col("cent_id").asc)
      df.join(broadcast(cents), col(id).isNotNull)
        .withColumn("cent_sim", simRounded(col(emb), col("cent_emb")))
        .withColumn("cent_rn", row_number().over(w))
        .filter(col("cent_rn") <= n)
        .select(col(id), col(emb), col("cent_id").as(out))
    }
    val assigned = nearestCells(
      corpus.select(col(idCol).as("neighbor_id"), col(embCol).as("c_emb")),
      "neighbor_id", "c_emb", 1, "cell")
    val probed = nearestCells(
      queries.select(col(idCol).as("query_id"), col(embCol).as("q_emb")),
      "query_id", "q_emb", nprobe, "cell")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", simRounded(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "sim", "rn")
  }
}
