package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Accumulated first and second moments of a d-dimensional embedding
  * column. `sums` is the per-dimension sum; `prods` the upper-triangular
  * Σ xᵢ·xⱼ (row-major, j ≥ i — d(d+1)/2 cells). */
case class MomentState(var n: Long, sums: Array[Double],
                       prods: Array[Double])

/** Typed mergeable [[Aggregator]] for exact embedding moments — the input
  * to covariance/PCA.
  *
  * This is the canonical "custom aggregate state" shape for 100 TB: the
  * state is O(d²) REGARDLESS of row count, `reduce` runs per-partition
  * (map-side), and `merge` combines partial states pairwise — so the full
  * corpus pass ships one ~2 KB state per partition through the final
  * reduction, never row data. The relational alternative (explode to
  * (i, j, xᵢ·xⱼ) rows + groupBy) shuffles d²·|rows| cells.
  *
  * Double accumulation order varies with partitioning, so downstream
  * consumers must treat the last few ulps as noise (the PCA projection in
  * [[graft.ops.Mining]] rounds its outputs; exact-decimal accumulation
  * would need d² decimal columns for no analytical gain here).
  */
class EmbeddingMoments(d: Int)
    extends Aggregator[Array[Double], MomentState, MomentState] {

  override def zero: MomentState =
    MomentState(0L, new Array[Double](d), new Array[Double](d * (d + 1) / 2))

  override def reduce(s: MomentState, x: Array[Double]): MomentState = {
    require(x.length == d, s"expected dim $d, got ${x.length}")
    s.n += 1
    var i = 0
    var t = 0
    while (i < d) {
      s.sums(i) += x(i)
      var j = i
      while (j < d) { s.prods(t) += x(i) * x(j); t += 1; j += 1 }
      i += 1
    }
    s
  }

  override def merge(a: MomentState, b: MomentState): MomentState = {
    a.n += b.n
    var i = 0
    while (i < d) { a.sums(i) += b.sums(i); i += 1 }
    var t = 0
    val m = d * (d + 1) / 2
    while (t < m) { a.prods(t) += b.prods(t); t += 1 }
    a
  }

  override def finish(s: MomentState): MomentState = s

  override def bufferEncoder: Encoder[MomentState] = Encoders.product
  override def outputEncoder: Encoder[MomentState] = Encoders.product
}

/** Driver-side linear algebra over a [[MomentState]] — d is small (an
  * embedding dimension), so the d×d eigen problem belongs on the driver;
  * the DATA-sized work (the moment pass, the projection) stays on
  * executors. */
object EmbeddingMoments {

  /** Dense covariance matrix from accumulated moments. */
  def covariance(s: MomentState, d: Int): Array[Array[Double]] = {
    val n = s.n.toDouble
    require(n > 1, "covariance needs at least 2 rows")
    val mean = s.sums.map(_ / n)
    val cov = Array.ofDim[Double](d, d)
    var i = 0
    var t = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val c = s.prods(t) / n - mean(i) * mean(j)
        cov(i)(j) = c; cov(j)(i) = c
        t += 1; j += 1
      }
      i += 1
    }
    cov
  }

  /** Top-k eigenvectors by power iteration with deflation. Deterministic:
    * fixed start vector, fixed iteration count, sign normalized so the
    * largest-magnitude component is positive. */
  def topEigenvectors(cov: Array[Array[Double]], k: Int,
                      iters: Int = 200): Seq[(Double, Array[Double])] = {
    val d = cov.length
    val work = cov.map(_.clone())
    (0 until k).map { _ =>
      var v = Array.tabulate(d)(i => 1.0 / math.sqrt((i + 1).toDouble))
      var lambda = 0.0
      var it = 0
      while (it < iters) {
        val w = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0; var j = 0
          while (j < d) { s += work(i)(j) * v(j); j += 1 }
          w(i) = s; i += 1
        }
        val norm = math.sqrt(w.map(x => x * x).sum)
        if (norm == 0.0) it = iters
        else { v = w.map(_ / norm); lambda = norm; it += 1 }
      }
      // sign convention: largest-|component| positive
      val m = v.indices.maxBy(i => math.abs(v(i)))
      if (v(m) < 0) v = v.map(-_)
      // deflate: work -= lambda v vᵀ
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { work(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
      (lambda, v)
    }
  }
}
