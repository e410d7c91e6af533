package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Sorted ascending buffer of at most k distinct longs. */
case class TopKMinState(var values: Array[Long])

/** Bounded smallest-k-distinct aggregate: state is ≤k longs REGARDLESS of
  * group size, `reduce` runs map-side, `merge` is a k-bounded sorted
  * union — so a per-group "3 smallest keys" report ships k values per
  * partition through the shuffle instead of sorting the group in one
  * task. This replaces the row_number()-over-low-cardinality-partition
  * window shape (q120's original form), whose per-flag sort degenerates
  * to a single task at 100×. Distinctness is enforced on insert, so no
  * upstream `.distinct()` exchange is needed either.
  *
  * `finish` joins ascending with commas — the LISTAGG surface — keeping
  * string state bounded at k elements by construction. */
class TopKMin(k: Int)
    extends Aggregator[Long, TopKMinState, String] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: TopKMinState = TopKMinState(Array.emptyLongArray)

  override def reduce(s: TopKMinState, x: Long): TopKMinState = {
    val v = s.values
    if (v.length < k || x < v(v.length - 1)) {
      var i = java.util.Arrays.binarySearch(v, x)
      if (i < 0) { // absent: insertion point keeps ascending order
        i = -(i + 1)
        val grow = if (v.length < k) v.length + 1 else k
        val out = new Array[Long](grow)
        System.arraycopy(v, 0, out, 0, i)
        out(i) = x
        System.arraycopy(v, i, out, i + 1, grow - i - 1)
        s.values = out
      } // present: distinct-set semantics, nothing to insert
    }
    s
  }

  override def merge(a: TopKMinState, b: TopKMinState): TopKMinState = {
    var i = 0
    while (i < b.values.length) { reduce(a, b.values(i)); i += 1 }
    a
  }

  override def finish(s: TopKMinState): String = s.values.mkString(",")

  override def bufferEncoder: Encoder[TopKMinState] = Encoders.product
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** Sorted ascending buffer of at most k distinct strings. */
case class KthSmallestStrState(var values: Array[String])

/** Bounded k-th-smallest-distinct-string aggregate: state is ≤k strings
  * regardless of group size (map-side reduce, k-bounded merge), and
  * `finish` returns the k-th smallest — i.e. the CUTOFF value such that
  * `x <= cutoff` keeps exactly the k smallest distinct values of the
  * group. Groups with fewer than k distinct values finish to `keepAll`
  * (a sentinel the caller picks to sort after every real input, e.g.
  * "g" for lowercase-hex digests), so the filter keeps the whole group.
  *
  * This is the per-group top-k threshold WITHOUT a row_number window:
  * a cap-per-domain pass ships k digests per (partition, group) through
  * one tiny aggregate instead of sorting each domain's rows in a
  * window task. */
class KthSmallestStr(k: Int, keepAll: String)
    extends Aggregator[String, KthSmallestStrState, String] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: KthSmallestStrState =
    KthSmallestStrState(Array.empty[String])

  override def reduce(s: KthSmallestStrState,
                      x: String): KthSmallestStrState = {
    val v = s.values
    if (x != null && (v.length < k || x < v(v.length - 1))) {
      var i = java.util.Arrays.binarySearch(
        v.asInstanceOf[Array[AnyRef]], x)
      if (i < 0) { // absent: insertion point keeps ascending order
        i = -(i + 1)
        val grow = if (v.length < k) v.length + 1 else k
        val out = new Array[String](grow)
        System.arraycopy(v, 0, out, 0, i)
        out(i) = x
        System.arraycopy(v, i, out, i + 1, grow - i - 1)
        s.values = out
      }
    }
    s
  }

  override def merge(a: KthSmallestStrState,
                     b: KthSmallestStrState): KthSmallestStrState = {
    var i = 0
    while (i < b.values.length) { reduce(a, b.values(i)); i += 1 }
    a
  }

  override def finish(s: KthSmallestStrState): String =
    if (s.values.length < k) keepAll else s.values(k - 1)

  override def bufferEncoder: Encoder[KthSmallestStrState] =
    Encoders.product
  override def outputEncoder: Encoder[String] = Encoders.STRING
}

/** Buffer of at most k (value, label) pairs, kept sorted by
  * (value desc, label asc). */
case class TopKByValueState(values: Array[Long], labels: Array[String])

/** Bounded per-group top-k-by-value aggregate: keeps the k largest
  * (value, label) pairs — descending value, ascending label on ties —
  * with ≤k pairs of state per group, map-side reduce, and a k-bounded
  * merge. This replaces the `row_number() OVER (PARTITION BY group
  * ORDER BY cnt DESC)` shape for per-group leaderboards: with few
  * groups that window sorts each group's whole frame in one task, while
  * this ships k pairs per partition. `finish` emits the pairs in rank
  * order as (value, label) structs for the caller to posexplode. */
class TopKByValue(k: Int)
    extends Aggregator[(Long, String), TopKByValueState,
      Seq[(Long, String)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def zero: TopKByValueState =
    TopKByValueState(Array.emptyLongArray, Array.empty[String])

  // ranks before: larger value first, then smaller label
  private def beats(v1: Long, l1: String, v2: Long, l2: String): Boolean =
    v1 > v2 || (v1 == v2 && l1 < l2)

  override def reduce(s: TopKByValueState,
                      x: (Long, String)): TopKByValueState = {
    val n = s.values.length
    if (n == k && !beats(x._1, x._2, s.values(n - 1), s.labels(n - 1)))
      return s
    // insertion point: first slot the candidate beats
    var i = 0
    while (i < n && !beats(x._1, x._2, s.values(i), s.labels(i))) i += 1
    val grow = math.min(n + 1, k)
    val vs = new Array[Long](grow); val ls = new Array[String](grow)
    System.arraycopy(s.values, 0, vs, 0, i)
    System.arraycopy(s.labels, 0, ls, 0, i)
    vs(i) = x._1; ls(i) = x._2
    System.arraycopy(s.values, i, vs, i + 1, grow - i - 1)
    System.arraycopy(s.labels, i, ls, i + 1, grow - i - 1)
    TopKByValueState(vs, ls)
  }

  override def merge(a: TopKByValueState,
                     b: TopKByValueState): TopKByValueState = {
    var acc = a; var i = 0
    while (i < b.values.length) {
      acc = reduce(acc, (b.values(i), b.labels(i))); i += 1
    }
    acc
  }

  override def finish(s: TopKByValueState): Seq[(Long, String)] =
    s.values.toSeq.zip(s.labels.toSeq)

  override def bufferEncoder: Encoder[TopKByValueState] = Encoders.product
  override def outputEncoder: Encoder[Seq[(Long, String)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
