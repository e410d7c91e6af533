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
