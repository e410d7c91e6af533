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
