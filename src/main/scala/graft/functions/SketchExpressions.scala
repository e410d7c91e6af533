package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.util.sketch.CountMinSketch

/** Point-estimate probe of a serialized Count-Min sketch.
  *
  * Spark ships the `count_min_sketch` AGGREGATE (a mergeable, fixed-size
  * frequency summary — the right shape for 100 TB: partial sketches merge
  * map-side, only `depth×width` counters cross the shuffle) but no probe
  * function, so the sketch binary is write-only from SQL. This expression
  * closes the loop: `CmsEstimate(sketchLiteral, item)` returns the sketch's
  * estimated count for `item` (an over-estimate by construction — CMS never
  * under-counts; error ≤ eps·N with the configured confidence).
  *
  * The sketch child must be FOLDABLE (a literal — materialize the aggregate
  * first, the same collect-then-literal pattern as the IVF codebook in
  * [[graft.ops.Similarity]]): the binary is deserialized ONCE lazily and
  * shared across all rows, instead of per-row `readFrom` (which would turn
  * a O(depth) probe into a multi-KB parse per row). Codegen references the
  * deserialized sketch object directly, so probes stay inside whole-stage
  * codegen.
  */
case class CmsEstimate(sketch: Expression, item: Expression)
    extends BinaryExpression {

  override def left: Expression = sketch
  override def right: Expression = item

  override def checkInputDataTypes(): TypeCheckResult =
    (sketch.dataType, item.dataType) match {
      // like BloomFilterMightContain: the sketch side must be a literal OR
      // an uncorrelated scalar subquery (whose value is computed once
      // before the probing plan runs) — either way eval() sees one
      // constant binary the lazy deserialization below can cache
      case (BinaryType, LongType) if sketch.foldable ||
          sketch.isInstanceOf[
            org.apache.spark.sql.catalyst.expressions.PlanExpression[_]] =>
        TypeCheckResult.TypeCheckSuccess
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable (literal) or scalar-subquery " +
          "sketch — collect or subquery the count_min_sketch aggregate")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, bigint) arguments, got ($l, $r)")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_cms_estimate"

  @transient private lazy val cms: CountMinSketch = {
    val bytes = sketch.eval(null).asInstanceOf[Array[Byte]]
    require(bytes != null, s"$prettyName: sketch literal is null")
    CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
  }

  override def nullSafeEval(sketchBytes: Any, itemValue: Any): Any =
    cms.estimateCount(itemValue.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val cmsRef =
      ctx.addReferenceObj("graftCms", cms, classOf[CountMinSketch].getName)
    nullSafeCodeGen(ctx, ev,
      (_, itemVal) => s"${ev.value} = $cmsRef.estimateCount((long) $itemVal);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(sketch = newLeft, item = newRight)
}
