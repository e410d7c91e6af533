package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst dot product over two `array<double>` columns.
  *
  * The composable formulation (`aggregate(zip_with(a,b,_*_),0.0,_+_)`)
  * allocates an intermediate array per row and walks it through the
  * higher-order-function interpreter; at 100 TB of embedding rows that is
  * the hot loop. This expression generates a tight fused multiply-add loop
  * inside whole-stage codegen — no allocation, no virtual calls — while
  * keeping byte-identical results (same sequential accumulation order, so
  * the DuckDB oracle comparison is unaffected).
  *
  * Null handling matches BinaryExpression defaults (null array → null);
  * element nulls are not expected in embedding data and read as 0-garbage
  * per ArrayData contract — callers validate upstream.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<double> arguments, got $l / $r")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += x.getDouble(i) * y.getDouble(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Symmetric per-vector int8 quantization: scale = max|x|/127,
  * q_i = round(x_i/scale), emitted as `array<tinyint>`.
  *
  * Why this exists at 100 TB: float32 embeddings dominate the byte volume
  * of an ANN corpus; int8 cuts scan, shuffle, and cache traffic 4× while
  * COSINE similarity loses nothing structural — the per-vector scale
  * cancels in (sa·sb·qa·qb)/(sa|qa|·sb|qb|), so ranking needs only the
  * quantized arrays (see [[DotI8]]). Zero vectors quantize to zeros. */
case class QuantizeI8(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $t")
  }

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.ByteType, containsNull = false)

  override def prettyName: String = "graft_quantize_i8"

  override def nullSafeEval(input: Any): Any =
    QuantizeI8.quantize(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.QuantizeI8.quantize($x);")

  override protected def withNewChildInternal(
      newChild: Expression): QuantizeI8 = copy(child = newChild)
}

object QuantizeI8 {
  /** Shared by interpreted eval and generated code. */
  def quantize(x: ArrayData): ArrayData = {
    val n = x.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(x.getDouble(i))
      if (v > maxAbs) maxAbs = v
      i += 1
    }
    val out = new Array[Byte](n)
    if (maxAbs > 0.0) {
      val inv = 127.0 / maxAbs
      i = 0
      while (i < n) {
        val q = math.round(x.getDouble(i) * inv)
        out(i) = (if (q > 127) 127 else if (q < -127) -127 else q).toByte
        i += 1
      }
    }
    // primitive byte[] constructor — boxing per element here would put an
    // Object[] + n Byte allocations on the per-embedding hot path
    new GenericArrayData(out)
  }
}

/** Integer dot product over two `array<tinyint>` columns (fused loop,
  * long accumulator — exact for any realistic dimensionality). Combined
  * with [[QuantizeI8]]: cosine ≈ dotI8(qa,qb)/sqrt(dotI8(qa,qa)·
  * dotI8(qb,qb)), all-integer until the final division. */
case class DotI8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(org.apache.spark.sql.types.ByteType, _),
            ArrayType(org.apache.spark.sql.types.ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<tinyint> arguments, got $l / $r")
    }

  override def dataType: DataType = LongType

  override def prettyName: String = "graft_dot_i8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += x.getByte(i).toLong * y.getByte(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (long) $a.getByte($i) * $b.getByte($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotI8 =
    copy(left = newLeft, right = newRight)
}

/** All sign-LSH band keys of one embedding in a single fused loop.
  *
  * The composable formulation — `bands × bitsPerBand` separate
  * `dot(cast(emb), lit(plane))` columns — evaluates the float→double cast
  * once per plane and inflates the generated code to thousands of lines
  * (Janino compile time alone dominated small inputs; at 100 TB the
  * per-row overhead would). This expression reads the embedding once and
  * runs one `bands·bitsPerBand·dim` multiply-accumulate loop over a flat
  * weight table shipped as a reference object, emitting `array<long>` of
  * band keys. Bit packing matches the per-plane composable form exactly
  * (bit r of band b set iff emb·plane(offset+b·bits+r) > 0).
  *
  * `weights` is laid out [plane][dim] flattened; plane p of band b is
  * `weights[(b·bitsPerBand+r)·dim ..+dim]`.
  */
case class LshBandKeys(child: Expression, weights: Seq[Double], dim: Int,
                       bands: Int, bitsPerBand: Int)
    extends UnaryExpression {

  require(weights.length == bands * bitsPerBand * dim,
    s"weights must be bands*bitsPerBand*dim = ${bands * bitsPerBand * dim}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double> input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "graft_lsh_band_keys"

  @transient private lazy val w: Array[Double] = weights.toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var r = 0
      while (r < bitsPerBand) {
        val base = (b * bitsPerBand + r) * dim
        var s = 0.0
        var d = 0
        while (d < n) { s += x.getDouble(d) * w(base + d); d += 1 }
        if (s > 0) key |= (1L << r)
        r += 1
      }
      keys(b) = key
      b += 1
    }
    new GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val wRef = ctx.addReferenceObj("lshWeights", w, "double[]")
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val r = ctx.freshName("r")
      val base = ctx.freshName("base")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($dim, $x.numElements());
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long ${keys}_k = 0L;
         |  for (int $r = 0; $r < $bitsPerBand; $r++) {
         |    int $base = ($b * $bitsPerBand + $r) * $dim;
         |    double $s = 0.0;
         |    for (int $d = 0; $d < $n; $d++) {
         |      $s += $x.getDouble($d) * $wRef[$base + $d];
         |    }
         |    if ($s > 0) ${keys}_k |= (1L << $r);
         |  }
         |  $keys[$b] = ${keys}_k;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): LshBandKeys = copy(child = newChild)
}
