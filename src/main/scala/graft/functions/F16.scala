package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** IEEE 754 binary16 (half-float) conversion kernels — the FAISS
  * `ScalarQuantizer(QT_fp16)` storage type, the most-used SQ variant
  * (2× compression with ~2^-11 relative error, no training pass, no
  * codebook). Java 17 has no `Float.floatToFloat16` (added in 20), so
  * the conversion is implemented here bit-exactly: round-to-nearest-
  * even on the 13 dropped mantissa bits, gradual underflow to
  * subnormals, overflow to ±Inf, NaN preserved. The Scala object
  * compiles with static forwarders, so generated Java calls
  * `graft.functions.F16.toHalf/fromHalf` directly — the expressions
  * below stay inside whole-stage codegen.
  */
object F16 {

  /** float32 → binary16 bits (round to nearest even). */
  def toHalf(f: Float): Short = {
    val bits = java.lang.Float.floatToRawIntBits(f)
    val sign = (bits >>> 16) & 0x8000
    val e = (bits >>> 23) & 0xff
    val m = bits & 0x7fffff
    if (e == 0xff) {
      // Inf / NaN: keep NaN-ness with a quiet-bit mantissa
      (sign | 0x7c00 | (if (m != 0) 0x200 else 0)).toShort
    } else {
      // re-bias 127 -> 15
      val he = e - 127 + 15
      if (he >= 0x1f) (sign | 0x7c00).toShort // overflow -> Inf
      else if (he <= 0) {
        if (he < -10) sign.toShort // underflow -> signed zero
        else {
          // subnormal half: implicit leading 1 materializes
          val full = m | 0x800000
          val shift = 14 - he // 14..24
          val half = full >>> shift
          val rem = full & ((1 << shift) - 1)
          val halfway = 1 << (shift - 1)
          val rounded =
            if (rem > halfway || (rem == halfway && (half & 1) == 1)) half + 1
            else half
          (sign | rounded).toShort // carry into exponent is correct by layout
        }
      } else {
        val half = m >>> 13
        val rem = m & 0x1fff
        val rounded =
          if (rem > 0x1000 || (rem == 0x1000 && (half & 1) == 1)) half + 1
          else half
        // mantissa carry overflows into the exponent correctly by layout
        (sign | ((he << 10) + rounded)).toShort
      }
    }
  }

  /** binary16 bits → float32 (exact). */
  def fromHalf(h: Short): Float = {
    val bits = h & 0xffff
    val sign = (bits & 0x8000) << 16
    val e = (bits >>> 10) & 0x1f
    val m = bits & 0x3ff
    val f =
      if (e == 0x1f) sign | 0x7f800000 | (m << 13) // Inf/NaN
      else if (e == 0) {
        if (m == 0) sign
        else {
          // subnormal: normalize
          var mm = m; var ee = -1
          while ((mm & 0x400) == 0) { mm <<= 1; ee += 1 }
          sign | ((127 - 15 - ee) << 23) | ((mm & 0x3ff) << 13)
        }
      } else sign | ((e - 15 + 127) << 23) | (m << 13)
    java.lang.Float.intBitsToFloat(f)
  }
}

/** Encode: array<float> → array<short> of binary16 bits (a narrow
  * map over the embedding scan — the SQfp16 `add` path). */
case class QuantizeF16(child: Expression) extends UnaryExpression {
  override def prettyName: String = "quantize_f16"
  override def dataType: DataType = ArrayType(ShortType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"quantize_f16 requires array<float>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Short](n)
    var i = 0
    while (i < n) { out(i) = F16.toHalf(a.getFloat(i)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |short[] $out = new short[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.F16.toHalf($a.getFloat($i));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Decode: array<short> (binary16 bits) → array<float>, exact — the
  * SQfp16 search path dequantizes codes and runs the standard float
  * kernels, so this composes with `l2sq`/`vec_dot` inside one
  * codegen stage. */
case class DequantizeF16(child: Expression) extends UnaryExpression {
  override def prettyName: String = "dequantize_f16"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(ShortType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dequantize_f16 requires array<smallint>, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Float](n)
    var i = 0
    while (i < n) { out(i) = F16.fromHalf(a.getShort(i)); i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |float[] $out = new float[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $out[$i] = graft.functions.F16.fromHalf($a.getShort($i));
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
