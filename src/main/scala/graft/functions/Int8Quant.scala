package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Int8 scalar quantization of embeddings — the 4× memory-compression
  * scale path for similarity search (the reference keeps full float32
  * in FAISS, app.py:48-55; at 100 TB the quantized postings are what
  * keep an index resident). Symmetric per-vector quantization:
  * scale = max|x| / 127, q_i = round_half_away(x_i / scale) ∈ [-127, 127].
  *
  * All three kernels are native codegen'd expressions (the engine's
  * no-UDF rule): quantization is a narrow map over the embedding scan,
  * and the int8 dot product is the hot inner loop of quantized kNN —
  * a long-accumulating integer loop, branch-free, exactly what
  * whole-stage codegen compiles well.
  *
  * Rounding is HALF AWAY FROM ZERO in both the interpreted and
  * generated paths (not Java's Math.round, which rounds half toward
  * +∞ and would disagree with SQL engines on negative half-steps
  * like −63.5).
  */
private[functions] trait QuantInput { self: Expression =>
  protected def input: Expression

  protected def inputIsFloat: Boolean = input.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  protected def getter: String = if (inputIsFloat) "getFloat" else "getDouble"

  protected def checkQuantInput(): TypeCheckResult = input.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"${getClass.getSimpleName} requires array<float> or array<double>, " +
          s"got ${t.catalogString}")
  }

  @inline protected final def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** Per-vector quantization scale: max|x| / 127 (0.0 for the all-zero
  * vector). Persist alongside the quantized vector to rescale dots. */
case class QuantScale(input: Expression) extends UnaryExpression with QuantInput {
  override def child: Expression = input
  override def prettyName: String = "quant_scale"
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult = checkQuantInput()

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = inputIsFloat
    var m = 0.0; var i = 0; val n = a.numElements()
    while (i < n) { val x = math.abs(elem(a, i, isF)); if (x > m) m = x; i += 1 }
    m / 127.0
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val m = ctx.freshName("m"); val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs((double)$a.$getter($i));
         |  if ($x > $m) $m = $x;
         |}
         |${ev.value} = $m / 127.0;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(input = newChild)
}

/** Quantized vector: array<tinyint> with q_i = round_half_away(x_i /
  * scale); the all-zero vector quantizes to all zeros. */
case class QuantizeI8(input: Expression) extends UnaryExpression with QuantInput {
  override def child: Expression = input
  override def prettyName: String = "quantize_i8"
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = checkQuantInput()

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val isF = inputIsFloat
    val n = a.numElements()
    var m = 0.0; var i = 0
    while (i < n) { val x = math.abs(elem(a, i, isF)); if (x > m) m = x; i += 1 }
    val scale = m / 127.0
    val out = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val r = elem(a, i, isF) / scale
        out(i) = (if (r >= 0) math.floor(r + 0.5) else math.ceil(r - 0.5)).toByte
        i += 1
      }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val m = ctx.freshName("m"); val x = ctx.freshName("x")
      val scale = ctx.freshName("scale"); val out = ctx.freshName("out")
      val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = java.lang.Math.abs((double)$a.$getter($i));
         |  if ($x > $m) $m = $x;
         |}
         |double $scale = $m / 127.0;
         |byte[] $out = new byte[$n];
         |if ($scale != 0.0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $r = (double)$a.$getter($i) / $scale;
         |    $out[$i] = (byte)($r >= 0 ? java.lang.Math.floor($r + 0.5)
         |                              : java.lang.Math.ceil($r - 0.5));
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(input = newChild)
}

/** Integer dot product of two int8 vectors — exact long arithmetic,
  * so quantized rankings are bit-reproducible on any engine. Each side
  * may be `array<tinyint>` (QuantizeI8's output) or `binary` (the
  * compact form quantized postings persist as in parquet); the two may
  * be mixed, so an on-the-wire binary query probes array-typed
  * postings without a conversion pass. */
case class DotI8(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "dot_i8"
  override def dataType: DataType = LongType

  private def i8Type(t: DataType): Boolean = t match {
    case ArrayType(ByteType, _) | BinaryType => true
    case _                                   => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (i8Type(left.dataType) && i8Type(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"dot_i8 requires array<tinyint> or binary arguments, got " +
          s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  @inline private def lenOf(v: Any): Int = v match {
    case b: Array[Byte] => b.length
    case a: ArrayData   => a.numElements()
  }

  @inline private def at(v: Any, i: Int): Byte = v match {
    case b: Array[Byte] => b(i)
    case a: ArrayData   => a.getByte(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val n = lenOf(l)
    if (n != lenOf(r)) {
      throw new IllegalArgumentException(
        s"dot_i8: vector dimension mismatch ($n vs ${lenOf(r)})")
    }
    var acc = 0L; var i = 0
    while (i < n) { acc += at(l, i).toLong * at(r, i).toLong; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    def genLen(v: String, t: DataType): String =
      if (t == BinaryType) s"$v.length" else s"$v.numElements()"
    def genAt(v: String, t: DataType, i: String): String =
      if (t == BinaryType) s"$v[$i]" else s"$v.getByte($i)"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = ${genLen(a, left.dataType)};
         |if ($n != ${genLen(b, right.dataType)}) {
         |  throw new IllegalArgumentException(
         |    "dot_i8: vector dimension mismatch (" + $n + " vs " + ${genLen(b, right.dataType)} + ")");
         |}
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long)${genAt(a, left.dataType, i)} * (long)${genAt(b, right.dataType, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
