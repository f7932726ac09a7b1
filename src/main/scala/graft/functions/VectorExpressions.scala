package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Core vector scalar functions as native Catalyst expressions with
  * whole-stage-codegen support.
  *
  * These re-express the reference's distance kernel (FAISS `METRIC_L2`
  * is *squared* Euclidean — /root/reference/app.py:48, distances
  * surfaced at app.py:70-75) as a tight primitive loop that stays
  * inside Tungsten codegen instead of a `aggregate(zip_with(...))`
  * higher-order-function tree (HOFs are CodegenFallback and allocate
  * per-element) or a Scala UDF (serialization boundary). This is the
  * hot inner loop of every kNN / similarity-join / dedup operator, so
  * it is the one place custom codegen is clearly warranted
  * (SURVEY.md §4.3).
  *
  * Element types supported: `array<float>` and `array<double>`
  * (mixed operands are rejected at analysis time). Accumulation is
  * always double. Null arrays propagate null; vectors are assumed
  * dense and non-null-elemented (the engine's embedding columns are
  * `containsNull=false` by construction).
  */
abstract class VectorBinaryExpression extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _                       => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(lt, _), ArrayType(rt, _))
          if (lt == FloatType || lt == DoubleType) && lt == rt =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        TypeCheckResult.TypeCheckFailure(
          s"${getClass.getSimpleName} requires two array<float> or two " +
            s"array<double> arguments, got ${l.catalogString} and ${r.catalogString}")
    }
  }

  @inline protected final def get(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)

  protected def getter: String = if (elemIsFloat) "getFloat" else "getDouble"

  /** Dimension check: FAISS errors on mismatched dims (its `d` is fixed
    * at index construction); silently truncating would return a
    * plausible-but-wrong distance on bad data, so we fail loudly. */
  @inline protected final def checkedLen(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements()
    if (n != b.numElements()) {
      throw new IllegalArgumentException(
        s"$prettyName: vector dimension mismatch ($n vs ${b.numElements()})")
    }
    n
  }

  /** Codegen form of [[checkedLen]]; emits `int <n> = ...;` with the check. */
  protected final def genCheckedLen(n: String, a: String, b: String): String =
    s"""int $n = $a.numElements();
       |if ($n != $b.numElements()) {
       |  throw new IllegalArgumentException(
       |    "$prettyName: vector dimension mismatch (" + $n + " vs " + $b.numElements() + ")");
       |}""".stripMargin
}

/** Squared Euclidean distance: sum_i (a_i - b_i)^2. FAISS METRIC_L2
  * semantics (reference app.py:48). */
case class L2Sq(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "l2sq"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = checkedLen(a, b)
    var acc = 0.0; var i = 0
    while (i < n) { val d = get(a, i, isF) - get(b, i, isF); acc += d * d; i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      s"""
         |${genCheckedLen(n, a, b)}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double)$a.$getter($i) - (double)$b.$getter($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product: sum_i a_i * b_i. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = checkedLen(a, b)
    var acc = 0.0; var i = 0
    while (i < n) { acc += get(a, i, isF) * get(b, i, isF); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val acc = ctx.freshName("acc")
      s"""
         |${genCheckedLen(n, a, b)}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double)$a.$getter($i) * (double)$b.$getter($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity: dot(a,b) / (||a|| * ||b||); 0.0 when either norm
  * is zero (so all-zero vectors are "dissimilar to everything" rather
  * than NaN-poisoning downstream top-k sorts). */
case class CosineSim(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val n = checkedLen(a, b)
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = get(a, i, isF); val y = get(b, i, isF)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |${genCheckedLen(n, a, b)}
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double)$a.$getter($i);
         |  double $y = (double)$b.$getter($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0
         |  : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
