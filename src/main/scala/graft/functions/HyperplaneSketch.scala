package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane (sign-random-projection) sketch of a float-array
  * embedding: bit j is set iff `dot(emb, planes(j)) > 0`. For unit
  * vectors, `P[bit differs] = angle(a,b) / π` — the classic
  * cosine-LSH family (Charikar, STOC'02; the SimHash construction
  * applied to dense vectors instead of token multisets) — which makes
  * banded equality joins over the sketch a candidate generator for
  * high-cosine pairs.
  *
  * The plane matrix (≤64 × dim, driver-generated from a fixed seed)
  * rides into codegen as a reference object exactly like
  * [[NearestList]]'s centroids: the sketch is a NARROW map, no join or
  * shuffle anywhere on the sketching path.
  */
case class HyperplaneSketch(child: Expression, planes: Array[Array[Float]])
    extends UnaryExpression {

  override def prettyName: String = "hyperplane_sketch"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if planes.nonEmpty && planes.length <= 64 =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sketch: need 1..64 planes, got ${planes.length}")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"hyperplane_sketch requires array<float>, got ${t.catalogString}")
  }

  private def dim: Int = planes(0).length

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) {
      throw new IllegalArgumentException(
        s"hyperplane_sketch: vector dimension mismatch (${a.numElements()} vs $dim)")
    }
    var bits = 0L
    var j = 0
    while (j < planes.length) {
      val p = planes(j)
      var acc = 0.0; var i = 0
      while (i < p.length) { acc += a.getFloat(i).toDouble * p(i); i += 1 }
      if (acc > 0.0) bits |= (1L << j)
      j += 1
    }
    bits
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val mat = ctx.addReferenceObj("planes", planes, "float[][]")
      val j = ctx.freshName("j"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val bits = ctx.freshName("bits")
      val p = ctx.freshName("p")
      s"""
         |if ($a.numElements() != ${dim}) {
         |  throw new IllegalArgumentException(
         |    "hyperplane_sketch: vector dimension mismatch (" + $a.numElements() + " vs ${dim})");
         |}
         |long $bits = 0L;
         |for (int $j = 0; $j < $mat.length; $j++) {
         |  float[] $p = $mat[$j];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $p.length; $i++) {
         |    $acc += (double)$a.getFloat($i) * (double)$p[$i];
         |  }
         |  if ($acc > 0.0) $bits |= (1L << $j);
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
