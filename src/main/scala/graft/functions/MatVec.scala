package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Dense matrix × float-vector as a codegen'd scalar: `mat · x` where
  * `mat` is a driver-tiny reference object (rows × dim floats — for
  * the OPQ-lite rotation, dim × dim ≤ 64×64 = 16 KiB). The engine use
  * is the seeded ORTHOGONAL rotation applied before PQ's subspace
  * split (OPQ's cheap cousin — Ge et al., "Optimized Product
  * Quantization", CVPR 2013 motivate the learned version; a random
  * rotation already balances per-dimension variance across subspaces,
  * which is most of the win when variance is concentrated):
  * orthogonality preserves L2 distances, so search in rotated space
  * ranks identically for EXACT scoring while the PQ cells align far
  * better with the data. Same [[NearestList]] pattern: NARROW map, no
  * join, no shuffle, no UDF boundary.
  */
case class MatVec(child: Expression, mat: Array[Array[Float]])
    extends UnaryExpression {

  override def prettyName: String = "mat_vec"
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _)
        if mat.nonEmpty && mat(0).nonEmpty &&
          mat.forall(_.length == mat(0).length) =>
      TypeCheckResult.TypeCheckSuccess
    case ArrayType(FloatType, _) =>
      TypeCheckResult.TypeCheckFailure(
        "mat_vec: matrix must be non-empty and rectangular")
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"mat_vec requires array<float>, got ${t.catalogString}")
  }

  private def rows: Int = mat.length
  private def dim: Int = mat(0).length

  /** Kernel shared by interpreted eval and generated code: double
    * accumulation, float result — fixed summation order so outputs are
    * bit-reproducible across both paths. */
  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    if (a.numElements() != dim) {
      throw new IllegalArgumentException(
        s"mat_vec: vector dimension mismatch (${a.numElements()} vs $dim)")
    }
    val out = new Array[Float](rows)
    var r = 0
    while (r < rows) {
      val row = mat(r)
      var acc = 0.0; var i = 0
      while (i < dim) { acc += row(i).toDouble * a.getFloat(i); i += 1 }
      out(r) = acc.toFloat
      r += 1
    }
    new GenericArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.addReferenceObj("mat", mat, "float[][]")
      val out = ctx.freshName("out")
      val r = ctx.freshName("r"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val row = ctx.freshName("row")
      s"""
         |if ($a.numElements() != $dim) {
         |  throw new IllegalArgumentException(
         |    "mat_vec: vector dimension mismatch (" + $a.numElements() + " vs $dim)");
         |}
         |float[] $out = new float[$rows];
         |for (int $r = 0; $r < $rows; $r++) {
         |  float[] $row = $m[$r];
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $dim; $i++) {
         |    $acc += (double)$row[$i] * (double)$a.getFloat($i);
         |  }
         |  $out[$r] = (float)$acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
