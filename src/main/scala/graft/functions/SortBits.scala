package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Total-order-preserving integer key of a double: the IEEE-754 bit
  * pattern with the signed-comparison sign fix-up
  * (`b ^ ((b >> 63) & MAX_VALUE)` — negatives get their magnitude bits
  * flipped, positives pass through) so that
  * `x < y  ⇔  sortBits(x) < sortBits(y)` as SIGNED longs over ALL
  * doubles, -0.0 < +0.0, and NaN sorts last (canonical-NaN bits).
  *
  * Why it exists: a deterministic argmin with a (dist, id) tie-break
  * wants `min(struct(dist, id))`, but a struct-typed aggregation
  * buffer is not HashAggregate-mutable, so Spark silently degrades the
  * whole aggregation to SortAggregate — a full sort of the PRE-
  * aggregation rows. The round-14 scale decade measured exactly that:
  * the distributed coarse assignment's 500k×707 candidate expansion
  * hit a spill-to-disk-full sort. Packing `(sortBits(dist), id)` into
  * one DECIMAL(38,0) (`bits · 2³² + id`) keeps the identical
  * lexicographic order in a single fixed-width mutable value, so the
  * argmin stays a partial-aggregable HashAggregate at any scale.
  */
case class DoubleSortBits(child: Expression) extends UnaryExpression {
  override def prettyName: String = "double_sort_bits"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"double_sort_bits requires a double argument, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val b = java.lang.Double.doubleToLongBits(input.asInstanceOf[Double])
    b ^ ((b >> 63) & java.lang.Long.MAX_VALUE)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val b = ctx.freshName("bits")
      s"""long $b = Double.doubleToLongBits($c);
         |${ev.value} = $b ^ (($b >> 63) & Long.MAX_VALUE);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
