package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor for Spark internals that are `private[sql]` in the
  * shipped 4.1.2 jars. Living inside `package org.apache.spark.sql`
  * grants access; everything the engine needs funnels through these
  * three calls so the internal surface we touch stays tiny and
  * auditable.
  *
  * Needed because the public `Column` API in Spark 4.x is backed by
  * `ColumnNode`s, and the Expression<->Column converters
  * (`classic.ExpressionUtils`) are package-private.
  */
object GraftSqlBridge {

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** Unwrap a Column back to its Catalyst expression. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Register a builtin-grade (codegen-capable) function builder in the
    * session's function registry — unlike `spark.udf.register`, the
    * planner sees the native expression and keeps it inside
    * whole-stage codegen. */
  def registerFunction(
      spark: SparkSession,
      name: String,
      builder: Seq[Expression] => Expression): Unit = {
    spark.asInstanceOf[classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
  }
}
