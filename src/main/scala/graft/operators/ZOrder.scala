package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaving — the multi-dimensional data-layout
  * key lakehouse tables sort/cluster files by, so range predicates on
  * EITHER dimension prune most files (min/max footer stats become
  * tight when neighbors in z are neighbors in both dimensions). Built
  * from 16 shift/and/or terms per dimension — all codegen'd built-ins
  * folded into one constant-depth expression, no UDF — and mirrored
  * term-for-term by the DuckDB oracle (pure integer ops, hash-exact).
  */
object ZOrder {

  val Bits = 16

  /** Interleave the low 16 bits of x (even positions) and y (odd
    * positions) into a 32-bit Morton code. */
  def zValue(x: Column, y: Column): Column =
    (0 until Bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(x.bitwiseAND(lit(1L << i)), i))
        .bitwiseOR(shiftleft(y.bitwiseAND(lit(1L << i)), i + 1))
    }

  /** The identical expression as DuckDB SQL over columns x, y. */
  def zValueSql(x: String, y: String): String =
    (0 until Bits).map { i =>
      s"(($x & ${1L << i}) << $i) | (($y & ${1L << i}) << ${i + 1})"
    }.mkString("(", " | ", ")")

  /** Layout demo over lineitem: Morton code of (orderkey, partkey)
    * low bits, first `k` rows in z order — the ordering a writer
    * `sortWithinPartitions`s by before emitting clustered files. */
  def zorderLayout(spark: SparkSession, sfDir: String, k: Int = 100): DataFrame =
    graft.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_linenumber"),
        zValue(pmod(col("l_orderkey"), lit(65536L)),
          pmod(col("l_partkey"), lit(65536L))).as("z"))
      .orderBy(col("z").asc, col("l_orderkey").asc, col("l_linenumber").asc)
      .limit(k)
}
